"""Document chunking — fixed token windows with overlap.

The embedding/retrieval leg of a training-data pipeline (SemDeDup-style
semantic dedup, RAG index prep, long-context eval sets) consumes fixed
token windows, not whole pages: a 50k-token page and a 50-token page
must land in the same embedding batch shape. This operator explodes
each document into overlapping windows of ``chunk_tokens`` tokens with
``overlap`` tokens shared between consecutive windows — the standard
sliding-window chunking every public RAG/embedding pipeline applies.

Chunk math (pure arithmetic, replayed bit-for-bit by the DuckDB oracle):
``step = chunk_tokens - overlap``; ``n_chunks = max(1,
ceil((n_tokens - overlap) / step))``; chunk ``i`` covers token slice
``[i*step, i*step + chunk_tokens)``. The final chunk may be shorter
(the remainder); a document shorter than one window yields exactly one
chunk. Every token index appears in at least one chunk, and consecutive
chunks share exactly ``overlap`` tokens except possibly the last.

Scale shape: tokenize → ``sequence``/``posexplode`` → ``slice`` /
``concat_ws`` — all whole-stage codegen, zero Python, zero shuffle (a
narrow map; output rows ≈ tokens/step × docs). Chunk ids are
(doc id, chunk_idx), so downstream embedding / dedup joins need no
global counter. Tokenization is Unicode-whitespace ``split`` — the
same `(?U)\\s+` class the scoring tier uses, so chunk token counts are
consistent with the pipeline's other token math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"(?U)[\s\x1c-\x1f]+"


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (``id_col``, chunk_idx, chunk_text, n_tokens) — one row per
    sliding window. ``overlap`` must be < ``chunk_tokens``; empty /
    whitespace-only documents yield one empty chunk (chunk_idx 0,
    n_tokens 0) so no document silently disappears from the index."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    # split + drop-empties is exactly Python str.split(): boundary
    # whitespace (incl. tabs, which F.trim does NOT strip) yields ""
    # elements; interior ones can't occur with a `+` quantifier.
    toks = F.filter(
        F.split(F.col(text_col), TOKEN_SPLIT), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    n_chunks = F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)))
    out = (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.sequence(F.lit(0), (n_chunks - 1).cast("int")).alias("_idxs"),
        )
        .select(
            id_col,
            "_toks",
            F.explode("_idxs").alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                F.col("_toks"), F.col("chunk_idx") * step + 1, chunk_tokens
            ).alias("_chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
        F.size("_chunk").alias("n_tokens"),
    )
