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

# the scoring tier's tokenizer class (Python str.split() semantics) —
# ONE constant so chunk/pack token counts can never drift from the
# pipeline's other token math
from .scoring import TOKEN_SPLIT_RE as TOKEN_SPLIT


def _tokens(text_col: str):
    """Unicode-whitespace tokens of ``text_col`` with ``str.split()``
    semantics; NULL text tokenizes as the empty document (a NULL would
    otherwise poison size()/window arithmetic downstream)."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), TOKEN_SPLIT),
        lambda t: t != F.lit(""),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (``id_col``, chunk_idx, chunk_text, n_tokens) — one row per
    sliding window. ``overlap`` must be < ``chunk_tokens``; empty /
    whitespace-only / NULL-text documents yield one empty chunk
    (chunk_idx 0, n_tokens 0) so no document silently disappears from
    the index."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    # split + drop-empties is exactly Python str.split(): boundary
    # whitespace (incl. tabs, which F.trim does NOT strip) yields ""
    # elements; interior ones can't occur with a `+` quantifier.
    toks = _tokens(text_col)
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


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    sep_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "shard",
    pos_col: str = "pos",
    n_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the final corpus-export
    stage of a decoder-LM data pipeline (the GPT-2/3 recipe and every
    public descendant): documents are concatenated in training order
    with ``sep_tokens`` separator slots (EOS) after each one, and the
    resulting token stream is cut into fixed ``seq_len`` blocks so a
    50-token page and a 50k-token page both land in full training
    sequences with no padding waste.

    Input is the :func:`~dedupe_algo_spark.operators.sampling.corpus_shuffle`
    output — ``(shard_col, pos_col)`` is the training order — and the
    stream is per-shard: shards are the parallel unit, so the packing
    needs NO global coordination. The per-shard token offset is one
    window cumsum over a slim (shard, pos, id, n_tokens) projection —
    the distributed prefix-sum idiom; page text never enters the
    exchange. Blocks a document spans come from ``sequence`` +
    ``explode`` (narrow); every stage is whole-stage codegen, zero
    Python.

    → one row per (document, block) overlap segment:
    ``(id_col, shard, block, doc_start, block_off, n_toks)`` — block
    ``block`` of shard ``shard`` carries tokens
    ``[doc_start, doc_start + n_toks)`` of the document at offset
    ``block_off``. This is the packing MAP (what an export writer or
    attention-masking trainer consumes); the block's token ids follow
    by slicing each document once, and positions not covered by any
    segment are the separator slots. Documents with zero tokens
    consume their separator slot in the stream (offsets shift) but
    emit no segment row. The last block of a shard is short; the
    trainer pads or drops it.

    Invariants (tested): segments within a block are disjoint,
    ``0 <= block_off < block_off + n_toks <= seq_len``, each
    document's segments cover exactly its tokens in order, and total
    stream length per shard is ``sum(n_tokens + sep_tokens)``.

    ``n_col`` names a precomputed token-count column to use instead of
    tokenizing ``text_col`` here. Pass it when chaining lazily after
    ``corpus_shuffle``: the shuffle's window otherwise forces the raw
    text through its shard exchange (the count is computed above the
    window, so column pruning must keep ``text_col`` below it) —
    counting tokens BEFORE the shuffle keeps that exchange slim
    (plan-asserted in test_plans). Over a materialized input (the
    export job's re-read output) the built-in tokenize is already
    below the exchange and equally slim.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if sep_tokens < 0:
        raise ValueError(f"sep_tokens must be >= 0, got {sep_tokens}")
    from pyspark.sql import Window

    if n_col is None:
        n_expr = F.size(_tokens(text_col))
    else:
        # NULL counts (a NULL-text doc counted upstream without the
        # coalesce) must still consume their separator slot, not
        # silently drop out of the cumsum
        n_expr = F.coalesce(F.col(n_col), F.lit(0))
    slim = docs.select(
        id_col,
        shard_col,
        pos_col,
        n_expr.cast("long").alias("_n"),
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = slim.withColumn(
        "_off",
        F.coalesce(F.sum(F.col("_n") + sep_tokens).over(w), F.lit(0).cast("long")),
    ).where(F.col("_n") > 0)
    L = F.lit(seq_len).cast("long")
    first_b = F.floor(F.col("_off") / L)
    last_b = F.floor((F.col("_off") + F.col("_n") - 1) / L)
    seg = offs.select(
        id_col,
        F.col(shard_col).alias("shard"),
        "_off",
        "_n",
        F.explode(F.sequence(first_b, last_b)).alias("block"),
    )
    gstart = F.greatest(F.col("_off"), F.col("block") * L)
    gend = F.least(F.col("_off") + F.col("_n"), (F.col("block") + 1) * L)
    return seg.select(
        id_col,
        "shard",
        "block",
        (gstart - F.col("_off")).alias("doc_start"),
        (gstart - F.col("block") * L).alias("block_off"),
        (gend - gstart).alias("n_toks"),
    )
