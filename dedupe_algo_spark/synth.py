"""Deterministic synthetic Common-Crawl-style ``pages`` + ``labels`` tables.

Every row is a *pure function of its row index and the seed*: duplicate
copies re-derive their donor's text from the donor index instead of reading
another row. That makes generation embarrassingly parallel (a
``spark.range(n).mapInPandas`` with zero shuffle) — the same design scales
to 10^12 rows on a real cluster because no generation step ever needs
cross-row communication.

Planted structure per FIXTURES.md §1, in blocks of 100 consecutive indices:

- offsets 0-4    exact-dup donors (reference pass-3 analog, lib.rs:155-160)
- offsets 5-9    near-dup donors
- offsets 10-19  distractor targets
- offset  69     edge row (cycles: min-length / unicode NFC-NFD / very long
                 / cross-language exact dup)
- offsets 70-79  distractors — same registered domain and *byte length* as
                 their target (same blocking key) but random tokens → must
                 NOT cluster
- offsets 80-89  exact copies (copy c → donor (c%5)); byte-identical text,
                 new url
- offsets 90-99  near copies (copy c → donor 5+(c%5)); 1-5 length-preserving
                 token substitutions, Jaccard ≥ ~0.95
- every 50th block is a *skew block*: whole block pinned to the #1 Zipf
  domain and offsets 30-68 are additional exact copies of donor 0
  (≈50-member cluster on a head domain — the hot-key fixture)

Domains are Zipf(a≈1.2) over a 200-domain pool with mixed public suffixes
(.com / .org / .co.uk / .net with subdomains) so registered-domain
extraction is exercised.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schemas import LABELS_SCHEMA, PAGES_SCHEMA

BLOCK = 100
N_EXACT_DONORS = 5
N_NEAR_DONORS = 5
EDGE_OFF = 69
DISTRACTOR_OFF = 70
EXACT_COPY_OFF = 80
NEAR_COPY_OFF = 90
SKEW_EVERY = 50
SKEW_COPY_RANGE = range(30, 69)

N_DOMAINS = 200
ZIPF_A = 1.2
BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z
TS_SPAN = 90 * 86400

LANGS = np.array(["en", "de", "fr", "es", "hi", "zh"])
LANG_P = np.array([0.70, 0.06, 0.06, 0.06, 0.06, 0.06])

_VOCAB_CACHE: dict[int, tuple[np.ndarray, dict[int, np.ndarray]]] = {}


def _vocab(seed: int) -> tuple[np.ndarray, dict[int, np.ndarray]]:
    """Seeded pseudo-word vocabulary, plus an index by word length
    (length-preserving substitution keeps mutated text in the same
    byte-length blocking bucket)."""
    if seed in _VOCAB_CACHE:
        return _VOCAB_CACHE[seed]
    rng = np.random.default_rng([seed, 999331])
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(6000):
        ln = int(rng.integers(3, 12))
        words.append("".join(rng.choice(letters, size=ln)))
    arr = np.array(sorted(set(words)))
    by_len: dict[int, np.ndarray] = {}
    for w in arr:
        by_len.setdefault(len(w), []).append(w)  # type: ignore[arg-type]
    by_len = {k: np.array(v) for k, v in by_len.items()}
    _VOCAB_CACHE[seed] = (arr, by_len)
    return arr, by_len


def _domain_pool() -> list[str]:
    pool = []
    for k in range(N_DOMAINS):
        base = f"site{k:03d}"
        m = k % 10
        if m < 6:
            pool.append(f"{base}.com")
        elif m < 8:
            pool.append(f"news.{base}.org")
        elif m == 8:
            pool.append(f"{base}.co.uk")
        else:
            pool.append(f"a.b.{base}.net")
    return pool


DOMAIN_POOL = _domain_pool()
_ZIPF_P = (1.0 / np.arange(1, N_DOMAINS + 1) ** ZIPF_A)
_ZIPF_P /= _ZIPF_P.sum()


def _rng(seed: int, i: int, stream: int = 0) -> np.random.Generator:
    return np.random.default_rng([seed, stream, i])


def _ntok(seed: int, j: int) -> int:
    r = _rng(seed, j, stream=1)
    return int(np.exp(r.uniform(np.log(50), np.log(2000))))


def _base_tokens(seed: int, j: int) -> np.ndarray:
    vocab, _ = _vocab(seed)
    r = _rng(seed, j, stream=2)
    return vocab[r.integers(0, len(vocab), size=_ntok(seed, j))]


def _base_domain(seed: int, j: int) -> str:
    r = _rng(seed, j, stream=3)
    return DOMAIN_POOL[int(r.choice(N_DOMAINS, p=_ZIPF_P))]


def _base_lang(seed: int, j: int) -> str:
    r = _rng(seed, j, stream=4)
    return str(r.choice(LANGS, p=LANG_P))


def _role(i: int) -> tuple[str, int]:
    """(role, donor_or_target_index). Pure function of the row index."""
    b, off = divmod(i, BLOCK)
    start = b * BLOCK
    if off >= NEAR_COPY_OFF:
        return "near_copy", start + N_EXACT_DONORS + (off - NEAR_COPY_OFF) % N_NEAR_DONORS
    if off >= EXACT_COPY_OFF:
        return "exact_copy", start + (off - EXACT_COPY_OFF) % N_EXACT_DONORS
    if off >= DISTRACTOR_OFF:
        return "distractor", start + 10 + (off - DISTRACTOR_OFF) % 10
    if off == EDGE_OFF:
        return "edge", b % 4
    if b % SKEW_EVERY == 0 and off in SKEW_COPY_RANGE:
        return "exact_copy", start
    return "base", i


def _row(seed: int, i: int) -> tuple[str, int, str, str]:
    """(domain, epoch_secs, text, lang) for row index ``i`` — pure."""
    b = i // BLOCK
    skew = b % SKEW_EVERY == 0
    role, ref = _role(i)
    r = _rng(seed, i, stream=5)
    epoch = BASE_EPOCH + int(r.integers(0, TS_SPAN))

    if role == "exact_copy":
        text = " ".join(_base_tokens(seed, ref))
        return _head_or(seed, ref, skew), epoch, text, _base_lang(seed, ref)

    if role == "near_copy":
        toks = _base_tokens(seed, ref).copy()
        _, by_len = _vocab(seed)
        k = max(1, min(5, len(toks) // 100))
        pos = r.choice(len(toks), size=min(k, len(toks)), replace=False)
        for p in pos:
            ln = len(toks[p])
            cands = by_len.get(ln)
            if cands is not None and len(cands) > 1:
                toks[p] = cands[int(r.integers(0, len(cands)))]
        return _head_or(seed, ref, skew), epoch, " ".join(toks), _base_lang(seed, ref)

    if role == "distractor":
        donor_toks = _base_tokens(seed, ref)
        _, by_len = _vocab(seed)
        out = []
        for t in donor_toks:
            cands = by_len.get(len(t))
            out.append(str(cands[int(r.integers(0, len(cands)))]) if cands is not None else str(t))
        return _head_or(seed, ref, skew), epoch, " ".join(out), _base_lang(seed, ref)

    if role == "edge":
        vocab, _ = _vocab(seed)
        kind = ref
        dom = DOMAIN_POOL[0] if skew else _base_domain(seed, i)
        if kind == 0:  # min-length text (reference F5 floor, scanner.rs:186-189)
            text = " ".join(vocab[r.integers(0, len(vocab), size=2)])
        elif kind == 1:  # unicode: NFC vs NFD forms + emoji — must NOT be normalized
            text = "café " + "café " + "\U0001f600 " + " ".join(
                vocab[r.integers(0, len(vocab), size=int(r.integers(40, 80)))]
            )
        elif kind == 2:  # very long text
            n = 110_000 if b % 1000 == 2 else 20_000
            toks = vocab[r.integers(0, len(vocab), size=n // 7)]
            text = " ".join(toks)
        else:  # kind == 3: cross-language exact dup of block donor 0
            donor = b * BLOCK
            text = " ".join(_base_tokens(seed, donor))
            lang = str(LANGS[1 + int(r.integers(0, len(LANGS) - 1))])
            return _head_or(seed, donor, skew), epoch, text, lang
        return dom, epoch, text, _base_lang(seed, i)

    # base row
    dom = DOMAIN_POOL[0] if skew else _base_domain(seed, i)
    return dom, epoch, " ".join(_base_tokens(seed, i)), _base_lang(seed, i)


def _head_or(seed: int, ref: int, skew: bool) -> str:
    return DOMAIN_POOL[0] if skew else _base_domain(seed, ref)


def _gen_batch(indices: np.ndarray, seed: int) -> pd.DataFrame:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in indices:
        i = int(i)
        dom, epoch, text, lang = _row(seed, i)
        urls.append(f"https://{dom}/p/{i:010d}")
        tss.append(epoch)
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(tss, unit="s"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def synth_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table (no shuffle, no cross-row deps)."""
    if num_partitions is None:
        num_partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].values, seed)

    return (
        spark.range(0, n_pages, numPartitions=num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def synth_pages_pdf(n_pages: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side pandas variant for small unit-test fixtures."""
    return _gen_batch(np.arange(n_pages), seed)


# ---------------------------------------------------------------------------
# Rich-HTML pages: same rows as synth_pages, but `html` carries real
# boilerplate (head/title/style/script/comments, mixed case, entity-
# encoded character data).  Invariant by construction: the codegen
# extractor (functions/html.py) recovers `text` BYTE-IDENTICALLY —
# the north-star "byte-identical extracted text per url" exercised
# end-to-end rather than assumed.  Zero whitespace between tags
# outside the content element, so extraction needs no lossy
# whitespace collapse.
# ---------------------------------------------------------------------------

def _rich_html(i: int, text: str, lang: str) -> bytes:
    from .functions.html import encode_html_text

    enc = encode_html_text(text)
    v = i % 3
    if v == 0:
        page = (
            f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8"/>'
            f"<title>doc {i} &amp; mirror</title>"
            "<style>body{margin:0;color:#fff}</style></head>"
            f'<body class="page" data-idx="{i}">'
            '<script type="text/javascript">if(1<2&&"</b>"){var q=\'x\';}</script>'
            f"<article>{enc}</article></body></html>"
        )
    elif v == 1:
        page = (
            "<!DOCTYPE HTML><!-- synth & <meta never content> -->"
            f'<HTML LANG="{lang}"><HEAD><TITLE>p{i}</TITLE></HEAD><BODY>'
            '<SCRIPT LANGUAGE="JavaScript">var s="<div>&amp;</div>";</SCRIPT>'
            f"<BR/><ARTICLE>{enc}</ARTICLE></BODY></HTML>"
        )
    else:
        # first space entity-encoded as &nbsp; — decodes back to ' '
        enc = enc.replace(" ", "&nbsp;", 1)
        page = (
            f'<!DOCTYPE html><html lang="{lang}"><head></head><body>'
            "<style scoped>p{font:12px}</style><!--\nmultiline <comment>\n& more -->"
            f'<p class="lead">{enc}</p></body></html>'
        )
    return page.encode("utf-8")


def _gen_rich_batch(indices: np.ndarray, seed: int) -> pd.DataFrame:
    pdf = _gen_batch(indices, seed)
    pdf["html"] = [
        _rich_html(int(i), t, l)
        for i, t, l in zip(indices, pdf["text"], pdf["lang"])
    ]
    return pdf


def synth_rich_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic rich-HTML pages table (no shuffle)."""
    if num_partitions is None:
        num_partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_rich_batch(pdf["id"].values, seed)

    return (
        spark.range(0, n_pages, numPartitions=num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def synth_rich_pages_pdf(n_pages: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side pandas variant (fixture builder / unit tests)."""
    return _gen_rich_batch(np.arange(n_pages), seed)


# ---------------------------------------------------------------------------
# Ground-truth labels (FIXTURES.md §2): all positive pairs from planted
# clusters + negative pairs restricted to shared-blocking-key distractors.
# ---------------------------------------------------------------------------

def _url_of(seed: int, i: int) -> str:
    dom, _, _, _ = _row_domain_only(seed, i)
    return f"https://{dom}/p/{i:010d}"


def _row_domain_only(seed: int, i: int) -> tuple[str, None, None, None]:
    b = i // BLOCK
    skew = b % SKEW_EVERY == 0
    role, ref = _role(i)
    if role in ("exact_copy", "near_copy", "distractor"):
        return _head_or(seed, ref, skew), None, None, None
    if role == "edge" and ref == 3:
        return _head_or(seed, b * BLOCK, skew), None, None, None
    return (DOMAIN_POOL[0] if skew else _base_domain(seed, i)), None, None, None


def block_clusters(b: int, n_pages: int) -> tuple[list[tuple[list[int], str]], list[tuple[int, int]]]:
    """Planted clusters (absolute indices) and negative pairs for block b."""
    start = b * BLOCK
    skew = b % SKEW_EVERY == 0
    clusters: list[tuple[list[int], str]] = []
    for d in range(N_EXACT_DONORS):
        members = [start + d] + [
            start + EXACT_COPY_OFF + c for c in range(10) if c % N_EXACT_DONORS == d
        ]
        if d == 0 and skew:
            members += [start + off for off in SKEW_COPY_RANGE]
        if d == 0 and b % 4 == 3:
            members.append(start + EDGE_OFF)
        members = sorted(m for m in members if m < n_pages)
        if len(members) >= 2:
            clusters.append((members, "exact"))
    for d in range(N_NEAR_DONORS):
        members = [start + N_EXACT_DONORS + d] + [
            start + NEAR_COPY_OFF + c for c in range(10) if c % N_NEAR_DONORS == d
        ]
        members = sorted(m for m in members if m < n_pages)
        if len(members) >= 2:
            clusters.append((members, "near"))
    negatives = [
        (start + 10 + k, start + DISTRACTOR_OFF + k)
        for k in range(10)
        if start + DISTRACTOR_OFF + k < n_pages
    ]
    return clusters, negatives


def _labels_for_blocks(blocks: np.ndarray, seed: int, n_pages: int) -> pd.DataFrame:
    rows: list[tuple[str, str, bool, str]] = []
    for b in blocks:
        clusters, negatives = block_clusters(int(b), n_pages)
        for members, kind in clusters:
            urls = [_url_of(seed, m) for m in members]
            for x in range(len(urls)):
                for y in range(x + 1, len(urls)):
                    a, c = sorted((urls[x], urls[y]))
                    rows.append((a, c, True, kind))
        for i, j in negatives:
            a, c = sorted((_url_of(seed, i), _url_of(seed, j)))
            rows.append((a, c, False, "negative"))
    return pd.DataFrame(rows, columns=["url_a", "url_b", "is_dup", "kind"])


def synth_labels(
    spark: SparkSession, n_pages: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    n_blocks = (n_pages + BLOCK - 1) // BLOCK
    if num_partitions is None:
        num_partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _labels_for_blocks(pdf["id"].values, seed, n_pages)

    return (
        spark.range(0, n_blocks, numPartitions=min(num_partitions, n_blocks))
        .mapInPandas(gen, schema=LABELS_SCHEMA)
    )


def synth_labels_pdf(n_pages: int, seed: int = 42) -> pd.DataFrame:
    n_blocks = (n_pages + BLOCK - 1) // BLOCK
    return _labels_for_blocks(np.arange(n_blocks), seed, n_pages)
