"""Generator invariants: determinism, planted structure, byte identity."""

from __future__ import annotations

from dedupe_algo_spark.synth import (
    block_clusters,
    synth_labels_pdf,
    synth_pages_pdf,
)


def test_pure_function_determinism():
    a = synth_pages_pdf(300, seed=42)
    b = synth_pages_pdf(300, seed=42)
    assert a.equals(b)
    c = synth_pages_pdf(300, seed=7)
    assert not a["text"].equals(c["text"])


def test_exact_clusters_byte_identical():
    pdf = synth_pages_pdf(400)
    texts = dict(zip(range(400), pdf["text"]))
    for b in range(4):
        clusters, _ = block_clusters(b, 400)
        for members, kind in clusters:
            if kind == "exact":
                assert len({texts[m] for m in members}) == 1


def test_near_clusters_high_jaccard():
    pdf = synth_pages_pdf(400)
    texts = dict(zip(range(400), pdf["text"]))

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    for b in range(4):
        clusters, _ = block_clusters(b, 400)
        for members, kind in clusters:
            if kind == "near":
                donor = members[0]
                for m in members[1:]:
                    assert jac(texts[donor], texts[m]) >= 0.85


def test_negatives_share_blocking_key_but_differ():
    pdf = synth_pages_pdf(400)
    texts = dict(zip(range(400), pdf["text"]))
    urls = dict(zip(range(400), pdf["url"]))
    for b in range(4):
        _, negatives = block_clusters(b, 400)
        for i, j in negatives:
            # same byte length (⇒ same length bucket) and same host
            assert len(texts[i]) == len(texts[j])
            assert urls[i].split("/")[2] == urls[j].split("/")[2]
            sa, sb = set(texts[i].split()), set(texts[j].split())
            assert len(sa & sb) / len(sa | sb) < 0.5


def test_labels_urls_exist_and_sorted():
    pdf = synth_pages_pdf(300)
    lab = synth_labels_pdf(300)
    urls = set(pdf["url"])
    assert set(lab["url_a"]) <= urls and set(lab["url_b"]) <= urls
    assert (lab["url_a"] < lab["url_b"]).all()


def test_distributed_matches_driver_side(spark):
    from dedupe_algo_spark.synth import synth_pages

    dist = synth_pages(spark, 300).orderBy("url").toPandas()
    local = synth_pages_pdf(300).sort_values("url").reset_index(drop=True)
    assert (dist["text"].values == local["text"].values).all()
    assert (dist["url"].values == local["url"].values).all()


def test_committed_snapshot_matches_generator():
    """fixtures/pages_2000.parquet is the DuckDB oracle's copy of the
    synthetic pages (SQL_PAGES_DEDUP_EXACT recomputes the exact tier
    from it with sha256()); it must stay byte-identical to what the
    live generator produces, or the oracle silently drifts."""
    import pyarrow.parquet as pq

    snap = pq.read_table("fixtures/pages_2000.parquet").to_pandas()
    live = synth_pages_pdf(2000)[["url", "text"]]
    assert len(snap) == 2000
    assert (snap["url"].values == live["url"].values).all()
    assert (snap["text"].values == live["text"].values).all()
