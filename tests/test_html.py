"""HTML → text extraction (functions/html.py): unit semantics, the
north-star byte-identity invariant on the rich-HTML fixture, fixture ↔
generator pinning, and the zero-Python plan shape."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row, functions as F

from dedupe_algo_spark.functions.html import (
    encode_html_text,
    ensure_text,
    extract_html_text,
)
from dedupe_algo_spark.synth import synth_rich_pages, synth_rich_pages_pdf

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "pages_html_300.parquet",
)


def _extract(spark, html: bytes) -> str:
    df = spark.createDataFrame([Row(html=html)])
    return df.select(extract_html_text(F.col("html")).alias("t")).first()["t"]


def test_strips_head_script_style_comments(spark):
    html = (
        b'<!DOCTYPE html><html><head><title>never</title><style>b{x:1}</style>'
        b'</head><body><script>if(1<2&&"</b>"){var q="<p>";}</script>'
        b"<!-- <article>no</article> --><p>hello world</p></body></html>"
    )
    assert _extract(spark, html) == "hello world"


def test_case_insensitive_blocks(spark):
    html = (
        b"<HTML><HEAD><TITLE>x</TITLE></HEAD><BODY>"
        b'<SCRIPT LANGUAGE="JavaScript">var s="<div>&amp;</div>";</SCRIPT>'
        b"<BR/><ARTICLE>ok</ARTICLE></BODY></HTML>"
    )
    assert _extract(spark, html) == "ok"


def test_header_tag_is_not_head(spark):
    # <header> content is real text; the <head> block rule must not eat it
    html = b"<html><body><header>kept</header><p> also</p></body></html>"
    assert _extract(spark, html) == "kept also"


def test_entity_decode_order(spark):
    # literal "&lt;" in the original text encodes to "&amp;lt;" and must
    # round-trip to "&lt;", never to "<"
    original = 'a < b & "c" \'d\' and the literal string &lt;'
    enc = encode_html_text(original)
    html = f"<html><body><p>{enc}</p></body></html>".encode()
    assert _extract(spark, html) == original


def test_nbsp_decodes_to_space(spark):
    assert _extract(spark, b"<p>a&nbsp;b</p>") == "a b"


def test_fixture_invariant_all_identical(spark):
    """The committed rich-HTML snapshot: extraction recovers `text`
    byte-identically for every row (north-star invariant)."""
    df = spark.read.parquet(FIXTURE)
    ext = extract_html_text(F.col("html"))
    n_bad = df.where(ext != F.col("text")).count()
    assert n_bad == 0
    assert df.count() == 300


def test_committed_fixture_matches_generator():
    """fixtures/pages_html_300.parquet must stay byte-identical to the
    live generator or the DuckDB html_extract oracle silently drifts."""
    snap = pq.read_table(FIXTURE).to_pandas()
    live = synth_rich_pages_pdf(300)
    assert len(snap) == 300
    assert (snap["url"].values == live["url"].values).all()
    assert (snap["text"].values == live["text"].values).all()
    assert all(a == b for a, b in zip(snap["html"], live["html"]))


def test_distributed_rich_pages_match_driver_side(spark):
    dist = synth_rich_pages(spark, 120).orderBy("url").toPandas()
    local = synth_rich_pages_pdf(120).sort_values("url").reset_index(drop=True)
    assert all(a == b for a, b in zip(dist["html"], local["html"]))
    assert (dist["text"].values == local["text"].values).all()


def test_extraction_plan_is_pure_codegen(spark):
    """No Python evaluation node anywhere: the extractor must stay
    JVM-side (the 100 TB hot path is one narrow map over the scan)."""
    from dedupe_algo_spark.plans import formatted_plan, has_whole_stage_codegen

    df = spark.read.parquet(FIXTURE).select(
        extract_html_text(F.col("html")).alias("t")
    )
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert has_whole_stage_codegen(df)


def test_ensure_text_fills_only_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(url="u1", html=b"<p>derived</p>", text=None),
            Row(url="u2", html=b"<p>ignored</p>", text="explicit"),
        ]
    )
    out = {r["url"]: r["text"] for r in ensure_text(df).collect()}
    assert out == {"u1": "derived", "u2": "explicit"}


def test_pipeline_from_html_matches_given_text(spark):
    """jobs/dedup_job.py --from-html contract: deduping pages whose
    text was derived from raw rich HTML produces the exact cluster
    assignment that deduping the ground-truth text column does."""
    from dedupe_algo_spark.pipeline import dedup_pipeline

    pages = synth_rich_pages(spark, 400).cache()
    stripped = pages.withColumn("text", F.lit(None).cast("string"))

    res_a = dedup_pipeline(ensure_text(stripped))
    a = {(r["url"], r["cluster_id"]) for r in res_a.clusters.collect()}
    res_a.unpersist()
    res_b = dedup_pipeline(pages)
    b = {(r["url"], r["cluster_id"]) for r in res_b.clusters.collect()}
    res_b.unpersist()
    pages.unpersist()
    assert a == b and len(a) > 0


@pytest.mark.parametrize("name", ["html_extract"])
def test_oracle_parity_local(spark, name):
    """Bit-for-bit Spark ↔ DuckDB parity of the registered oracle twin
    (the driver's hash compare, replicated locally)."""
    import duckdb

    from dedupe_algo_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, "/root/testdata/sf0.001").toPandas()
    odf = duckdb.connect().execute(ORACLES[name]).df()
    cols = sorted(sdf.columns)
    assert sorted(odf.columns) == cols
    a = sorted(sdf[cols].astype(str).apply("|".join, axis=1))
    b = sorted(odf[cols].astype(str).apply("|".join, axis=1))
    assert a == b
