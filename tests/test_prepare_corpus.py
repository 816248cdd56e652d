"""End-to-end corpus-preparation job (jobs/prepare_corpus_job.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs.prepare_corpus_job import prepare

from dedupe_algo_spark.operators.chunking import TOKEN_SPLIT


def test_prepare_end_to_end(spark):
    """The six-stage chain runs on 400 synthetic pages: lineage is
    monotone through the cutting stages, the output carries the mixing
    columns, the planted eval doc is decontaminated away, and the kept
    urls are unique. (Per-stage determinism is pinned by the dedicated
    operator tests; this is the composition test.)"""
    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 400).cache()
    # eval corpus: a 10-token slice of one page → that page (and its
    # exact duplicates) must be dropped by decontamination
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ev = (
        pages.orderBy("url")
        .limit(1)
        .select(F.concat_ws(" ", F.slice(toks, 5, 14)).alias("text"))
    )
    contaminated_url = pages.orderBy("url").limit(1).collect()[0]["url"]

    mixed, lineage, release = prepare(
        spark,
        pages,
        eval_docs=ev,
        contam_ngram=10,
        rates={},
        default_rate=1.0,
        fractions={"train": 0.8, "valid": 0.1, "test": 0.1},
        seed=5,
    )
    out = mixed.toPandas()
    release()
    pages.unpersist()

    assert lineage["input"] == 400
    assert lineage["url_dedup"] <= lineage["input"]
    assert lineage["quality_gate"] <= lineage["url_dedup"]
    assert lineage["content_dedup"] < lineage["quality_gate"]  # planted dups
    assert lineage["decontam"] < lineage["content_dedup"]  # planted eval hit
    assert len(out) == lineage["decontam"]  # default rate 1.0 keeps all

    assert {"url", "text", "lang", "sample_weight", "split"} <= set(out.columns)
    assert set(out["split"]) <= {"train", "valid", "test"}
    assert (out["sample_weight"] == 1.0).all()
    assert contaminated_url not in set(out["url"])
    # every surviving url is unique (dedup + keeper selection)
    assert out["url"].is_unique


def test_prepare_with_c4_stage(spark):
    """--c4 contract: the C4 hygiene stage cuts lorem-ipsum pages
    before the quality gate, rewrites text in place, and the rest of
    the chain runs unchanged on the cleaned bytes."""
    from dedupe_algo_spark.synth import synth_pages

    base = synth_pages(spark, 200)
    # give every page 3 proper sentences; plant 'lorem ipsum' on a
    # deterministic ~5% subset (C4 page-drop rule)
    pages = base.withColumn(
        "text",
        F.concat(
            F.when(
                F.abs(F.xxhash64("url")) % 20 == 0,
                F.lit("Filler lorem ipsum dolor sit amet. "),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.lit(". Another good sentence follows here. And a third one lands."),
        ),
    ).cache()
    n_lorem = pages.where(F.lower("text").contains("lorem ipsum")).count()
    assert n_lorem > 0

    mixed, lineage, release = prepare(
        spark,
        pages,
        rates={},
        default_rate=1.0,
        fractions={"train": 1.0},
        seed=7,
        c4=True,
        c4_min_sentences=3,
    )
    out = mixed.toPandas()
    release()
    pages.unpersist()

    assert lineage["c4_clean"] == lineage["url_dedup"] - n_lorem
    assert len(out) > 0
    assert not out["text"].str.lower().str.contains("lorem ipsum").any()
    # rewrite happened in place: the surviving single-line pages still
    # end with the terminal-punctuated sentence we appended
    assert out["text"].str.endswith("And a third one lands.").all()


def test_prepare_with_alpha_mixing(spark):
    """--alpha contract: rates derive from the surviving corpus's own
    per-language token shares; the lowest-resource language keeps rate
    1.0 (never downsampled) and high-resource languages sample below
    1.0, with the per-language rates reported in lineage."""
    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 400).cache()
    mixed, lineage, release = prepare(
        spark, pages, fractions={"train": 1.0}, alpha=0.3
    )
    out = mixed.toPandas()
    release()
    rates = lineage["alpha_rates"]
    assert max(rates.values()) == 1.0 and min(rates.values()) < 1.0
    # the kept fraction per language tracks its derived rate
    counts = out.groupby("lang").size()
    assert len(out) < lineage["content_dedup"]  # some downsampling happened
    assert set(counts.index) <= set(rates)  # every kept lang has a rate
    pages.unpersist()


def test_prepare_with_domain_cap_and_shuffle(spark):
    """--domain-cap bounds survivors per registered domain (lineage
    records the cut); --shuffle-shards appends a (shard, pos) training
    order that is a valid permutation: pos is 1..count within each
    shard and every output row carries one."""
    from dedupe_algo_spark.functions.urls import registered_domain
    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 400).cache()
    mixed, lineage, release = prepare(
        spark,
        pages,
        rates={},
        default_rate=1.0,
        fractions={"train": 1.0},
        seed=5,
        domain_cap_k=3,
        shuffle_shards=4,
    )
    out = mixed.toPandas()
    release()

    assert lineage["domain_cap"] <= lineage["content_dedup"]
    assert len(out) == lineage["domain_cap"]
    # cap actually binds: no registered domain keeps more than 3 pages
    doms = (
        spark.createDataFrame(out[["url"]])
        .select(registered_domain(F.col("url")).alias("d"))
        .groupBy("d")
        .count()
        .toPandas()
    )
    assert (doms["count"] <= 3).all()
    assert doms["count"].max() == 3  # synth plants >3-page domains
    # shuffle columns form a per-shard 1..n permutation
    assert {"shard", "pos"} <= set(out.columns)
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    pages.unpersist()


def test_pack_map_stage(spark):
    """--pack-seq-len contract: the packing map covers every surviving
    document's tokens exactly once, blocks never straddle a split
    boundary or exceed seq_len, and empty-after-redaction docs cost a
    separator slot without emitting segments."""
    from jobs.prepare_corpus_job import pack_map

    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 300).cache()
    mixed, lineage, release = prepare(
        spark,
        pages,
        rates={},
        default_rate=1.0,
        fractions={"train": 0.9, "valid": 0.1},
        seed=5,
        shuffle_shards=4,
    )
    mixed = mixed.persist()
    pm = pack_map(mixed, seq_len=32).toPandas()
    src = mixed.select(
        "url",
        "split",
        F.size(
            F.filter(
                F.split("text", TOKEN_SPLIT),
                lambda t: t != F.lit(""),
            )
        ).alias("n"),
    ).toPandas()
    release()
    mixed.unpersist()
    pages.unpersist()

    n_by_url = dict(zip(src["url"], src["n"]))
    split_by_url = dict(zip(src["url"], src["split"]))
    # per-document conservation: segments cover exactly the doc's tokens
    for url, grp in pm.groupby("url"):
        assert grp["n_toks"].sum() == n_by_url[url], url
        # and land in the doc's own split
        assert set(grp["split"]) == {split_by_url[url]}, url
    # every non-empty doc appears; empty docs never do
    assert set(pm["url"]) == {u for u, n in n_by_url.items() if n > 0}
    # block geometry: segments disjoint, inside [0, seq_len)
    for (_, _, _), grp in pm.groupby(["split", "shard", "block"]):
        assert (grp["block_off"] >= 0).all()
        assert ((grp["block_off"] + grp["n_toks"]) <= 32).all()
        ivs = sorted(zip(grp["block_off"], grp["block_off"] + grp["n_toks"]))
        assert all(
            a_end <= b_start for (_, a_end), (b_start, _) in zip(ivs, ivs[1:])
        )


def test_pack_map_exchange_is_slim(spark, tmp_path):
    """pack_map over the re-read committed output must cost one hash
    exchange carrying slim meta only: the token count is computed below
    the packing window's shuffle, so page text never moves."""
    from jobs.prepare_corpus_job import pack_map

    from dedupe_algo_spark.plans import exchange_columns, formatted_plan

    p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            ("u1", "train", 0, 1, "a b c d e f g h i j"),
            ("u2", "train", 0, 2, "k l m"),
            ("u3", "valid", 0, 1, "n o p q"),
        ],
        "url string, split string, shard int, pos int, text string",
    ).write.parquet(p)
    pm = pack_map(spark.read.parquet(p), seq_len=8)
    plan = formatted_plan(pm)
    n_exchanges = sum(1 for ln in plan.splitlines() if ") Exchange" in ln)
    assert n_exchanges == 1, plan
    assert "text" not in exchange_columns(pm)
    # and the map itself is correct across the split boundary
    got = pm.toPandas()
    assert got[got["url"] == "u1"]["n_toks"].sum() == 10
    assert set(got[got["split"] == "valid"]["url"]) == {"u3"}


def test_prepare_with_token_budgets(spark):
    """--token-budgets contract: the budgeted language's kept token
    mass lands at the budget (crossing doc included), other languages
    pass through the mixing stage untouched."""
    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 300).cache()
    base, _, release0 = prepare(
        spark, pages, rates={}, default_rate=1.0, fractions={"train": 1.0}, seed=5
    )
    base_pdf = base.toPandas()
    release0()
    langs = sorted(base_pdf["lang"].unique())
    tgt = langs[0]
    ntok = base_pdf["text"].str.split().str.len()
    total_tgt = int(ntok[base_pdf["lang"] == tgt].sum())
    budget = total_tgt // 2

    mixed, lineage, release = prepare(
        spark,
        pages,
        rates={},
        default_rate=1.0,
        fractions={"train": 1.0},
        seed=5,
        token_budgets={tgt: budget},
    )
    out = mixed.toPandas()
    release()
    pages.unpersist()

    kept = out[out["lang"] == tgt]["text"].str.split().str.len()
    assert kept.sum() >= budget
    assert kept.sum() - kept.max() < budget
    for lang in langs[1:]:
        assert set(out[out["lang"] == lang]["url"]) == set(
            base_pdf[base_pdf["lang"] == lang]["url"]
        )


def test_prepare_with_robots_gate(spark):
    """Stage 0 (--robots): urls a host's robots policy disallows drop
    before any other stage, and the lineage records the cut."""
    from dedupe_algo_spark.operators.robots import parse_robots
    from dedupe_algo_spark.synth import synth_pages

    pages = synth_pages(spark, 200).cache()
    hosts = (
        pages.select(
            F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host")
        )
        .distinct()
        .collect()
    )
    # forbid every /p/ path on ONE host; all other hosts unrestricted
    banned = sorted(h.host for h in hosts)[0]
    rules = parse_robots(
        spark.createDataFrame(
            [(banned, "User-agent: *\nDisallow: /p/\n")],
            "host string, body string",
        )
    )
    n_banned = pages.where(F.col("url").startswith(f"https://{banned}/p/")).count()
    assert n_banned > 0
    mixed, lineage, release = prepare(spark, pages, robots_rules=rules)
    try:
        assert lineage["robots"] == lineage["input"] - n_banned
        assert mixed.where(
            F.col("url").startswith(f"https://{banned}/")
        ).count() == 0
    finally:
        release()


def test_prepare_with_link_rank(spark):
    """6b (--link-rank): host_rank attaches from PageRank over the
    surviving pages' own link graph — constant per host, higher for the
    host every page links to, teleport floor for link-absent hosts."""
    rows = []
    for i in range(40):
        host = f"h{i % 4}.com"
        # every page links to hub.com; hub pages link to h0.com
        tgt = "h0.com" if host == "hub.com" else "hub.com"
        html = (
            f'<html><body><p>some unique page body {i} with words</p>'
            f'<a href="https://{tgt}/x">l</a></body></html>'
        ).encode()
        text = f"unique page body number {i} " + " ".join(
            f"w{i}x{j}" for j in range(30)
        )
        rows.append((f"https://{host}/p/{i}", bytearray(html), text, "en"))
    rows.append(
        (
            "https://hub.com/h",
            bytearray(b'<html><body><a href="https://h0.com/y">z</a>hub page body</body></html>'),
            "hub page body " + " ".join(f"hb{j}" for j in range(30)),
            "en",
        )
    )
    pages = spark.createDataFrame(
        [(u, h, t, l) for u, h, t, l in rows],
        "url string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    mixed, lineage, release = prepare(spark, pages, link_rank=True)
    try:
        pdf = mixed.select("url", "host_rank").toPandas()
        assert pdf["host_rank"].notna().all()
        by_host = {}
        for _, r in pdf.iterrows():
            h = r["url"].split("/")[2]
            by_host.setdefault(h, set()).add(round(r["host_rank"], 12))
        # rank is a per-host constant
        assert all(len(v) == 1 for v in by_host.values())
        # the hub every page links to outranks the leaf hosts
        hub = next(iter(by_host["hub.com"]))
        assert all(
            hub > next(iter(v))
            for h, v in by_host.items()
            if h not in ("hub.com", "h0.com")
        )
    finally:
        release()


def test_duplicate_capture_key_does_not_fan_out(spark):
    """A capture key duplicated verbatim in the raw input (merged crawl
    dumps) must not (a) double its outlinks in the link-rank graph or
    (b) fan the deduplicated corpus back out at export-time html
    reattach — one output row per kept page, exactly."""
    from dedupe_algo_spark.operators.linkgraph import host_edges

    rows = []
    for i in range(12):
        html = (
            f'<html><body><p>page {i}</p>'
            f'<a href="https://hub.com/x">l</a></body></html>'
        ).encode()
        text = f"unique page body number {i} " + " ".join(
            f"w{i}x{j}" for j in range(30)
        )
        rows.append((f"https://h{i % 3}.com/p/{i}", bytearray(html), text, "en"))
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string, lang string"
    ).withColumn("warc_ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    doubled = pages.unionByName(pages)  # every capture appears twice

    # (a) host_edges with dedup_key: counts as if each capture was seen once
    once = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_edges(pages).collect()
    }
    deduped = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_edges(doubled, dedup_key=["url", "warc_ts"]).collect()
    }
    assert deduped == once

    # (b) end-to-end with html reattach: one row per kept url
    mixed, lineage, release = prepare(spark, doubled, keep_html=True)
    try:
        out = mixed.select("url").toPandas()
        assert out["url"].is_unique
        assert "html" in mixed.columns
    finally:
        release()
