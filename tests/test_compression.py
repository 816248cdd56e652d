"""Compression-ratio quality signal (functions/text.py): byte-exact
against plain-Python zlib, integer ppm math, flag band, None
pass-through, and the Arrow (not per-row Python) plan property."""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from dedupe_algo_spark.functions.text import (
    RATIO_HIGH_PPM,
    RATIO_LOW_PPM,
    ZLIB_LEVEL,
    compression_signals,
)

TEXTS = [
    "spam " * 200,  # highly templated -> too_compressible
    # genuinely mixed prose (no verbatim repetition) -> neither flag
    "The quick brown fox jumps over the lazy dog while seventeen "
    "astonished zebras quietly debated cartography near an abandoned "
    "viaduct, and nobody photographed the juxtaposition.",
    # high-entropy, ≥ MIN_INCOMPRESSIBLE_BYTES -> incompressible
    "k9!x#Qz@7vR$mN2&pL5^wT8*bH4(jF6)sD1%u0~yG3`eK7|cV9armW6?nJ2+qB8=zS4fT1}dX5",
    "héllo wörld ünïcode — multibyte utf-8 accounting",
    "",
    None,
]


def _df(spark):
    schema = StructType([StructField("text", StringType())])
    return spark.createDataFrame([(t,) for t in TEXTS], schema)


def test_matches_python_zlib(spark):
    rows = _df(spark).select("text", *compression_signals(F.col("text"))).collect()
    for r in rows:
        if r.text is None:
            assert r.zlib_len is None and r.ratio_ppm is None
            continue
        raw = r.text.encode("utf-8")
        z = len(zlib.compress(raw, ZLIB_LEVEL))
        assert r.utf8_len == len(raw)
        assert r.zlib_len == z
        # payload ratio: the fixed stream envelope is subtracted so
        # short documents are judged on entropy, not zlib's header
        from dedupe_algo_spark.functions.text import ZLIB_FIXED_OVERHEAD

        assert r.ratio_ppm == math.floor(
            max(z - ZLIB_FIXED_OVERHEAD, 0) * 1_000_000 / max(len(raw), 1)
        )
        from dedupe_algo_spark.functions.text import MIN_INCOMPRESSIBLE_BYTES

        assert r.too_compressible == (r.ratio_ppm < RATIO_LOW_PPM)
        assert r.incompressible == (
            r.ratio_ppm >= RATIO_HIGH_PPM
            and r.utf8_len >= MIN_INCOMPRESSIBLE_BYTES
        )


def test_flag_band_separates_the_extremes(spark):
    rows = _df(spark).select("text", *compression_signals(F.col("text"))).collect()
    by_text = {r.text: r for r in rows if r.text is not None}
    assert by_text[TEXTS[0]].too_compressible  # template spam flagged
    assert by_text[TEXTS[2]].incompressible  # entropy junk flagged
    normal = by_text[TEXTS[1]]
    assert not normal.too_compressible and not normal.incompressible


def test_arrow_plan(spark):
    plan = (
        _df(spark)
        .select(*compression_signals(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_short_legit_text_not_flagged(spark):
    """The regression the envelope subtraction fixes: a short normal
    sentence must not read as 'incompressible' just because zlib's
    fixed header dominates its compressed size."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("text", StringType())])
    df = spark.createDataFrame(
        [("A short normal sentence here.",), ("",)], schema
    )
    rows = {r.text: r for r in df.select("text", *compression_signals(F.col("text"))).collect()}
    assert not rows["A short normal sentence here."].incompressible
    # empty text: payload 0 -> ppm 0 -> too_compressible, never 8M ppm
    assert rows[""].ratio_ppm == 0 and not rows[""].incompressible
