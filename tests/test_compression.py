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
    "The quick brown fox jumps over the lazy dog. " * 3,
    "k9!x#Qz@7vR$mN2&pL5^wT8*bH4(jF6)sD1",  # high-entropy -> incompressible
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
        assert r.ratio_ppm == math.floor(z * 1_000_000 / max(len(raw), 1))
        assert r.too_compressible == (r.ratio_ppm < RATIO_LOW_PPM)
        assert r.incompressible == (r.ratio_ppm > RATIO_HIGH_PPM)


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
