"""As-of backward join."""

from __future__ import annotations

from dedupe_algo_spark.operators.asof import asof_join


def _df(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


def test_backward_inclusive_and_outer(spark):
    left = _df(
        spark,
        "k string, ts int, ev string",
        [
            ("a", 10, "l1"),  # matches r@10 (inclusive)
            ("a", 5, "l2"),   # matches r@3
            ("a", 2, "l3"),   # no prior right → nulls
            ("b", 7, "l4"),   # key b has no right rows at all
        ],
    )
    right = _df(
        spark,
        "k string, ts int, v double",
        [("a", 3, 3.0), ("a", 10, 10.0), ("a", 11, 11.0)],
    )
    out = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        .toPandas()
        .set_index("ev")
    )
    assert out.loc["l1", "ts_asof"] == 10 and out.loc["l1", "v_asof"] == 10.0
    assert out.loc["l2", "ts_asof"] == 3 and out.loc["l2", "v_asof"] == 3.0
    assert out.loc["l3", ["ts_asof", "v_asof"]].isna().all()
    assert out.loc["l4", ["ts_asof", "v_asof"]].isna().all()
    assert len(out) == 4  # every left row survives exactly once


def test_latest_of_many_priors_and_dup_left_ts(spark):
    left = _df(
        spark, "k string, ts int, ev string",
        [("a", 100, "x"), ("a", 100, "y")],
    )
    right = _df(
        spark,
        "k string, ts int, v double",
        [("a", 1, 1.0), ("a", 50, 50.0), ("a", 99, 99.0)],
    )
    out = asof_join(left, right, on="k").toPandas()
    assert len(out) == 2
    assert set(out["v_asof"]) == {99.0}


def test_multi_key_and_right_cols_selection(spark):
    left = _df(spark, "k1 string, k2 int, ts int", [("a", 1, 9), ("a", 2, 9)])
    right = _df(
        spark,
        "k1 string, k2 int, ts int, v double, w string",
        [("a", 1, 4, 4.0, "keepme"), ("a", 2, 8, 8.0, "other")],
    )
    out = (
        asof_join(left, right, on=["k1", "k2"], right_cols=["w"], suffix="_r")
        .toPandas()
        .set_index("k2")
    )
    assert list(out.columns) == ["k1", "ts", "ts_r", "w_r"]
    assert out.loc[1, "w_r"] == "keepme"
    assert out.loc[2, "ts_r"] == 8
