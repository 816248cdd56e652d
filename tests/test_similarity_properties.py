"""Property-based coverage of the pure-Python similarity kernels
(functions/similarity.py) that back the pair-scoring pandas UDFs.

Two layers:
- exact parity with DuckDB's builtins on ASCII inputs (DuckDB's
  levenshtein/jaro_winkler_similarity count UTF-8 BYTES, ours count
  code points — identical over ASCII, which is what the CORRECTNESS
  oracles `jaro_winkler`/`levenshtein_sim` rely on; the divergence on
  multi-byte text is DuckDB's, not ours: Spark's builtin levenshtein
  is code-point-based like ours);
- metric laws over arbitrary unicode (symmetry, bounds, identity),
  which must hold regardless of any oracle.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_algo_spark.functions.similarity import _jaro_winkler, _levenshtein

_con = duckdb.connect()

_ascii = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
_uni = st.text(
    alphabet=st.characters(exclude_categories=("Cs",)), max_size=30
)


@settings(max_examples=200, deadline=None)
@given(_ascii, _ascii)
def test_levenshtein_matches_duckdb_on_ascii(a, b):
    (ref,) = _con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()
    assert _levenshtein(a, b) == ref


@settings(max_examples=200, deadline=None)
@given(_ascii, _ascii)
def test_jaro_winkler_matches_duckdb_on_ascii(a, b):
    (ref,) = _con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()
    assert abs(_jaro_winkler(a, b) - ref) < 1e-12


@settings(max_examples=200, deadline=None)
@given(_uni, _uni)
def test_levenshtein_metric_laws(a, b):
    d = _levenshtein(a, b)
    assert d == _levenshtein(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@settings(max_examples=200, deadline=None)
@given(_uni, _uni, _uni)
def test_levenshtein_triangle_inequality(a, b, c):
    assert _levenshtein(a, c) <= _levenshtein(a, b) + _levenshtein(b, c)


@settings(max_examples=200, deadline=None)
@given(_uni, _uni)
def test_jaro_winkler_bounds_symmetry_identity(a, b):
    s = _jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    assert s == _jaro_winkler(b, a)
    assert _jaro_winkler(a, a) == (1.0 if a else _jaro_winkler("", ""))
    if s == 1.0 and a and b:
        assert a == b


def _dl(a, b):
    from dedupe_algo_spark.functions.similarity import _damerau_levenshtein

    return _damerau_levenshtein(a, b)


@settings(max_examples=200, deadline=None)
@given(_ascii, _ascii)
def test_damerau_matches_duckdb_on_ascii(a, b):
    (ref,) = _con.execute("SELECT damerau_levenshtein(?, ?)", [a, b]).fetchone()
    assert _dl(a, b) == ref


@settings(max_examples=200, deadline=None)
@given(_uni, _uni)
def test_damerau_metric_laws(a, b):
    d = _dl(a, b)
    assert d == _dl(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)
    assert d <= _levenshtein(a, b)  # a transposition can only help


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abc", max_size=8),
    st.text(alphabet="abc", max_size=8),
    st.text(alphabet="abc", max_size=8),
)
def test_damerau_triangle_inequality(a, b, c):
    # full DL (unlike restricted OSA) is a metric; small alphabet makes
    # transposition interactions dense enough to catch violations
    assert _dl(a, c) <= _dl(a, b) + _dl(b, c)


def test_damerau_is_full_variant_not_osa():
    assert _dl("ca", "abc") == 2  # OSA would say 3
    assert _dl("ab", "ba") == 1
