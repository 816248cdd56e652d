"""Bit-for-bit parity harness: our Jaro-Winkler / Levenshtein-similarity
vs DuckDB's built-ins (`jaro_winkler_similarity`, `levenshtein`) on
adversarial random pairs. The CORRECTNESS oracle hashes stringified
doubles, so parity must be exact, not approximate.

Usage: python tools/jw_parity.py [n_pairs]
"""

from __future__ import annotations

import random
import string
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from dedupe_algo_spark.functions.similarity import _jaro_winkler, _levenshtein  # noqa: E402


def gen_pairs(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260818)
    pairs = [
        ("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b"),
        ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
        ("aabab", "abaab"), ("abcd", "ab" + "z" * 20),
    ]
    for _ in range(n):
        mode = rng.random()
        if mode < 0.4:  # tiny alphabet → repeats, transpositions
            alph = "abc"
            la, lb = rng.randint(0, 10), rng.randint(0, 10)
        elif mode < 0.8:  # word-like
            alph = string.ascii_lowercase
            la, lb = rng.randint(0, 24), rng.randint(0, 24)
        else:  # longer, shared prefix
            alph = "abcdef"
            la, lb = rng.randint(20, 80), rng.randint(20, 80)
        a = "".join(rng.choice(alph) for _ in range(la))
        b = "".join(rng.choice(alph) for _ in range(lb))
        if mode >= 0.8:
            b = a[: rng.randint(0, 6)] + b  # force common prefixes
        pairs.append((a, b))
    return pairs


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    pairs = gen_pairs(n)
    df = pd.DataFrame(pairs, columns=["a", "b"])
    con = duckdb.connect()
    ref = con.execute(
        "SELECT jaro_winkler_similarity(a, b) AS jw, levenshtein(a, b) AS lev FROM df"
    ).df()
    jw_bad = lev_bad = 0
    for (a, b), jw_d, lev_d in zip(pairs, ref["jw"].values, ref["lev"].values):
        jw_p = _jaro_winkler(a, b)
        if jw_p != jw_d:
            if jw_bad < 8:
                print(f"JW  {a!r} {b!r}: ours={jw_p!r} duckdb={jw_d!r}")
            jw_bad += 1
        lev_p = _levenshtein(a, b)
        if lev_p != lev_d:
            if lev_bad < 8:
                print(f"LEV {a!r} {b!r}: ours={lev_p!r} duckdb={lev_d!r}")
            lev_bad += 1
    print(f"pairs={len(pairs)} jw_mismatch={jw_bad} lev_mismatch={lev_bad}")
    sys.exit(1 if (jw_bad or lev_bad) else 0)


if __name__ == "__main__":
    main()
