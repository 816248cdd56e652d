"""Property-based (hypothesis) coverage of the WARC parser — pure
driver-side, no SparkSession: the writer/parser pair must round-trip
arbitrary record sets, and the parser must never raise on arbitrary
garbage or on truncation at any byte offset."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_algo_spark.sources.warc import _gunzip_members, build_warc, parse_warc

# WARC-Target-URI: any unicode without CR/LF (header-line framing) or
# leading/trailing whitespace (headers are .strip()ed on both sides).
_url = st.text(
    alphabet=st.characters(exclude_characters="\r\n", exclude_categories=("Cs",)),
    min_size=1,
    max_size=60,
).map(lambda s: "u" + s.strip() + "u")
_epoch = st.integers(min_value=0, max_value=4_102_444_800)  # 1970..2100
_html = st.binary(max_size=2048)
_records = st.lists(st.tuples(_url, _epoch, _html), min_size=0, max_size=8)


@settings(max_examples=60, deadline=None)
@given(_records, st.booleans())
def test_round_trip_any_records(recs, warcinfo):
    blob = build_warc(recs, warcinfo=warcinfo)
    out = [r for r in parse_warc(blob) if r["warc_type"] == "response"]
    assert [(r["url"], r["warc_epoch"], r["body"]) for r in out] == recs
    assert all(r["http_status"] == 200 for r in out)


@settings(max_examples=60, deadline=None)
@given(_records)
def test_round_trip_plain_stream(recs):
    plain = _gunzip_members(build_warc(recs, warcinfo=False))
    out = list(parse_warc(plain))
    assert [(r["url"], r["warc_epoch"], r["body"]) for r in out] == recs


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_garbage_never_raises(data):
    recs = list(parse_warc(data))
    assert isinstance(recs, list)


@settings(max_examples=60, deadline=None)
@given(_records, st.data())
def test_truncation_yields_prefix(recs, data):
    blob = build_warc(recs, warcinfo=False)
    full = [(r["url"], r["warc_epoch"], r["body"]) for r in parse_warc(blob)]
    cut = data.draw(st.integers(min_value=0, max_value=len(blob)))
    got = [(r["url"], r["warc_epoch"], r["body"]) for r in parse_warc(blob[:cut])]
    # every record parsed from a truncated blob is a prefix of the full parse
    assert got == full[: len(got)]


@settings(max_examples=60, deadline=None)
@given(_records, st.binary(max_size=64))
def test_trailing_garbage_keeps_prefix(recs, tail):
    # a valid gzip stream followed by junk bytes: all real records survive
    blob = build_warc(recs, warcinfo=False) + tail
    got = [(r["url"], r["warc_epoch"], r["body"]) for r in parse_warc(blob)]
    assert got[: len(recs)] == recs


@settings(max_examples=60, deadline=None)
@given(_records)
def test_cdx_members_partition_file_and_random_access(recs):
    from dedupe_algo_spark.sources.warc import (
        fetch_warc_record,
        iter_gzip_members,
        parse_warc_cdx,
    )

    blob = build_warc(recs, warcinfo=False)
    members = list(iter_gzip_members(blob))
    # members tile the compressed file exactly: contiguous, full cover
    assert members[0][0] == 0 if members else True
    for (o1, l1, _), (o2, _, _) in zip(members, members[1:]):
        assert o1 + l1 == o2
    if members:
        o, l, _ = members[-1]
        assert o + l == len(blob)
    # every cdx row random-accesses back to its exact record
    rows = list(parse_warc_cdx(blob))
    assert [(r["url"], r["warc_epoch"]) for r in rows] == [
        (u, e) for u, e, _ in recs
    ]
    for row, (u, e, h) in zip(rows, recs):
        rec = fetch_warc_record(blob, row["offset"], row["length"])
        assert (rec["url"], rec["warc_epoch"], rec["body"]) == (u, e, h)
