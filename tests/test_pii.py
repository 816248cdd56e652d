"""PII detection / redaction."""

from __future__ import annotations

from dedupe_algo_spark.operators.pii import pii_counts, redact_pii


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_counts_per_class(spark):
    docs = _df(
        spark,
        [
            (1, "mail me at jo.doe+spam@sub.example.co.uk or call +44-2079-460-958"),
            (2, "server at 10.0.255.7 and 192.168.1.1, no phone"),
            (3, "clean text with nothing to hide"),
        ],
    )
    out = pii_counts(docs).toPandas().set_index("doc_id").sort_index()
    assert tuple(out.loc[1, ["n_email", "n_ipv4", "n_phone", "n_pii"]]) == (1, 0, 1, 2)
    assert tuple(out.loc[2, ["n_email", "n_ipv4", "n_phone", "n_pii"]]) == (0, 2, 0, 2)
    assert tuple(out.loc[3, ["n_email", "n_ipv4", "n_phone", "n_pii"]]) == (0, 0, 0, 0)


def test_redaction_bytes_and_idempotence(spark):
    docs = _df(spark, [(1, "write a@b.io from 1.2.3.4 now")])
    out = redact_pii(docs).toPandas()
    assert out.iloc[0]["redacted_text"] == "write |||EMAIL||| from |||IPV4||| now"
    assert out.iloc[0]["n_pii"] == 2
    # a second pass over already-redacted text changes nothing
    again = redact_pii(
        redact_pii(docs).withColumnRenamed("redacted_text", "text")
    ).toPandas()
    assert again.iloc[0]["redacted_text"] == out.iloc[0]["redacted_text"]
    assert again.iloc[0]["n_pii"] == 0


def test_phone_strictness(spark):
    """Prices, years, and bare digit runs must NOT match the phone
    pattern (the documented false-positive guard)."""
    docs = _df(
        spark,
        [
            (1, "costs 1.299 dollars in 2024, id 123456789"),
            (2, "call +1-555-0142-993 today"),
        ],
    )
    out = pii_counts(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "n_pii"] == 0
    assert out.loc[2, "n_phone"] == 1


def test_email_inside_text_not_double_counted_as_ip(spark):
    """Progressive counting: 'v1.2.3.4@host.com' is one email; the
    dotted quad inside it must not ALSO count as an IP because the
    email was redacted before the IP scan."""
    docs = _df(spark, [(1, "ping v1.2.3.4@host.com please")])
    out = pii_counts(docs).toPandas().iloc[0]
    assert (out["n_email"], out["n_ipv4"], out["n_pii"]) == (1, 0, 1)
