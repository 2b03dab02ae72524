"""PII detection/redaction: pattern behavior, ordering discipline, and
Spark↔DuckDB parity of the exact pattern/replacement pairs the oracle
uses (regexp semantics must agree between Java regex and RE2)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators.pii import (
    PII_PATTERNS,
    pii_signals,
    scrub_pii,
)

ROWS = [
    (1, "mail me at john.doe+spam@sub.example.co.uk or visit 192.168.1.254 now"),
    (2, "server at 10.0.0.1, backup 172.16.254.3; call +1 555-0123 ok"),
    (3, "no pii here just words and numbers 42 7 1900"),
    (4, "edge: 999.999.999.999 not an ip, 1.2.3.4 is, a@b.io too"),
    (5, "phones: +33 1 23 45 67 89 and 555-867-5309 end"),
    (6, "adjacent ips 1.2.3.4 5.6.7.8 and email@x.com1.2.3.4"),
    (7, ""),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_signals_and_scrub(corpus):
    sig = {r["doc_id"]: r for r in pii_signals(corpus, keep_scrubbed=True).collect()}
    assert (sig[1]["email_count"], sig[1]["ipv4_count"], sig[1]["phone_count"]) == (1, 1, 0)
    assert sig[1]["scrubbed"] == "mail me at <EMAIL> or visit <IP> now"
    # boundary punctuation survives (consumed context chars re-emitted)
    assert sig[2]["scrubbed"] == "server at <IP>, backup <IP>; call <PHONE> ok"
    assert sig[3]["pii_total"] == 0 and sig[3]["scrubbed"] == ROWS[2][1]
    # octets >255 rejected; dotted context around a real IP doesn't anchor
    assert "999.999.999.999" in sig[4]["scrubbed"] and "<IP>" in sig[4]["scrubbed"]
    assert sig[5]["phone_count"] == 2
    # documented recall trade: back-to-back IPs one char apart — the
    # consumed boundary leaves the second unmasked (parity'd with RE2)
    assert "5.6.7.8" in sig[6]["scrubbed"]
    assert sig[7]["pii_total"] == 0

    # scrub_pii emits the same masked text as the signals pass
    scrub = {r["doc_id"]: r["scrubbed"] for r in scrub_pii(corpus).collect()}
    assert scrub == {k: v["scrubbed"] for k, v in sig.items()}


def test_total_matches_inserted_tokens(corpus):
    """pii_total == number of <TOKEN>s in the scrubbed text: counting on
    progressively-masked text means no double counting across types."""
    out = pii_signals(corpus, keep_scrubbed=True).withColumn(
        "tokens",
        F.size(F.regexp_extract_all("scrubbed", F.lit("<(EMAIL|IP|PHONE)>"), 0)),
    )
    assert out.filter(F.col("tokens") != F.col("pii_total")).count() == 0


def test_duckdb_parity(corpus):
    """The exact (pattern, replacement) pairs produce byte-identical
    masked text and counts under DuckDB's RE2 — the property the
    contract oracle depends on."""
    sig = [
        (r["doc_id"], r["email_count"], r["ipv4_count"], r["phone_count"], r["scrubbed"])
        for r in pii_signals(corpus, keep_scrubbed=True).orderBy("doc_id").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", ROWS)
    cur, prev, parts, names = "text", "t", [], []
    for i, (n, p, r) in enumerate(PII_PATTERNS):
        repl = r.replace("$", "\\")
        parts.append(
            f"m{i} AS (SELECT *, len(regexp_extract_all({cur}, '{p}')) AS {n}_count,"
            f" regexp_replace({cur}, '{p}', '{repl}', 'g') AS t{i} FROM {prev})"
        )
        cur, prev = f"t{i}", f"m{i}"
        names.append(f"{n}_count")
    duck = con.execute(
        "WITH " + ", ".join(parts) + f" SELECT doc_id, {', '.join(names)},"
        f" {cur} FROM {prev} ORDER BY doc_id"
    ).fetchall()
    assert sig == duck
