"""URL extraction / normalization / domain operators (operators/urls.py):
python-twin equality (urllib-based reference), normalization rules,
public-suffix-lite domains, blocklist filtering, and plan shapes."""

import re

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators.urls import (
    TRACKING_PARAM_PREFIX,
    URL_COMPONENTS_RE,
    TWO_LEVEL_SUFFIXES,
    URL_RE,
    domain_filter,
    domain_stats,
    extract_urls,
)

ROWS = [
    (1, "see HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&id=9#frag ok"),
    (2, "plain http://example.com/ and http://example.com"),
    (3, "multi http://a.co.uk/x http://b.CO.UK:8080/y?utm_a=1&utm_b=2"),
    (4, "trailing http://c.net/page), punct http://c.net/q?x=1."),
    (5, "no urls here at all"),
    (6, None),
    (7, "ipish http://10.0.0.7:80/a and deep http://x.y.z.co.jp/p?a=1&utm_z=9&b=2"),
    (8, "bare host https://single/"),
]


def py_norm(url: str):
    m = re.match(URL_COMPONENTS_RE, url)
    if not m or not m.group(2):
        return None
    scheme, host, port, path, query = (
        m.group(1).lower(),
        m.group(2).lower(),
        m.group(3) or "",
        m.group(4) or "",
        m.group(5) or "",
    )
    port_part = (
        ":" + port
        if port and not ((scheme, port) in (("http", "80"), ("https", "443")))
        else ""
    )
    path_part = "" if path == "/" else path
    kept = [
        p
        for p in query.split("&")
        if p != "" and not p.startswith(TRACKING_PARAM_PREFIX)
    ]
    q_part = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{port_part}{path_part}{q_part}"


def py_domain(host: str):
    host = host.lower()
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def py_extract(doc_id, text):
    out = []
    for u in re.findall(URL_RE, text or ""):
        u = re.sub(r"[).,;!?]+$", "", u)
        m = re.match("(?i)^https?://([^/?#:]+)", u)
        host = m.group(1).lower() if m else ""
        out.append((doc_id, u, py_norm(u), host, py_domain(host)))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_extract_urls_matches_python(df):
    got = sorted(
        (r["doc_id"], r["url"], r["norm_url"], r["host"], r["domain"])
        for r in extract_urls(df).collect()
    )
    expected = sorted(t for (i, tx) in ROWS for t in py_extract(i, tx))
    assert got == expected
    assert len(got) == 10  # 10 URL occurrences across the fixture


def test_normalization_rules(df):
    norms = {r["url"]: r["norm_url"] for r in extract_urls(df).collect()}
    # casefold + default-port drop + utm strip + fragment drop
    assert (
        norms["HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&id=9#frag"]
        == "https://www.example.com/Path/To?id=9"
    )
    # bare '/' path collapses; both spellings normalize identically
    assert norms["http://example.com/"] == norms["http://example.com"] == "http://example.com"
    # non-default port survives; all-tracking query drops the '?'
    assert norms["http://b.CO.UK:8080/y?utm_a=1&utm_b=2"] == "http://b.co.uk:8080/y"
    # trailing prose punctuation stripped before parsing
    assert "http://c.net/page" in norms and "http://c.net/q?x=1" in norms
    # mixed query keeps non-tracking params in order
    assert norms["http://x.y.z.co.jp/p?a=1&utm_z=9&b=2"] == "http://x.y.z.co.jp/p?a=1&b=2"


def test_registered_domain_rules(df):
    doms = {r["url"]: r["domain"] for r in extract_urls(df).collect()}
    assert doms["http://a.co.uk/x"] == "a.co.uk"  # two-level suffix → 3 labels
    assert doms["http://x.y.z.co.jp/p?a=1&utm_z=9&b=2"] == "z.co.jp"
    assert doms["HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&id=9#frag"] == "example.com"
    assert doms["http://10.0.0.7:80/a"] == "0.7"  # IP hosts need no PSL (documented lite rule)
    assert doms["https://single/"] == "single"   # single-label passthrough


def test_domain_stats(df):
    stats = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in domain_stats(df).collect()}
    assert stats["example.com"] == (3, 2)  # 1 in doc1 + 2 in doc2
    assert stats["c.net"] == (2, 1)


def test_domain_filter_blocklist(df):
    kept = sorted(r["doc_id"] for r in domain_filter(df, ["EXAMPLE.com"]).collect())
    assert kept == [3, 4, 5, 6, 7, 8]  # docs 1,2 dropped; no-URL docs kept
    # empty-ish blocklist of unseen domain keeps everything
    kept2 = sorted(r["doc_id"] for r in domain_filter(df, ["nope.org"]).collect())
    assert kept2 == [1, 2, 3, 4, 5, 6, 7, 8]


def test_extraction_plan_is_shuffle_free(df):
    plan = extract_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
