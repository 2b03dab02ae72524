"""URL extraction, normalization, and domain analytics over a text corpus.

The web-scale corpus hygiene trio: pull URLs out of document text,
canonicalize them (casefold scheme/host, drop default ports, fragments
and utm_* tracking params, collapse a bare '/' path), resolve the
registered domain with a public-suffix-lite rule, then aggregate or
blocklist-filter per domain.

All pure Catalyst expressions — one `regexp_extract_all` + explode, then
a fixed tree of `regexp_extract`/`split`/`filter` column ops; the DuckDB
oracle is generated from the SAME pattern constants (the pii.py
discipline) so the two engines cannot drift. Patterns stay inside the
RE2 ∩ java.util.regex common subset: no backrefs, no lookaround.

Scale shape: extraction is embarrassingly parallel (no shuffle);
`domain_stats` is one hash aggregate on the registered-domain key
(map-side combine absorbs the head domains — domain frequency is
Zipfian, the classic skewed-key aggregate that partial aggregation
exists for); `domain_filter` reduces each doc to its distinct blocked
domains before the anti-join so the join input is slim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# match scheme://authority... up to whitespace/angle-bracket/quote, then
# strip trailing prose punctuation that regex greed would swallow.
# (?i): schemes appear uppercased in the wild; the flag is in the
# RE2 ∩ Java common subset. Component slices keep original case — only
# scheme/host are explicitly lowercased during normalization.
URL_RE = '(?i)https?://[^\\s<>"]+'
URL_TRAIL_PUNCT_RE = "[).,;!?]+$"
# ^scheme://host[:port][path][?query][#fragment]$ — groups 1..5
URL_COMPONENTS_RE = (
    "(?i)^(https?)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
)
# two-level public suffixes (abridged public-suffix-list data; the rule —
# registered domain = one label beyond the public suffix — is the real
# thing, the table is the common-TLD subset that fits a literal)
TWO_LEVEL_SUFFIXES = [
    "ac.uk", "co.in", "co.jp", "co.kr", "co.uk", "co.za", "com.au",
    "com.br", "com.cn", "com.mx", "com.sg", "com.tr", "gov.uk", "net.au",
    "or.jp", "org.uk",
]
TRACKING_PARAM_PREFIX = "utm_"


def _extract_url_array(text: Column) -> Column:
    raw = F.regexp_extract_all(text, F.lit(URL_RE), 0)
    return F.transform(raw, lambda u: F.regexp_replace(u, URL_TRAIL_PUNCT_RE, ""))


def normalized_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports dropped,
    utm_* params dropped ('?' dropped when nothing survives), fragment
    dropped, bare-'/' path collapsed. Non-URL input → null."""
    scheme = F.lower(F.regexp_extract(url, URL_COMPONENTS_RE, 1))
    host = F.lower(F.regexp_extract(url, URL_COMPONENTS_RE, 2))
    port = F.regexp_extract(url, URL_COMPONENTS_RE, 3)
    path = F.regexp_extract(url, URL_COMPONENTS_RE, 4)
    query = F.regexp_extract(url, URL_COMPONENTS_RE, 5)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path_part = F.when(path == "/", F.lit("")).otherwise(path)
    kept_params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith(TRACKING_PARAM_PREFIX),
    )
    q_str = F.array_join(kept_params, "&")
    query_part = F.when(q_str != "", F.concat(F.lit("?"), q_str)).otherwise(F.lit(""))
    return F.when(
        host != "",
        F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part),
    )


def registered_domain(host: Column) -> Column:
    """Public-suffix-lite: last two labels, or last three when the last
    two are a known two-level suffix (co.uk, com.au, ...). Hosts with
    fewer labels pass through unchanged."""
    labels = F.split(F.lower(host), "\\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return F.when(n <= 2, F.lower(host)).otherwise(
        F.when(last2.isin(*TWO_LEVEL_SUFFIXES), last3).otherwise(last2)
    )


def extract_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per URL occurrence: (id, url, norm_url, host,
    registered_domain). Docs without URLs contribute no rows (inner
    explode — the downstream joins/aggregates never see them)."""
    c = F.col(text_col)
    stage1 = df.select(
        F.col(id_col), F.explode(_extract_url_array(c)).alias("url")
    )
    host = F.lower(F.regexp_extract("url", URL_COMPONENTS_RE, 2))
    return stage1.select(
        F.col(id_col),
        F.col("url"),
        normalized_url(F.col("url")).alias("norm_url"),
        host.alias("host"),
        registered_domain(host).alias("domain"),
    )


def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per registered domain: URL occurrences and distinct docs. The doc
    count pre-distincts (domain, id) pairs — no count-distinct expand in
    the aggregate (the token_frequencies df trick)."""
    urls = extract_urls(df, text_col, id_col)
    occ = urls.groupBy("domain").agg(F.count(F.lit(1)).alias("n_urls"))
    docs = (
        urls.select("domain", id_col)
        .distinct()
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return occ.join(docs, "domain")


def domain_filter(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents containing ANY URL whose registered domain is on
    the blocklist (the corpus-hygiene deny rule). Blocked ids are a slim
    distinct-key side, broadcast into an anti-join — the corpus itself
    is never shuffled."""
    urls = extract_urls(df, text_col, id_col)
    blocked = (
        urls.filter(F.col("domain").isin(*[b.lower() for b in blocklist]))
        .select(id_col)
        .distinct()
    )
    return df.join(F.broadcast(blocked), id_col, "left_anti")
