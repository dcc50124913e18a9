"""Web-corpus URL curation: normalization, domain extraction, per-domain
quotas — the source-level hygiene layer every 100 TB web/transcript
pipeline runs before content-level dedup (CCNet/C4/RefinedWeb all quota
and canonicalize by host before anything touches the text).

Everything here is a pure codegen projection (Java∩RE2-safe regexes, no
Python, no shuffle except the explicit quota aggregation), so the full
corpus is curated at scan speed and every function has a byte-exact
DuckDB twin for the oracle gate.

Normalization semantics (pinned; deliberately the conservative subset
that is safe WITHOUT fetching): lowercase scheme+host, strip fragment,
strip default ports (:80 http / :443 https), drop known tracking params
(utm_*, gclid, fbclid), sort surviving query params, collapse duplicate
slashes in the path, strip trailing slash on non-root paths. No percent-
decoding (unsafe without charset knowledge) and no PSL lookup —
``registrable_domain`` implements the two-label heuristic plus the
common cc-SLD whitelist, documented as an approximation of the Public
Suffix List (the full PSL is a broadcast lookup table in production;
the column contract is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# two-label country-code second-level domains the heuristic must treat as
# suffixes (the high-traffic subset of the PSL)
CC_SLD = ["co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
          "org.au", "co.jp", "ne.jp", "or.jp", "co.kr", "com.br",
          "com.cn", "com.mx", "co.in", "co.za", "com.tr", "com.ar"]

_TRACKING = r"(utm_[a-z]+|gclid|fbclid)=[^&#]*"


def normalize_url(url: Column) -> Column:
    """Conservative URL canonicalization as one codegen expression chain."""
    u = F.trim(url)
    # lowercase scheme and host (leave path/query case alone)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)",
                                 1)),
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1))
    u = F.regexp_replace(u, r"#.*$", "")                    # fragment
    # default ports — no lookahead (RE2-safe for the DuckDB twin): the
    # optional tail group substitutes empty when absent
    u = F.regexp_replace(u, r"^(https?://[^/?#:]+):(80|443)([/?].*)?$",
                         r"$1$3")
    # tracking params, each separator case explicit (RE2-safe)
    u = F.regexp_replace(u, r"&" + _TRACKING, "")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"$", "")
    # sort query params
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(q, "&")), "&")
    u = F.when(q == "", u).otherwise(
        F.concat(F.regexp_extract(u, r"^([^?]*)\?", 1), F.lit("?"),
                 sorted_q))
    # duplicate slashes in the PATH (not the scheme's //)
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://)", 1)
    tail = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    u = F.concat(scheme, F.regexp_replace(tail, r"//+", "/"))
    # trailing slash on non-root paths — both at end-of-url and before the
    # query; the root slash (`host/`) is preserved
    u = F.regexp_replace(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+/[^?]*[^/?])/\?", r"$1?")
    u = F.regexp_replace(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+/[^?]*[^/?])/$", r"$1")
    return u


def host_of(url: Column) -> Column:
    """Lowercased hostname (ports and userinfo stripped)."""
    h = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)",
                                 1))
    h = F.regexp_replace(h, r"^.*@", "")
    return F.regexp_replace(h, r":[0-9]+$", "")


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the two-label heuristic + the CC_SLD whitelist.

    ``www.news.bbc.co.uk`` -> ``bbc.co.uk``; ``a.b.example.com`` ->
    ``example.com``; bare hosts / IPs pass through unchanged.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(n >= 3, F.concat_ws(".", F.element_at(parts, -3),
                                       F.element_at(parts, -2),
                                       F.element_at(parts, -1)))
    is_ccsld = last2.isin(CC_SLD)
    return (F.when(n <= 2, host)
            .when(is_ccsld & (n >= 3), last3)
            .otherwise(last2))


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds url_norm / host / domain columns — one narrow projection."""
    u = F.col(url_col)
    norm = normalize_url(u)
    host = host_of(norm)
    return df.withColumns({
        "url_norm": norm,
        "host": host,
        "domain": registrable_domain(host),
    })


def domain_quota_sample(df: DataFrame, quota: int, url_col: str = "url",
                        order_col: str | None = None) -> DataFrame:
    """Keep at most ``quota`` rows per registrable domain — deterministic
    (rank by md5 of the normalized URL unless ``order_col`` is given), the
    standard anti-monoculture cap (C4 kept ~one page per URL, CCNet quotas
    per domain).

    One window over the domain key; a hot domain is exactly the skew case
    Spark's window handles by per-partition spill, and the md5 rank makes
    the kept set append-stable (re-running over a grown corpus keeps a
    deterministic subset, not an arrival-order artifact).
    """
    from pyspark.sql import Window

    feat = url_features(df, url_col)
    order = F.col(order_col) if order_col else F.md5(F.col("url_norm"))
    w = Window.partitionBy("domain").orderBy(order, F.col("url_norm"))
    return (feat.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= quota).drop("_rk"))
