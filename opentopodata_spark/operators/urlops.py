"""URL normalization + domain-level operators for crawl corpora.

The RefinedWeb/CCNet front door: before any text-level dedup, a crawl
pipeline dedups and filters by URL — normalize (case, default ports,
tracking params, fragments), extract the registrable domain, aggregate
per-domain stats, and drop blocklisted domains. All of it is pure
column expressions (regexp + array ops, fully codegen'd, zero Python),
so at 10^12 documents the normalize step is a free projection riding
the first corpus scan, domain stats are one hash aggregation, and the
blocklist is a broadcast anti-join.

Regex vocabulary is the Java/RE2 common subset (same discipline as
textops.scrub_pii) so a DuckDB oracle replays it verbatim.

Scope notes (documented, not silent): IPv6 literal hosts keep their
brackets un-split (no port stripping); percent-encoding is preserved
as-is (normalizing %41 -> A needs a decode table — out of scope); the
public-suffix list is a compact built-in subset, replaceable via the
``two_level_suffixes`` argument for a full PSL deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_RE",
    "TWO_LEVEL_SUFFIXES",
    "url_parts",
    "normalize_url",
    "registrable_domain",
    "domain_stats",
    "blocklist_filter",
]

# query params dropped during normalization: analytics/click trackers that
# make byte-identical pages look unique (the dominant URL-dedup false-miss)
TRACKING_PARAM_RE = "^(utm_[a-z]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="

# compact public-suffix subset: a host ending in one of these keeps THREE
# labels as its registrable domain (bbc.co.uk), everything else keeps two
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za", "com.tr",
)

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTHORITY_RE = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]*)"
_PATH_RE = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def url_parts(url):
    """struct(scheme, host, port, path, query) from a URL column.

    Lowercases scheme and host (RFC 3986: both case-insensitive), strips
    userinfo, splits a trailing :port off non-IPv6 hosts. path/query keep
    their original case (case-significant per RFC).
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    authority = F.regexp_extract(url, _AUTHORITY_RE, 1)
    hostport = F.lower(F.regexp_extract(authority, "([^@]*)$", 1))
    # [::1]-style literals keep everything; otherwise split one :port tail
    host = F.when(
        hostport.startswith("["), hostport
    ).otherwise(F.regexp_extract(hostport, "^([^:]*)", 1))
    port = F.when(
        hostport.startswith("["), F.lit("")
    ).otherwise(F.regexp_extract(hostport, ":([0-9]+)$", 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
    )


def _clean_query(query):
    """Tracking params dropped, survivors sorted for order-independence."""
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.array_join(kept, "&")


def normalize_url(url, strip_www: bool = True):
    """Canonical form of a URL column (pure expression, no UDF).

    scheme+host lowercased, userinfo dropped, default ports (http:80,
    https:443) dropped, optional leading ``www.`` dropped, path's
    trailing slash trimmed (empty path -> '/'), tracking query params
    dropped and the rest sorted, fragment dropped. Two crawl records of
    the same page normalize to the same string — groupBy it for URL-level
    dedup before any text is even read.
    """
    p = url_parts(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(p["path"], "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = _clean_query(p["query"])
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)


def registrable_domain(host, two_level_suffixes=TWO_LEVEL_SUFFIXES):
    """eTLD+1 of a (lowercased) host column: three labels when the host
    ends in a listed two-level public suffix, else two labels."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_two_level = last2.isin(*two_level_suffixes)
    return F.when((n >= 3) & is_two_level, last3).otherwise(last2)


def domain_stats(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(domain, n_docs, n_urls, total_chars) — one hash aggregation.

    n_urls counts distinct NORMALIZED urls, so tracking-param noise
    doesn't inflate a domain's apparent page count.
    """
    d = docs.select(
        registrable_domain(url_parts(F.col(url_col))["host"]).alias("domain"),
        normalize_url(F.col(url_col)).alias("nurl"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("nc"),
    )
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("nurl").alias("n_urls"),
        F.sum("nc").cast("long").alias("total_chars"),
    )


def blocklist_filter(
    docs: DataFrame, blocked_domains, url_col: str = "url"
) -> DataFrame:
    """Drop docs whose registrable domain is blocklisted.

    ``blocked_domains``: a list of domain strings OR a 1-column DataFrame
    (broadcast anti-join — a blocklist is small next to the corpus; pass
    a DataFrame to skip the broadcast hint if yours is not).
    """
    dom = registrable_domain(url_parts(F.col(url_col))["host"]).alias("_dom")
    tagged = docs.withColumn("_dom", dom)
    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.toDF("_dom")
    else:
        spark = docs.sparkSession
        bl = F.broadcast(
            spark.createDataFrame([(d,) for d in blocked_domains], "_dom string")
        )
    return tagged.join(bl, "_dom", "left_anti").drop("_dom")
