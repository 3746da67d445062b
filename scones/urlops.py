"""URL canonicalization + canonical-URL dedup.

The reference ships log lines and never inspects URLs (the closest it
gets is the per-file static-field merge, file_reader.go:115-117), but a
web-text ingest pipeline built on the same dataflow dedups fetched pages
by *canonical* URL before any content-level dedup: the same page is
crawled as ``HTTP://WWW.Example.COM:80/a/?utm_source=feed&b=2&a=1#top``
and ``https://example.com/a?a=1&b=2`` and both must collapse to one
fetch slot.  The normalization rules below are the standard RFC 3986
syntax-based ones (case-normalize scheme/host, drop default ports,
drop fragments) plus the crawl-pipeline conventions (strip ``www.``,
drop tracking parameters, sort the query string, trim trailing path
slashes).

Scale shape: ``canonicalize_urls`` is pure row-local JVM
regexp/higher-order-function codegen — zero exchanges, no Python
crossing, safe inside the flagship's single pipelined stage.
``url_dedup`` adds exactly one map-side-combinable groupBy keyed on the
canonical string; only ``(canonical_url, doc_id)`` pairs shuffle, never
page bodies, so at 100 TB the exchange is O(corpus cardinality × ~100
bytes).  Every regexp is RE2-compatible, so the DuckDB oracle replays
the same patterns verbatim (the same contract normalize_text uses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that never change page identity (tracking/attribution
# junk).  Anchored: both Spark RLIKE and DuckDB regexp_matches are
# partial-match, so ^...$ makes them agree.
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def canonical_url_col(url: Column) -> Column:
    """Canonical form of ``url`` as a Column expression (composable into
    a larger select; whole-stage-codegen friendly)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    hostport = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qjoin = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoin == "", F.lit("")).otherwise(F.concat(F.lit("?"), qjoin)),
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Project ``(id, url, canonical_url)`` — row-local, zero exchanges."""
    return df.select(
        id_col, url_col, canonical_url_col(F.col(url_col)).alias("canonical_url")
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse raw URLs onto canonical fetch slots: per canonical URL,
    the keeper (min id — deterministic, retry-stable), how many raw rows
    collapsed onto it, and how many *distinct raw spellings* they used.

    One hash aggregation; min/count/count-distinct all have partial
    (map-side) implementations, so the exchange carries pre-combined
    per-partition rows.
    """
    c = canonicalize_urls(df, url_col=url_col, id_col=id_col)
    return c.groupBy("canonical_url").agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(url_col).alias("n_raw_forms"),
    )


def oracle_canonical_sql(url_expr: str) -> str:
    """DuckDB expression computing the SAME canonical form over
    ``url_expr`` — the oracle-side replay of :func:`canonical_url_col`.
    Kept next to the Spark expression so the two rule sets cannot
    drift apart silently."""
    return f"""
      (WITH_SCHEME || '://' || WITH_HOST || WITH_PATH || WITH_QUERY)
    """.replace(
        "WITH_SCHEME",
        f"lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1))",
    ).replace(
        "WITH_HOST",
        f"""CASE
              WHEN lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1)) = 'http'
                THEN regexp_replace(regexp_replace(lower(regexp_extract({url_expr}, '{_HOSTPORT_RE}', 1)), '^www\\.', ''), ':80$', '')
              WHEN lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1)) = 'https'
                THEN regexp_replace(regexp_replace(lower(regexp_extract({url_expr}, '{_HOSTPORT_RE}', 1)), '^www\\.', ''), ':443$', '')
              ELSE regexp_replace(lower(regexp_extract({url_expr}, '{_HOSTPORT_RE}', 1)), '^www\\.', '')
            END""",
    ).replace(
        "WITH_PATH",
        f"""CASE WHEN regexp_replace(regexp_extract({url_expr}, '{_PATH_RE}', 1), '/+$', '') = ''
              THEN '/'
              ELSE regexp_replace(regexp_extract({url_expr}, '{_PATH_RE}', 1), '/+$', '')
            END""",
    ).replace(
        "WITH_QUERY",
        f"""coalesce(
              CASE WHEN list_aggr(list_sort(list_filter(
                        string_split(regexp_extract({url_expr}, '{_QUERY_RE}', 1), '&'),
                        x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))),
                      'string_agg', '&') = ''
                   THEN ''
                   ELSE '?' || list_aggr(list_sort(list_filter(
                        string_split(regexp_extract({url_expr}, '{_QUERY_RE}', 1), '&'),
                        x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))),
                      'string_agg', '&')
              END, '')""",
    )
