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


def host_col(url: Column) -> Column:
    """Canonical host of ``url``: lowercase, ``www.`` and port stripped
    (the host component of :func:`canonical_url_col`, reusable alone)."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    hostport = F.regexp_replace(hostport, "^www\\.", "")
    return F.regexp_replace(hostport, ":[0-9]+$", "")


def domain_suffixes_col(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com, com]`` — the candidate keys a domain-blocklist match
    probes (a blocklist entry blocks itself AND every subdomain, the
    standard crawl-filter semantics, cf. RefinedWeb §URL filtering).
    Row-local: labels number ~4-6, so the explode fan-out is tiny."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    badwords: list[str],
    max_badword_permille: int = 50,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RefinedWeb-style document gating on two public-recipe signals:

      * **domain blocklist** — the host (or ANY parent domain of it)
        appears in ``blocklist`` (one ``domain: string`` column);
      * **bad-word density** — blocklisted words exceed
        ``max_badword_permille`` per thousand tokens (case-insensitive
        whole-token match against ``badwords``).

    Returns one row per input doc: ``(doc_id, host, domain_blocked,
    n_badwords, n_tokens, badword_permille, kept)`` — flags, not a
    filter, so drop REASONS stay auditable (the c4_line_filter
    contract).

    Scale shape: the bad-word counter is a row-local JVM fold (the
    lexicon is a bounded literal array).  The domain probe explodes
    each doc's ~5 host suffixes and hash-joins the 8-byte
    ``(doc_id, suffix)`` pairs against the **broadcast** blocklist dim
    (a blocklist is ~10^5-10^6 rows — dim-table scale); hits are
    reduced to a distinct id set whose size is bounded by the blocked
    fraction, then joined back (AQE picks broadcast when small).  Page
    bodies never shuffle.
    """
    from pyspark.sql.functions import broadcast

    host = host_col(F.col(url_col)).alias("host")
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    bad = F.array([F.lit(w.lower()) for w in badwords])
    n_bad = F.size(F.filter(toks, lambda x: F.array_contains(bad, F.lower(x))))
    base = df.select(
        id_col,
        host,
        F.size(toks).alias("n_tokens"),
        n_bad.alias("n_badwords"),
    )
    hits = (
        base.select(id_col, F.explode(domain_suffixes_col(F.col("host"))).alias("sfx"))
        .join(
            broadcast(blocklist.select(F.lower("domain").alias("sfx"))), "sfx"
        )
        .select(id_col)
        .distinct()
        .withColumn("domain_blocked", F.lit(True))
    )
    permille = (
        F.when(F.col("n_tokens") > 0, (F.col("n_badwords") * 1000) / F.col("n_tokens"))
        .otherwise(F.lit(0.0))
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "host",
            F.coalesce("domain_blocked", F.lit(False)).alias("domain_blocked"),
            "n_badwords",
            "n_tokens",
            F.round(permille, 6).alias("badword_permille"),
        )
        .withColumn(
            "kept",
            ~F.col("domain_blocked")
            & (F.col("badword_permille") <= F.lit(float(max_badword_permille))),
        )
    )
