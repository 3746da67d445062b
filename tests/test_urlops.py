"""URL canonicalization unit cases (hand-written expected forms) and the
dedup keep-min contract.  The Spark-vs-DuckDB oracle equality for the
registered ``canonical_urls`` / ``url_dedup`` entries is covered by the
parametrized gate in test_entry_contract.py."""

from pyspark.sql import functions as F

from scones.urlops import canonicalize_urls, url_dedup

CASES = [
    # case-normalize scheme+host, strip default port, strip www., strip
    # tracking params, sort query, drop fragment, trim trailing slash
    (
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=feed&b=2&a=1&ref=x#top",
        "http://example.com/a/b?a=1&b=2",
    ),
    # https default port
    ("https://Example.com:443/x?gclid=1&z=9", "https://example.com/x?z=9"),
    # non-default port survives
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # no path -> "/"
    ("https://example.com?fbclid=abc", "https://example.com/"),
    # root with only tracking params -> bare root, no "?"
    ("http://www.example.com/?utm_campaign=x", "http://example.com/"),
    # params already sorted, untouched; utm_ match is prefix-anchored so
    # "mutm_x" and "refresh" are KEPT (anchored regex, not substring)
    ("http://example.com/p?mutm_x=1&refresh=2", "http://example.com/p?mutm_x=1&refresh=2"),
    # bare "ref" (no '=') is still tracking junk
    ("http://example.com/p?a=1&ref", "http://example.com/p?a=1"),
    # multiple trailing slashes collapse
    ("http://example.com/a///", "http://example.com/a"),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], ["doc_id", "url"]
    )
    got = {
        r["url"]: r["canonical_url"] for r in canonicalize_urls(df).collect()
    }
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_canonicalize_is_row_local(spark):
    """Zero exchanges: the canonical projection must not shuffle."""
    df = spark.createDataFrame([(1, "http://a.com/x")], ["doc_id", "url"])
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_dedup_keep_min(spark):
    rows = [
        (7, "HTTP://WWW.A.COM/x?utm_source=1"),
        (3, "http://a.com/x"),
        (9, "http://a.com/x/"),
        (5, "https://b.com/y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert set(out) == {"http://a.com/x", "https://b.com/y"}
    a = out["http://a.com/x"]
    assert a["keeper_id"] == 3 and a["n_urls"] == 3 and a["n_raw_forms"] == 3
    b = out["https://b.com/y"]
    assert b["keeper_id"] == 5 and b["n_urls"] == 1 and b["n_raw_forms"] == 1


def test_url_dedup_partial_agg(spark):
    """The groupBy must keep its map-side combine (partial_ prefix or a
    two-phase HashAggregate pair) so the exchange carries pre-combined
    rows at scale."""
    df = spark.createDataFrame(
        [(i, f"http://h{i % 3}.com/p") for i in range(30)], ["doc_id", "url"]
    )
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2


def test_url_blocklist_suffix_and_density(spark):
    """A blocklist entry blocks itself AND subdomains; the bad-word gate
    is a per-mille density, not a count; empty docs never divide by 0."""
    from scones.urlops import url_blocklist_filter

    bl = spark.createDataFrame([("spam.example.com",), ("bad.net",)], ["domain"])
    docs = spark.createDataFrame(
        [
            (1, "https://www.sub.spam.example.com:443/x", "clean text here"),
            (2, "http://ok.example.com/y", "bad bad bad word ok ok ok ok ok ok"),
            (3, "https://fine.org/z?a=1", ""),
            (4, "https://BAD.net/q", "anything"),
        ],
        ["doc_id", "url", "text"],
    )
    got = {
        r.doc_id: r
        for r in url_blocklist_filter(
            docs, bl, ["bad", "word"], max_badword_permille=350
        ).collect()
    }
    assert got[1].domain_blocked and not got[1].kept
    assert not got[2].domain_blocked
    assert got[2].n_badwords == 4 and got[2].n_tokens == 10
    assert got[2].badword_permille == 400.0 and not got[2].kept
    assert got[3].n_tokens == 0 and got[3].badword_permille == 0.0 and got[3].kept
    assert got[4].domain_blocked  # case-insensitive host match


def test_url_blocklist_plan_broadcasts_blocklist(spark):
    from pyspark.sql import functions as F
    from scones.urlops import url_blocklist_filter

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select(
            "doc_id",
            F.concat(F.lit("https://"), "source", F.lit(".example.com/p")).alias("url"),
            "text",
        )
    )
    bl = spark.createDataFrame([("src3.example.com",)], ["domain"])
    plan = (
        url_blocklist_filter(docs, bl, ["slow"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
