"""Driver-contract gate: entry() smoke + every queries() entry vs its
DuckDB oracle at sf0.01 (replicates the driver's CORRECTNESS check)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, normalize

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sink_id", "lang", "n_rows", "n_bytes", "distinct_urls"} <= set(
        df.columns
    )
    assert sum(r["n_rows"] for r in rows) == 500  # sf0.001 documents table


def test_every_query_has_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Round 2: every query is oracle-checked — no rows-only entries left.
    assert set(qs) == set(oracles)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only: runs and returns a stable schema
        return
    odf = duck.execute(oracles[name]).df()
    a, b = normalize(sdf), normalize(odf)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), name
    assert a.equals(b), f"{name}: value mismatch"


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates verified at the same threshold should recover the
    exact-Jaccard pairs (high recall on this corpus)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in entrymod.queries()["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in entrymod.queries()["minhash_lsh_pairs"](spark, SF_DIR).collect()
    }
    assert lsh <= exact or exact <= lsh
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.8


def test_ngram_jaccard_max_df_cap(spark):
    """A generous doc-frequency cap must not change results on a corpus
    with no stop-shingles that frequent; a tight cap still runs."""
    from scones.textops import ngram_jaccard_pairs

    docs = entrymod._t(spark, SF_DIR, "documents")
    uncapped = {
        (r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 3, 0.2).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, 3, 0.2, max_df=10**6).collect()
    }
    assert capped == uncapped
    tight = ngram_jaccard_pairs(docs, 3, 0.2, max_df=2).count()
    assert tight >= 0  # runs; pairs may drop under the tight cap


def test_ngram_jaccard_entry_cap_engages_on_zipf(spark, tmp_path):
    """The driver-visible entry query passes a NON-ZERO footer-derived cap
    (round-4 verdict item 4) and that cap actually engages on a
    realistic-vocabulary corpus: the Zipf generator plants duplicate
    clusters whose stop-shingles exceed the 2% df bound, so the capped
    shingle universe is strictly smaller than the raw one."""
    from pyspark.sql import functions as F

    from scones.corpus import write_zipf_documents
    from scones.textops import shingles

    d = str(tmp_path / "zipf")
    write_zipf_documents(d, n_docs=500, seed=42)
    # the entry derives the cap from the corpus footer: 500 docs → 10
    cap = entrymod._jaccard_max_df(d)
    assert cap == 10
    docs = spark.read.parquet(f"{d}/documents.parquet")
    dfreq = (
        shingles(docs, 3)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.max("df").alias("mx"))
        .first()["mx"]
    )
    assert dfreq > cap  # the cap ENGAGES: some shingle exceeds it
    # and the oracle replays a footer-derived cap, not a pinned constant
    # (at the sf0.01 gate: 500 docs → the same cap of 10)
    assert "HAVING COUNT(*) <= 10" in entrymod.oracle_sql()["ngram_jaccard_pairs"]


def test_simhash_identical_docs_collide(spark):
    from scones.textops import simhash64

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert out[1] == out[2]


def test_dup_components_transitive_chain(spark):
    """A~B, B~C, C~D must cluster {A,B,C,D} even though A and D share no
    edge — the transitive case keep-min dedup can't express.  Long chain
    exercises >1 propagation round (pointer jumping)."""
    from scones.textops import dup_components

    chain = [(i, i + 1) for i in range(10, 30)]  # path graph, diameter 20
    island = [(100, 101)]
    pairs = spark.createDataFrame(chain + island, ["doc_a", "doc_b"])
    comp = {r.doc_id: r.component for r in dup_components(pairs).collect()}
    assert all(comp[i] == 10 for i in range(10, 31))
    assert comp[100] == comp[101] == 100
    assert len(comp) == 23


def test_simhash_reshape_equals_bit_explode(spark):
    """The round-2 single-explode simhash must be value-identical to the
    round-1 bit-exploded formulation (same xxhash64 votes, 16× less
    shuffle)."""
    from pyspark.sql import functions as F

    from scones.textops import simhash64, tokens_col

    docs = entrymod._t(spark, SF_DIR, "documents")
    new = {r.doc_id: r.simhash for r in simhash64(docs, bits=16).collect()}

    bits = 16
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    h = tok.withColumn("h", F.xxhash64("tok"))
    bitpos = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        h.select("doc_id", "h", bitpos)
        .withColumn("vote", F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1))
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    old_df = votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") > 0, F.expr("1 << bit")).otherwise(0)).alias("simhash")
    )
    old = {r.doc_id: r.simhash for r in old_df.collect()}
    assert new == old


def test_star_components_match_min_propagation(spark):
    """large-star/small-star must produce the identical (doc_id,
    component) labeling as min-propagation on a mixed graph: chains,
    a blob, islands, singleton-free."""
    import random

    from scones.textops import dup_components, dup_components_star

    rng = random.Random(5)
    edges = [(i, i + 1) for i in range(10, 30)]           # chain
    edges += [(100, x) for x in range(101, 110)]          # star blob
    edges += [(rng.randrange(200, 240), rng.randrange(200, 240)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    want = {r.doc_id: r.component for r in dup_components(pairs).collect()}
    got = {r.doc_id: r.component for r in dup_components_star(pairs).collect()}
    assert got == want


def test_star_components_fewer_rounds_on_adversarial_chain(spark):
    """The chain graph is the adversarial case for diameter-bound CC:
    the alternating star algorithm must converge in fewer rounds than
    min-propagation + pointer jumping (round-2 verdict item 7) and still
    label the whole chain with its min."""
    from scones.textops import dup_components, dup_components_star

    n = 256  # diameter 256 chain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["doc_a", "doc_b"]
    )
    r_prop: list[int] = []
    r_star: list[int] = []
    want = {i: 0 for i in range(n + 1)}
    got_prop = {
        r.doc_id: r.component
        for r in dup_components(pairs, max_iter=50, round_counter=r_prop).collect()
    }
    got_star = {
        r.doc_id: r.component
        for r in dup_components_star(pairs, round_counter=r_star).collect()
    }
    assert got_prop == want and got_star == want
    assert r_star[0] < r_prop[0], (r_star, r_prop)
