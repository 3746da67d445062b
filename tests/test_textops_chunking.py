"""Semantics of the two round-3 training-pipeline operators:
token-window chunking (context packing) and deterministic stratified
mixture sampling."""

from pyspark.sql import functions as F


def test_chunk_windows_overlap_and_coverage(spark):
    from scones.textops import chunk_windows

    # 10 tokens, window=4, stride=3 → starts 0,3,6,9 → 4 chunks, last is
    # a 1-token tail
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, ""), (3, "solo")],
        ["doc_id", "text"],
    )
    rows = (
        chunk_windows(df, window=4, stride=3)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # empty doc yields no chunks
    assert [r.chunk_text for r in by_doc[3]] == ["solo"]
    c1 = by_doc[1]
    assert [r.chunk_id for r in c1] == [0, 1, 2, 3]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap (4-3)
    assert c1[3].chunk_text == "t9" and c1[3].n_tokens == 1
    # every token of the doc appears in some chunk (stride ≤ window)
    covered = {t for r in c1 for t in r.chunk_text.split(" ")}
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_windows_no_overlap_partition(spark):
    """window == stride ⇒ exact partition: concatenating the chunks
    reconstructs the token stream."""
    from scones.textops import chunk_windows

    text = " ".join(f"w{i}" for i in range(17))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_windows(df, window=5, stride=5).orderBy("chunk_id").collect()
    assert " ".join(r.chunk_text for r in rows) == text
    assert [r.n_tokens for r in rows] == [5, 5, 5, 2]


def test_sample_mixture_deterministic_and_stratified(spark):
    from scones.textops import sample_mixture

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rates = {"en": 0, "zh": 1000}
    kept = sample_mixture(docs, rates, default_permille=500)
    a = {r.doc_id for r in kept.select("doc_id").collect()}
    b = {r.doc_id for r in kept.select("doc_id").collect()}
    assert a == b  # hash-gated: same verdict on re-execution
    by_lang = {
        r.lang: r.n
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "en" not in by_lang  # rate 0 drops everything
    zh_total = docs.where(F.col("lang") == "zh").count()
    assert by_lang["zh"] == zh_total  # rate 1000 keeps everything
    # default rate strata land near 50% (binomial, loose bounds)
    for lang in ("de", "es", "fr"):
        total = docs.where(F.col("lang") == lang).count()
        assert 0.25 * total <= by_lang[lang] <= 0.75 * total


def test_repetition_scores_semantics(spark):
    from scones.textops import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "a a a b"),        # top tok 3/4; bigram 'a a' 2/3
            (2, "x"),              # single token: frac 1.0, bigram 0.0
            (3, "p q p q p"),      # top tok 3/5; 'p q' 2/4
            (4, ""),               # dropped
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_scores(df).collect()}
    assert 4 not in rows
    assert rows[1].n_tokens == 4
    assert rows[1].top_token_frac == 0.75
    assert rows[1].top_bigram_frac == round(2 / 3, 6)
    assert rows[2].top_token_frac == 1.0 and rows[2].top_bigram_frac == 0.0
    assert rows[3].top_token_frac == 0.6 and rows[3].top_bigram_frac == 0.5


def test_pii_counts_and_redact(spark):
    from scones.textops import pii_counts, pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+e@f.org from 192.168.0.1"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in pii_redact(pii_counts(df), "text").collect()}
    assert out[1].n_email == 2 and out[1].n_ip == 1
    assert out[1].text_redacted == "mail [EMAIL] and [EMAIL] from [IP]"
    assert out[2].n_email == 0 and out[2].n_ip == 0
    assert out[2].text_redacted == "no pii here"


def test_chunk_and_repetition_vs_python_reference(spark):
    """200 seeded random docs: both row-local operators must agree with
    a direct per-doc Python reference (the same style of cross-check the
    framing kernels get from scones.oracle)."""
    import random

    from scones.textops import chunk_windows, repetition_scores

    rng = random.Random(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    W, S = 7, 5
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_windows(df, window=W, stride=S).collect()
    }
    want = {}
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        for ci, s in enumerate(range(0, len(toks), S)):
            chunk = toks[s : s + W]
            want[(i, ci)] = (len(chunk), " ".join(chunk))
    assert got == want

    rep = {r.doc_id: r for r in repetition_scores(df).collect()}
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            assert i not in rep
            continue
        top_tok = max(toks.count(t) for t in set(toks)) / len(toks)
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        top_bg = (
            max(grams.count(g) for g in set(grams)) / len(grams) if grams else 0.0
        )
        assert rep[i].n_tokens == len(toks)
        assert rep[i].top_token_frac == round(top_tok, 6)
        assert rep[i].top_bigram_frac == round(top_bg, 6)


def test_decontaminate_flags_exact_overlap(spark):
    from scones.textops import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox jumps over nothing today at all"),  # shares 5-gram
            (3, "completely different words with no overlap here"),
            (4, "short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "xx the quick brown fox jumps yy")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.is_contaminated
        for r in decontaminate(docs, bench, k=5).collect()
    }
    # doc 1 shares 'the quick brown fox jumps'; doc 2 shares
    # 'quick brown fox jumps over'? benchmark has 'quick brown fox jumps yy'
    # — only 5-grams of the bench text count: {'xx the quick brown fox',
    # 'the quick brown fox jumps', 'quick brown fox jumps yy'}
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    import __spark_entry__ as e

    df = e.queries()["decontaminate"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
