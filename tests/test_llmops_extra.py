"""Round-4 LLM-data additions: C4-style span dedup, df/idf stats,
bigram-LM perplexity scoring, token-budget sequence packing."""

import pytest
from pyspark.sql import functions as F

from scones.textops import (
    doc_freq_stats,
    lm_perplexity,
    pack_sequences,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_span_dedup_keeps_first_occurrence_only(spark):
    """A span repeated across (or within) docs survives once, at its
    lowest (doc_id, span_idx); docs reassemble from surviving spans in
    order."""
    span = " ".join(f"w{i}" for i in range(10))  # one exact 10-word span
    other = " ".join(f"x{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, span + " " + other),          # spans: [span, other] — both first
            (2, span + " " + span),           # both copies duplicate doc 1's
            (3, other + " tail words here"),  # span 0 dup; short tail span kept
        ],
    )
    out = {r.doc_id: r for r in span_dedup(df, span_words=10).collect()}
    assert out[1].clean_text == span + " " + other
    assert (out[1].n_spans_kept, out[1].n_spans_dropped) == (2, 0)
    assert out[2].clean_text == ""  # every span seen earlier
    assert (out[2].n_spans_kept, out[2].n_spans_dropped) == (0, 2)
    assert out[3].clean_text == "tail words here"
    assert (out[3].n_spans_kept, out[3].n_spans_dropped) == (1, 1)


def test_doc_freq_stats_df_and_idf(spark):
    import math

    df = _docs(
        spark,
        [
            (1, "alpha beta alpha"),  # alpha counts ONCE per doc
            (2, "alpha gamma"),
            (3, "beta"),
        ],
    )
    rows = {r.term: r for r in doc_freq_stats(df, top_n=10).collect()}
    assert rows["alpha"].df == 2 and rows["beta"].df == 2
    assert rows["gamma"].df == 1
    assert rows["alpha"].idf == round(math.log(3 / 2), 6)
    assert rows["gamma"].idf == round(math.log(3 / 1), 6)


def test_lm_perplexity_outlier_scores_higher(spark):
    """Docs made of the corpus's dominant bigrams score fewer bits than
    a doc of one-off bigrams; docs with <2 tokens get 0 bits."""
    common = "the cat sat on the mat"
    df = _docs(
        spark,
        [(i, common) for i in range(10)]
        + [(100, "zebra quark flux bogon")]  # bigrams seen exactly once
        + [(101, "solo")],
    )
    out = {r.doc_id: r for r in lm_perplexity(df).collect()}
    assert out[0].n_bigrams == 5
    assert out[100].n_bigrams == 3
    assert out[101].n_bigrams == 0 and out[101].bits_per_bigram == 0.0
    assert out[100].bits_per_bigram > out[0].bits_per_bigram


def test_normalize_text_semantics(spark):
    from scones.textops import normalize_text

    df = _docs(
        spark,
        [
            (1, "  Hello\t WORLD\r\n  x\x01y  "),
            (2, "MiXeD   Case"),
        ],
    )
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out[1].norm_text == "hello world xy"
    assert out[1].n_chars_norm == len("hello world xy")
    assert out[2].norm_text == "mixed case"


def test_source_quota_caps_per_source_deterministically(spark):
    from scones.textops import source_quota

    rows = [(i, "a" if i < 30 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = source_quota(df, max_per_source=5, seed=1).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["a"]) == 5  # capped
    assert len(by_src["b"]) == 5  # 10 docs → capped to 5
    again = {
        (r.doc_id, r.source)
        for r in source_quota(
            df.repartition(7), max_per_source=5, seed=1
        ).collect()
    }
    assert again == {(r.doc_id, r.source) for r in kept}  # deterministic


def test_pack_sequences_layout_invariants(spark):
    """Concat-and-chunk layout: offsets < budget, the layout is a
    permutation-free exact prefix sum (bin boundaries consistent with
    token totals), and the result is deterministic and independent of
    input partitioning (the distributed prefix sum == a global scan)."""
    rows = [(i, " ".join(["tok"] * (5 + i % 17))) for i in range(200)]
    df = _docs(spark, rows)
    out = pack_sequences(df, budget_tokens=64, n_shards=8, seed=3)
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 200
    total = sum(5 + i % 17 for i in range(200))
    # offsets in range; global starts = 0..total-ntok, each exactly once
    starts = sorted(r.bin_id * 64 + r.bin_offset for r in got.values())
    assert all(0 <= r.bin_offset < 64 for r in got.values())
    assert starts[0] == 0
    ends = sorted(r.bin_id * 64 + r.bin_offset + r.n_tokens for r in got.values())
    assert ends[-1] == total  # contiguous stream, no gaps/overlaps
    assert set(starts) == {0, *ends[:-1]}
    # determinism + partitioning-independence
    again = {
        r.doc_id: r
        for r in pack_sequences(
            df.repartition(13), budget_tokens=64, n_shards=8, seed=3
        ).collect()
    }
    assert {k: (v.bin_id, v.bin_offset) for k, v in got.items()} == {
        k: (v.bin_id, v.bin_offset) for k, v in again.items()
    }


def test_pack_sequences_more_shards_same_order_scale_knob(spark):
    """n_shards changes the layout (it is part of the order definition)
    but every shard count yields a valid gap-free stream — the scale
    knob is free to grow with the corpus."""
    rows = [(i, " ".join(["t"] * 7)) for i in range(50)]
    df = _docs(spark, rows)
    for n_shards in (2, 16):
        out = pack_sequences(df, budget_tokens=32, n_shards=n_shards, seed=1)
        rs = out.collect()
        ends = sorted(r.bin_id * 32 + r.bin_offset + r.n_tokens for r in rs)
        assert ends[-1] == 350
        starts = sorted(r.bin_id * 32 + r.bin_offset for r in rs)
        assert set(starts) == {0, *ends[:-1]}


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR semantics: documents lexically similar to the target sample
    must carry higher importance weights than junk the target never
    uses.  Also: weights are partitioning-independent (decimal fold)."""
    from scones.textops import dsir_weights

    tech = [(i, "spark shuffle partition join broadcast agg " * 4) for i in range(10)]
    junk = [(100 + i, "zzz qqq www eee rrr ttt " * 4) for i in range(10)]
    df = _docs(spark, tech + junk)
    target = _docs(spark, tech[:5])
    got = {r.doc_id: r.weight for r in dsir_weights(df, target).collect()}
    tech_w = sum(got[i] for i, _ in tech) / len(tech)
    junk_w = sum(got[i] for i, _ in junk) / len(junk)
    assert tech_w > junk_w
    again = {
        r.doc_id: r.weight
        for r in dsir_weights(df.repartition(7), target).collect()
    }
    assert got == again


def test_c4_line_filter_rules(spark):
    """Each C4 rule on a hand-written page: terminal punctuation, the
    3-word minimum, the javascript line drop, and every page-level drop
    (lorem ipsum / curly brace / sentence minimum)."""
    from scones.textops import c4_line_filter

    good = "This line is properly terminated. Yes it is. Fine. Ok. Sure."
    page = "\n".join(
        [
            good,
            "no terminal punctuation here",   # dropped: no [.!?"]
            "Too short.",                     # dropped: < 3 words
            "Please enable JavaScript now.",  # dropped: javascript
            'She replied "done".',            # kept: quote terminal
        ]
    )
    rows = [
        (1, page),
        (2, "lorem ipsum filler. " + good),   # page dropped: lorem ipsum
        (3, "code { x } here. " + good),      # page dropped: curly brace
        (4, "One sentence only here."),       # page dropped: < 5 sentences
    ]
    out = {
        r.doc_id: r
        for r in c4_line_filter(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    r1 = out[1]
    assert r1.clean_text == good + "\n" + 'She replied "done".'
    assert r1.n_lines_kept == 2 and r1.n_lines_dropped == 3
    assert r1.doc_kept
    assert not out[2].doc_kept and not out[3].doc_kept and not out[4].doc_kept


def test_c4_line_filter_zero_exchange_plan(spark):
    """The operator is one row-local projection — scan-shaped at 100 TB;
    any Exchange in the plan is a regression."""
    from scones.textops import c4_line_filter

    df = spark.createDataFrame([(1, "A line here.")], ["doc_id", "text"])
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_lines_within_doc_rules(spark):
    """First occurrence wins; whitespace-normalized repeats and blank
    lines drop; order is preserved."""
    from scones.textops import dedup_lines_within_doc

    page = "\n".join(
        [
            "Home | About",
            "real text one.",
            "Home  |  About",   # same normalized form -> dropped
            "",                 # blank -> dropped
            "real text two.",
            "real text one.",   # exact repeat -> dropped
        ]
    )
    r = dedup_lines_within_doc(
        spark.createDataFrame([(1, page)], ["doc_id", "text"])
    ).collect()[0]
    assert r.clean_text == "Home | About\nreal text one.\nreal text two."
    assert r.n_lines_kept == 3 and r.n_lines_dropped == 3


def test_dedup_lines_within_doc_zero_exchange_plan(spark):
    from scones.textops import dedup_lines_within_doc

    df = spark.createDataFrame([(1, "a.\nb.")], ["doc_id", "text"])
    plan = (
        dedup_lines_within_doc(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_length_histogram_buckets(spark):
    from scones.textops import length_histogram

    rows = [(1, ""), (2, "a"), (3, "a b c"), (4, " ".join(["t"] * 17))]
    got = {
        r.bucket_lo: (r.n_docs, r.total_tokens)
        for r in length_histogram(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert got == {0: (1, 0), 1: (1, 1), 2: (1, 3), 16: (1, 17)}


def test_quality_classifier_exact_and_deterministic(spark):
    """Integer scores match a hand-computed feature walk and are
    partition-count-invariant (retry/layout stability)."""
    from scones.textops import classifier_model, md5_hash16, quality_classifier

    model = classifier_model(spark, 64)
    w = {r.bucket: r.w_x1000 for r in model.collect()}
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta")], ["doc_id", "text"]
    )
    feats1 = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    b = {
        r.f: r.b
        for r in spark.createDataFrame(
            [(f,) for f in feats1 + ["beta"]], ["f"]
        )
        .select("f", (md5_hash16(F.col("f")) % 64).cast("int").alias("b"))
        .collect()
    }
    got = {
        r.doc_id: (r.n_feats, r.sum_w_x1000, r.label_keep)
        for r in quality_classifier(docs, model, 64).collect()
    }
    exp1 = sum(w[b[f]] for f in feats1)
    assert got[1] == (5, exp1, exp1 > 0)
    assert got[2] == (1, w[b["beta"]], w[b["beta"]] > 0)
    again = {
        r.doc_id: (r.n_feats, r.sum_w_x1000, r.label_keep)
        for r in quality_classifier(docs.repartition(7), model, 64).collect()
    }
    assert got == again


def test_quality_classifier_plan_broadcasts_model(spark):
    """The model join must be broadcast-hash (dim-table pattern) with a
    map-side partial aggregate; no sort-merge join, no cartesian."""
    from scones.textops import classifier_model, quality_classifier

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        quality_classifier(docs, classifier_model(spark, 4096), 4096)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial" in plan


def test_contamination_fraction_values(spark):
    """Hand-checked fractions; shingle-less docs get 0.0; the boolean
    decontaminate flag must equal (fraction > 0)."""
    from scones.textops import contamination_fraction, decontaminate

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # shingles: abcde, bcdef
            (2, "a b c d e x y"),    # abcde hit, bcdex/cdexy miss
            (3, "p q r s t"),        # no overlap
            (4, "too short"),        # < 5 tokens -> 0 shingles
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, "z a b c d e z")], ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_shingles, r.n_hits, r.contamination)
        for r in contamination_fraction(docs, bench, k=5).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
    flags = {
        r.doc_id: r.is_contaminated
        for r in decontaminate(docs, bench, k=5).collect()
    }
    assert flags == {d: got[d][2] > 0 for d in got}


def test_contamination_fraction_plan_broadcasts_eval_side(spark):
    from scones.textops import contamination_fraction

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = docs.limit(5).select("doc_id", "text")
    plan = (
        contamination_fraction(docs, bench, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantile_buckets_ccnet_split(spark):
    """Deterministic per-group terciles: 6 rows per group -> 2/2/2;
    head = lowest score; ties broken by id (retry-stable)."""
    from scones.textops import quantile_buckets

    rows = [(i, "en", float(i)) for i in range(6)] + [
        (10, "zh", 5.0),
        (11, "zh", 5.0),   # tie with 10 -> id order decides
        (12, "zh", 1.0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    got = {
        r.doc_id: (r.bucket, r.label)
        for r in quantile_buckets(df, "score", group_col="lang").collect()
    }
    assert [got[i][1] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    assert got[12] == (1, "head")
    assert got[10] == (2, "middle") and got[11] == (3, "tail")
    again = {
        r.doc_id: (r.bucket, r.label)
        for r in quantile_buckets(
            df.repartition(7), "score", group_col="lang"
        ).collect()
    }
    assert got == again


def test_histogram_buckets_equals_ntile_exactly(spark):
    """The histogram-threshold production path must reproduce the NTILE
    window output EXACTLY — including tie classes that straddle bucket
    boundaries (the one case thresholds alone cannot decide) and groups
    smaller than the bucket count."""
    import random

    from scones.textops import histogram_buckets, quantile_buckets

    rng = random.Random(7)
    rows = []
    for g, sz in [("en", 101), ("fr", 7), ("de", 2), ("zz", 1), ("tt", 30)]:
        for i in range(sz):
            # coarse score domain -> large tie classes guaranteed to
            # straddle tercile/quartile boundaries
            score = rng.choice([0.0, 1.5, 1.5, 2.25, 3.0, 3.0, 3.0])
            rows.append((f"{g}-{i:04d}", g, float(score)))
    df = spark.createDataFrame(rows, "doc_id string, lang string, score double")
    for nb in (3, 4, 7):
        a = {
            tuple(r)
            for r in quantile_buckets(
                df, "score", group_col="lang", n_buckets=nb
            ).collect()
        }
        b = {
            tuple(r)
            for r in histogram_buckets(
                df, "score", group_col="lang", n_buckets=nb
            ).collect()
        }
        assert a == b, f"n_buckets={nb}"
    # retry-stability under a different physical partitioning
    again = {
        tuple(r)
        for r in histogram_buckets(
            df.repartition(13), "score", group_col="lang"
        ).collect()
    }
    assert again == {
        tuple(r)
        for r in histogram_buckets(df, "score", group_col="lang").collect()
    }


def test_lm_model_seam_save_load_and_unseen_scoring(spark, tmp_path):
    """The external-model seam: (a) a persisted model reloads and
    scores identically to the in-memory one; (b) docs made ENTIRELY of
    tokens unseen by the reference still score through add-one
    smoothing (P = 1/V per bigram), never drop out."""
    from scones.textops import lm_perplexity, load_lm, save_lm, train_lm

    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq zz qq")], ["doc_id", "text"]
    )
    model = train_lm(ref)
    assert model.vocab_size == 7  # the,cat,sat,on,mat,dog,rug
    got = {r.doc_id: r for r in lm_perplexity(docs, model=model).collect()}
    # doc 11: every bigram unseen, every unigram unseen ->
    # nll = -log2(1 / V) = log2(7) bits for each of its 3 bigrams
    assert got[11].n_bigrams == 3
    assert abs(got[11].bits_per_bigram - 2.8074) < 1e-9
    # doc 10 scores strictly better (its bigrams exist in the reference)
    assert got[10].bits_per_bigram < got[11].bits_per_bigram

    path = str(tmp_path / "lm")
    save_lm(model, path)
    reloaded = load_lm(spark, path)
    assert reloaded.vocab_size == model.vocab_size
    again = {r.doc_id: r for r in lm_perplexity(docs, model=reloaded).collect()}
    assert {k: (v.n_bigrams, v.bits_per_bigram) for k, v in got.items()} == {
        k: (v.n_bigrams, v.bits_per_bigram) for k, v in again.items()
    }


def test_substring_dup_stats_keep_first_semantics(spark):
    """A verbatim 5-gram shared across docs: the canonical (first by
    (doc_id, pos)) occurrence is NOT counted as duplicate; later ones
    are; short docs (< k tokens) report zero windows; a doc that is
    wholly boilerplate trips the dup_heavy gate."""
    from scones.textops import substring_dup_stats

    span = "alpha beta gamma delta epsilon"
    rows = [
        (1, span + " unique tail one"),      # canonical owner (pos 1)
        (2, "prefix two " + span),           # dup occurrence
        (3, span),                           # wholly duplicated -> heavy
        (4, "too short"),                    # < k tokens
        (5, "totally different words here live now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in substring_dup_stats(df, k=5).collect()}
    assert got[1].n_windows == 4 and got[1].n_dup_windows == 0
    assert got[2].n_windows == 3 and got[2].n_dup_windows == 1
    assert got[3].n_windows == 1 and got[3].n_dup_windows == 1
    assert got[3].dup_frac == 1.0 and got[3].dup_heavy
    assert got[4].n_windows == 0 and got[4].dup_frac == 0.0
    assert got[5].n_dup_windows == 0 and not got[5].dup_heavy


def test_simhash_near_dup_production_shape(spark):
    """64-bit xxhash fingerprints, 4 x 16-bit blocks, hamming <= 3:
    identical docs pair at distance 0; unrelated docs don't pair; a
    one-word edit of a long doc stays within the Hamming radius; the
    pigeonhole precondition is enforced; the bucket cap drops
    degenerate buckets."""
    import pytest as _pytest

    from scones.textops import simhash_near_dup_pairs

    # 51 DISTINCT tokens (odd -> per-bit vote sums are never zero),
    # each repeated 20x (every |sum| >= 20): editing ONE occurrence
    # perturbs any bit sum by at most 2, so it provably flips nothing —
    # the edited doc sits at hamming distance EXACTLY 0 (deterministic,
    # unlike a one-word edit over independent tokens, which flips every
    # zero-sum bit).
    base = " ".join(f"tok{i}" for i in range(51) for _ in range(20))
    rows = [
        (1, base),
        (2, base),                                    # identical
        (3, base.replace("tok7 ", "edited ", 1)),     # one-occurrence edit
        (4, " ".join(f"zz{i}" for i in range(200))),  # unrelated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup_pairs(df).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert all(4 not in p for p in pairs)
    assert pairs.get((1, 3)) == 0 and pairs.get((2, 3)) == 0

    with _pytest.raises(ValueError):
        simhash_near_dup_pairs(df, n_bands=4, hamming_max=4)

    # cap: identical docs all land in the same buckets; max_bucket=1
    # drops those buckets entirely -> no pairs survive
    capped = simhash_near_dup_pairs(df, max_bucket=1).collect()
    assert capped == []


def test_unimax_budget_greedy_allocation(spark):
    """UniMax semantics: languages are visited smallest-first; the epoch
    cap binds small languages and their unused share flows to larger
    ones; no language exceeds max_epochs; a capped-rich world degrades
    to equal shares."""
    from scones.textops import unimax_budget

    def mk(lang, n_docs, toks_per_doc):
        return [
            (f"{lang}-{i}", lang, " ".join(["t"] * toks_per_doc))
            for i in range(n_docs)
        ]

    rows = mk("aa", 2, 50) + mk("bb", 10, 50) + mk("cc", 100, 50)
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    # totals: aa=100, bb=500, cc=5000; budget 3000, cap 2 epochs
    got = {r.lang: r for r in unimax_budget(df, 3000, max_epochs=2).collect()}
    # aa: share 1000 vs cap 200 -> 200 (cap binds), epochs exactly 2.0
    assert got["aa"].quota_tokens == 200 and got["aa"].epochs == 2.0
    # bb: remaining 2800, share 1400 vs cap 1000 -> 1000
    assert got["bb"].quota_tokens == 1000 and got["bb"].epochs == 2.0
    # cc: remaining 1800 vs cap 10000 -> 1800 (budget binds)
    assert got["cc"].quota_tokens == 1800
    assert got["cc"].epochs == round(1800 / 5000, 4)
    assert sum(r.quota_tokens for r in got.values()) == 3000
    # budget so large every lang caps: no lang exceeds max_epochs
    rich = {
        r.lang: r for r in unimax_budget(df, 10**9, max_epochs=2).collect()
    }
    assert all(r.epochs == 2.0 for r in rich.values())


def test_curation_gate_each_rule_fires(spark):
    """Hand-built docs tripping each rule exactly; a clean doc passes
    with an empty reasons string."""
    from scones.textops import curation_gate

    clean = (
        "the quick brown fox jumps over the lazy dog and then it "
        "runs far away to the old mill pond for a very long rest "
        "with many good friends beside the calm clear water today"
    )
    rows = [
        (1, clean),
        (2, "the of and " + " ".join(f"w{i}" for i in range(5))),  # short
        (3, "the of " + "spark " * 40),                 # top_token cap
        (4, ("the of " + "ab cd " * 20).strip()),       # top_bigram cap
        (5, "the of lorem ipsum dolor " + clean),       # lorem page drop
        (6, "the of {body} " + clean),                  # curly brace
        (7, "the of !!!.,;:!!!.,;:" * 10 + " " + clean),  # punct heavy
        (8, "x y " + " ".join("z" * 30 for _ in range(40))),  # mean len + stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in curation_gate(df).collect()}
    assert got[1].keep and got[1].reasons == ""
    assert "too_short" in got[2].reasons
    assert "top_token" in got[3].reasons
    assert "top_bigram" in got[4].reasons
    assert "lorem_ipsum" in got[5].reasons and not got[5].keep
    assert "curly_brace" in got[6].reasons
    assert "punct_heavy" in got[7].reasons
    assert "mean_tok_len" in got[8].reasons
    assert "few_stopwords" in got[8].reasons


def test_substring_dedup_clean_excises_noncanonical_spans(spark):
    """The canonical first occurrence of a duplicated 5-gram survives;
    later occurrences lose exactly the covered tokens; untouched text
    passes through verbatim."""
    from scones.textops import substring_dedup_clean

    span = "alpha beta gamma delta epsilon"
    rows = [
        (1, span + " unique tail one"),   # canonical -> intact
        (2, "prefix two " + span),        # loses the 5 covered tokens
        (3, "nothing shared over here"),  # verbatim
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in substring_dedup_clean(df, k=5).collect()}
    assert got[1].clean_text == span + " unique tail one"
    assert got[1].n_tokens_removed == 0
    assert got[2].clean_text == "prefix two"
    assert got[2].n_tokens_removed == 5
    assert got[3].clean_text == "nothing shared over here"
    # overlapping dup windows within one doc: doc 4 repeats the span
    # twice back-to-back; the whole doc is one later-than-canonical
    # repetition, so everything it shares gets excised
    df2 = spark.createDataFrame(rows + [(4, span + " " + span)], ["doc_id", "text"])
    got2 = {r.doc_id: r for r in substring_dedup_clean(df2, k=5).collect()}
    assert got2[4].clean_text == "" and got2[4].n_tokens_removed == 10


def test_sessionize_events_gap_semantics(spark):
    """Hand-built timeline: events 10 min apart share a session; a
    31-min pause opens a new one; ties on ts break by event_id;
    duration is an exact integer microsecond span."""
    import datetime as dt

    from scones.events import sessionize_events

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid)

    rows = [
        ev(1, 7, 0), ev(2, 7, 10), ev(3, 7, 20),   # session 1
        ev(4, 7, 51),                               # 31-min gap -> session 2
        ev(5, 7, 52),
        ev(6, 9, 0),                                # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint"
    )
    got = {
        (r.user_id, r.session_idx): r
        for r in sessionize_events(df, gap_minutes=30).collect()
    }
    assert got[(7, 1)].n_events == 3
    assert got[(7, 2)].n_events == 2
    assert got[(9, 1)].n_events == 1
    assert got[(7, 1)].duration_us == 20 * 60 * 1_000_000
    assert got[(7, 2)].duration_us == 1 * 60 * 1_000_000
    # 30-min gap exactly is NOT a break (strict >)
    df2 = spark.createDataFrame(
        [ev(1, 7, 0), ev(2, 7, 30)],
        "event_id bigint, ts timestamp_ntz, user_id bigint",
    )
    one = sessionize_events(df2, gap_minutes=30).collect()
    assert len(one) == 1 and one[0].n_events == 2


def test_asof_join_semantics_and_payload(spark):
    """As-of picks the greatest right ts <= left ts per key (equality
    included); keys with no prior right row get NULL; payload columns
    ride along; ties on right ts resolve by the tiebreak (latest wins)."""
    import datetime as dt

    from scones.events import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m, 0)
    left = spark.createDataFrame(
        [(1, 7, t(10)), (2, 7, t(20)), (3, 9, t(5))],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(7, t(10), "a", 1), (7, t(10), "b", 2), (7, t(15), "c", 3)],
        "user_id bigint, ts timestamp_ntz, tag string, rid bigint",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, payload_cols=["tag"], right_tiebreak="rid"
        ).collect()
    }
    assert out[1].asof_ts == t(10) and out[1].asof_tag == "b"  # equality + tiebreak
    assert out[2].asof_ts == t(15) and out[2].asof_tag == "c"
    assert out[3].asof_ts is None and out[3].asof_tag is None


def test_range_join_bands_overlap_and_edges(spark):
    """Overlapping bands each claim containing values (true interval
    join, not a CASE ladder); [lo, hi) edges are exact; values outside
    every band drop out."""
    from scones.events import range_join_bands

    df = spark.createDataFrame(
        [(1, 4.0), (2, 5.0), (3, 11.0), (4, 250.0), (5, 3.0)],
        "event_id bigint, value double",
    )
    bands = [("low", 0.0, 5.0), ("mid", 3.0, 12.0), ("high", 10.0, 100.0)]
    got = {}
    for r in range_join_bands(df, bands, bucket_width=5.0).collect():
        got.setdefault(r.event_id, set()).add(r.band)
    assert got[1] == {"low", "mid"}     # overlap: both claim 4.0
    assert got[2] == {"mid"}            # 5.0 excluded from [0,5)
    assert got[3] == {"mid", "high"}
    assert 4 not in got                 # outside every band
    assert got[5] == {"low", "mid"}     # lo edge inclusive


def test_script_profile_mixed_script_doc(spark):
    """Hand-built mixed-script text: each class counts its own chars;
    fractions are exact divisions; empty text is all zeros."""
    from scones.textops import script_profile

    df = spark.createDataFrame(
        [(1, "abc 123 你好 привет"), (2, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in script_profile(df).collect()}
    r = got[1]
    assert r.n_latin == 3 and r.n_digit == 3
    assert r.n_han == 2 and r.n_cyrillic == 6
    assert r.n_chars == len("abc 123 你好 привет")
    assert r.frac_han == round(2 / r.n_chars, 6)
    assert got[2].n_chars == 0 and got[2].frac_latin == 0.0


def test_props_field_stats_malformed_json_degrades_to_null(spark):
    """Malformed JSON and missing fields become NULLs that are COUNTED
    (n_events vs n_with_field), never pipeline crashes; sums are exact
    integers."""
    from scones.events import props_field_stats

    df = spark.createDataFrame(
        [
            ("click", '{"k": 10}'),
            ("click", '{"k": 32}'),
            ("click", "not json at all"),
            ("view", '{"other": 1}'),
        ],
        ["event_type", "props"],
    )
    got = {r.event_type: r for r in props_field_stats(df).collect()}
    assert got["click"].n_events == 3 and got["click"].n_with_field == 2
    assert got["click"].sum_field == 42
    assert got["view"].n_with_field == 0 and got["view"].sum_field is None


def test_asof_join_matches_bruteforce_on_random_timelines(spark):
    """Randomized equivalence: many random (key, ts) timelines —
    duplicate timestamps, keys with no right rows, right-only keys —
    all folded into ONE Spark run (instance-namespaced keys) and
    compared against the O(|L|x|R|) brute-force definition of as-of:
    max right ts <= left ts per key."""
    import datetime as dt
    import random

    from scones.events import asof_join

    rng = random.Random(20260817)
    t0 = dt.datetime(2024, 1, 1)
    lrows, rrows, expect = [], [], {}
    eid = 0
    for inst in range(12):
        keys = [f"i{inst}-k{j}" for j in range(rng.randint(1, 4))]
        right = [
            (k, rng.randint(0, 50))
            for k in keys
            for _ in range(rng.randint(0, 5))
        ]
        for k, m in right:
            rrows.append((k, t0 + dt.timedelta(minutes=m)))
        for k in keys:
            for _ in range(rng.randint(0, 6)):
                m = rng.randint(0, 50)
                eid += 1
                lrows.append((eid, k, t0 + dt.timedelta(minutes=m)))
                prior = [rm for rk, rm in right if rk == k and rm <= m]
                expect[eid] = (
                    t0 + dt.timedelta(minutes=max(prior)) if prior else None
                )
    left = spark.createDataFrame(
        lrows, "event_id bigint, user_id string, ts timestamp_ntz"
    )
    right_df = spark.createDataFrame(
        rrows, "user_id string, ts timestamp_ntz"
    ).distinct()
    got = {
        r.event_id: r.asof_ts for r in asof_join(left, right_df).collect()
    }
    assert got == expect
