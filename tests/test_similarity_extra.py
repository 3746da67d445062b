"""ANN variants: multi-probe supersedes single-bucket; recall vs brute."""

from scones.similarity import ann_hyperplane_topk, cosine_topk


def test_multi_probe_is_superset_search(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # k beyond any pool size → no truncation: the candidate POOLS compare
    big = 10**6
    single = {r.vec_id for r in ann_hyperplane_topk(df, 0, k=big).collect()}
    multi = {
        r.vec_id
        for r in ann_hyperplane_topk(df, 0, k=big, probe_hamming=1).collect()
    }
    assert single <= multi
    assert len(multi) >= len(single)


def test_multi_probe_improves_recall_vs_bruteforce(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    truth = {r.vec_id for r in cosine_topk(df, 0, k=10).collect()}
    single = {r.vec_id for r in ann_hyperplane_topk(df, 0, k=10).collect()}
    multi = {
        r.vec_id
        for r in ann_hyperplane_topk(df, 0, k=10, probe_hamming=1).collect()
    }
    assert len(multi & truth) >= len(single & truth)
