"""Embedding similarity search over ``embeddings(vec_id, embedding, label)``.

Brute-force cosine top-k is the correctness baseline (JVM-side
``zip_with``/``aggregate`` arithmetic — no Python in the loop); the
sign-LSH bucketed variant is the scale path: candidates only meet inside
an LSH bucket, so the pairwise stage is O(sum of bucket²) not O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two array<float> columns in double precision.

    Sequential left-fold — same summation order as the DuckDB oracle's
    list_dot_product over DOUBLE[], so results agree to float ulp.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force top-k cosine neighbors of one stored vector.

    The query row is a 1-row broadcast cross join (no shuffle of the big
    side); at 100 TB this is one scan + a driver-side top-k (takeOrdered
    semantics via ORDER BY ... LIMIT, which Spark executes as per-partition
    top-k + merge, never a full sort).
    """
    q = (
        df.where(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("q_emb"))
    )
    return (
        df.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "q_emb"), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def sign_lsh_bucket(col: str | Column, n_bits: int = 4) -> Column:
    """Axis-aligned sign-LSH bucket: bit i = (embedding[i] > 0).

    Deterministic, SQL-expressible in any engine (the oracle mirrors it),
    and a legitimate random-hyperplane LSH when the embedding basis is
    rotation-invariant.  For production, replace the axes with seeded
    random hyperplanes materialized as a broadcast matrix — same plan.
    """
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(col, i + 1).cast("double") > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 10, n_bits: int = 4
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket."""
    withb = df.withColumn("bucket", sign_lsh_bucket("embedding", n_bits))
    q = (
        withb.where(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("q_emb"), F.col("bucket"))
    )
    return (
        withb.join(F.broadcast(q), on="bucket")
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "q_emb"), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def hyperplane_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes (seeded, library-free).

    Rademacher entries are a valid random-projection family; being exact
    small literals they replay bit-identically in any engine's SQL.
    """
    import random

    rng = random.Random(seed)
    return [
        [float(rng.choice((-1.0, 1.0))) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def hyperplane_bucket(col: str | Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection LSH bucket id for a seeded plane set.

    Each plane is a literal array → the dot product folds JVM-side; the
    whole expression is codegen, no Python, no shuffle.
    """
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        proj = dot(col, lit_plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_hyperplane_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k via seeded random-hyperplane LSH: search only
    the query's bucket (2^n_planes buckets; recall tunes via n_planes
    and ``probe_hamming`` multi-probe)."""
    planes = hyperplane_planes(dim, n_planes, seed)
    withb = df.withColumn("bucket", hyperplane_bucket("embedding", planes))
    q = withb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket")
    )
    if probe_hamming > 0:
        # multi-probe: also search buckets within Hamming distance 1 of
        # the query's bucket (each flipped bit = a borderline plane) —
        # the standard recall knob without growing the index
        flips = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
        q = q.select(
            "q_emb", F.explode(F.array(*flips)).alias("bucket")
        )
    return (
        withb.join(F.broadcast(q), on="bucket")
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "q_emb"), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, n_bits: int = 4
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-bucketed.

    Pairs are only compared within a bucket — the embedding-space
    analogue of minhash-LSH dedup.  Recall is tunable via n_bits /
    multi-probe; exactness within the bucket is exact cosine.
    """
    withb = df.withColumn("bucket", sign_lsh_bucket("embedding", n_bits))
    a = withb.alias("a")
    b = withb.alias("b")
    return (
        a.join(b, on="bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= threshold)
    )
