"""Similarity search over embedding columns (training-data pipeline op).

Brute-force cosine top-k as the correctness baseline, plus a sign-LSH
(random-hyperplane, Charikar 2002) bucketed variant as the scale path: at
100 TB the brute-force cross join is quadratic, while LSH buckets the
vectors so only same-bucket candidates are scored (recall measured against
brute force in tests/test_similarity.py).

All arithmetic stays JVM-side: dot products via ``aggregate(zip_with(...))``
higher-order functions — no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query side against
    the vector table; window top-k with (−cos, id) tie order."""
    joined = vectors.crossJoin(F.broadcast(queries)).withColumn(
        "cos", cosine(F.col(vec_col), F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cos")
    )


def _sign_bits(vec_col: Column, hyperplanes: list[list[float]]) -> Column:
    """Bucket signature: sign bit of the dot product with each hyperplane."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(x) for x in h])) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for h in hyperplanes
    ]
    return F.concat(*bits)


def make_hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG, no numpy RNG
    state dependence)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(state / float(1 << 31) - 0.5)
        planes.append(row)
    return planes


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's LSH bucket.

    Equi join on the bucket signature replaces the cross join — the shuffle
    key is the bucket, so cost scales with bucket occupancy, not n×q.
    """
    planes = make_hyperplanes(dim, n_planes)
    v = vectors.withColumn("bucket", _sign_bits(F.col(vec_col), planes))
    q = queries.withColumn("bucket", _sign_bits(F.col(qvec_col), planes))
    joined = v.join(F.broadcast(q), "bucket").withColumn(
        "cos", cosine(F.col(vec_col), F.col(qvec_col))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cos")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed self-join.

    Multi-table sign-LSH: each of ``n_tables`` tables hashes with its own
    ``n_planes`` hyperplanes; candidates are pairs colliding in ANY table.
    A pair at angle θ collides per table with p = (1 − θ/π)^n_planes, so
    recall = 1 − (1 − p)^n_tables — planes-per-table controls bucket size
    (each plane halves expected occupancy: candidates ~ n²/2^n_planes per
    table, the quadratic-blowup knob), tables control recall.  The 100 TB
    setting is MORE planes (16-24, so buckets stay person-sized) and
    enough tables to hold recall (8-16); the default 6×1 is sized for the
    fixture corpus.  Shuffle volume grows linearly with n_tables (explode),
    in-bucket comparisons shrink exponentially with n_planes.
    """
    v = vectors
    for t in range(n_tables):
        planes = make_hyperplanes(dim, n_planes, seed=seed + 101 * t)
        v = v.withColumn(f"_b{t}", _sign_bits(F.col(vec_col), planes))
    banded = v.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), F.col(f"_b{t}").alias("bucket")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(
        id_col, vec_col, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "tbl", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "tbl", "bucket"
    )
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()  # dedup multi-table collisions BEFORE the dot products
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
