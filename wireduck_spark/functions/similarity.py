"""Similarity search over the `embeddings` table (array<float> column):
brute-force cosine top-k as the exact baseline, and a bucketed (IVF-style)
variant as the scale path.

The cosine expression is the same deterministic left-fold used in
functions/dedup.py (zip -> double products -> sequential sum), identical in
Spark (`aggregate`/`zip_with`) and DuckDB (`list_reduce`/`list_transform`),
so similarity values hash-match bit-for-bit before the defensive rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.registry import query, table

N_QUERY_VECS = 5  # vec_id < 5 act as the query set
TOP_K = 3


def cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine similarity between two array<float> columns."""

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# DuckDB twin of cosine() for oracle strings ({a}, {b} are list expressions).
_DUCK_DOT = """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(range(1, len({a}) + 1),
        i -> CAST({a}[CAST(i AS INTEGER)] AS DOUBLE)
           * CAST({b}[CAST(i AS INTEGER)] AS DOUBLE))),
    (x, y) -> x + y)"""


def duck_cosine(a: str, b: str) -> str:
    return (
        f"({_DUCK_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DUCK_DOT.format(a=a, b=a)}) * "
        f"sqrt({_DUCK_DOT.format(a=b, b=b)})))"
    )


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({duck_cosine("q.embedding", "c.embedding")}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERY_VECS}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    tags=("similarity",),
    bench=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Exact k-NN baseline: brute-force cosine of each query vector against
    every candidate, window top-k.

    Scale: the query set is broadcast (it is small by construction), so the
    candidate table streams through map-side with no shuffle; the only
    exchange is the per-query top-k (TakeOrdered-style, k rows per query
    per partition). This is the exact-recall baseline the ANN variant is
    measured against.
    """
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    sims = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


@query(
    "sim_ann_ivf_bucketed",
    oracle=f"""
    WITH probes AS (
        SELECT q.vec_id AS query_id, q.label AS probe_label, q.embedding AS q_emb
        FROM embeddings q WHERE q.vec_id < {N_QUERY_VECS}
    ),
    sims AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROUND({duck_cosine("p.q_emb", "c.embedding")}, 6) AS cos_sim
        FROM probes p JOIN embeddings c
          ON c.label = p.probe_label AND c.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    tags=("similarity",),
)
def sim_ann_ivf_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style approximate k-NN: probe only the query's own cell.

    `label` stands in for a precomputed coarse-quantizer assignment (an IVF
    list id): at 100 TB the candidate table is hash-partitioned by cell, the
    (tiny) probe set is broadcast, and each task scans only its cell's
    fraction of the corpus — the same plan shape IVF gives you in a vector
    DB. Recall vs. the exact baseline is measured in tests.
    """
    emb = table(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("q_emb"),
    )
    sims = (
        F.broadcast(probes)
        .join(
            emb,
            (emb.label == F.col("probe_label")) & (emb.vec_id != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


# -- random-hyperplane LSH (sign-bit buckets) ------------------------------
# Hyperplane components are +/-1.0 derived from the portable md5 hash at
# import time, so BOTH engines get the same literal arrays embedded in
# their expressions — bucket assignment is bit-identical by construction
# (+/-1.0 products are exact in IEEE754; the fold order matches the
# cosine() helpers above).
N_HYPERPLANES = 6  # 2^6 = 64 buckets over the 64-dim embeddings


def _hyperplane(h: int) -> list[float]:
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"hp_{h}_{i}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1.0
        for i in range(64)
    ]


HYPERPLANES = [_hyperplane(h) for h in range(N_HYPERPLANES)]


def _spark_bucket(col: str) -> str:
    bits = []
    for h, hp in enumerate(HYPERPLANES):
        arr = "array(" + ",".join(f"{c:.1f}D" for c in hp) + ")"
        dot = (
            f"aggregate(zip_with({col}, {arr},"
            " (p, q) -> CAST(p AS DOUBLE) * q),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0.0D THEN {1 << h} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _duck_bucket(col: str) -> str:
    bits = []
    for h, hp in enumerate(HYPERPLANES):
        arr = "[" + ",".join(f"{c:.1f}" for c in hp) + "]"
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list_transform(range(1, len({col}) + 1),"
            f" i -> CAST({col}[CAST(i AS INTEGER)] AS DOUBLE)"
            f" * ({arr})[CAST(i AS INTEGER)])), (x, y) -> x + y)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0.0 THEN {1 << h} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


@query(
    "sim_ann_hyperplane_lsh",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {_duck_bucket("embedding")} AS bucket
        FROM embeddings
    ),
    sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
               ROUND({duck_cosine("q.embedding", "c.embedding")}, 6) AS cos_sim
        FROM bucketed q
        JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERY_VECS}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, bucket, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM sims
    )
    SELECT query_id, neighbor_id, CAST(bucket AS BIGINT) AS bucket,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "ann"),
)
def sim_ann_hyperplane_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 6 sign bits -> 64 buckets; exact
    cosine only within the query's bucket; top-k per query.

    Scale (vs the brute-force baseline): bucket assignment is one map-side
    pass (no model training, unlike IVF's quantizer); candidate
    generation is an equi-join on the bucket id, so the shuffle moves
    O(n) rows and the exact cosine runs on ~n/64 candidates per query —
    the same recall/cost dial every vector store exposes (more
    hyperplanes = smaller buckets = cheaper + lower recall; multiple
    hash tables recover recall).
    """
    emb = table(spark, sf, "embeddings").withColumn(
        "bucket", F.expr(_spark_bucket("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    sims = (
        F.broadcast(q)
        .join(
            c,
            (F.col("bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket").cast("bigint").alias("bucket"),
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )
