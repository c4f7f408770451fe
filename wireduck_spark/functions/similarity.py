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


def similarity_surface(emb: DataFrame) -> DataFrame:
    """NULL and zero-norm embeddings are EXCLUDED from the similarity
    surface (r13 adversarial probe): cosine is undefined for them
    (0/0), and under Spark's ANSI mode the zero-norm division is a
    job-killing DIVIDE_BY_ZERO — one all-zero vector in a 100-TB
    corpus must not abort the scan. The oracle twin is
    DUCK_EMB_SURFACE; the rule is the embeddings analogue of the
    dedup token-less-document exclusion."""
    return emb.filter(
        F.col("embedding").isNotNull()
        & F.exists("embedding", lambda v: v != F.lit(0.0))
    )


# DuckDB twin of similarity_surface, used as a CTE body named `emb`.
DUCK_EMB_SURFACE = """emb AS (
        SELECT * FROM embeddings
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x <> 0)) > 0
    )"""


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH {DUCK_EMB_SURFACE},
    sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({duck_cosine("q.embedding", "c.embedding")}, 6) AS cos_sim
        FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
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
    emb = similarity_surface(table(spark, sf, "embeddings", spread=True))
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
    WITH {DUCK_EMB_SURFACE},
    probes AS (
        SELECT q.vec_id AS query_id, q.label AS probe_label, q.embedding AS q_emb
        FROM emb q WHERE q.vec_id < {N_QUERY_VECS}
    ),
    sims AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROUND({duck_cosine("p.q_emb", "c.embedding")}, 6) AS cos_sim
        FROM probes p JOIN emb c
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
    emb = similarity_surface(table(spark, sf, "embeddings", spread=True))
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


# -- random-hyperplane LSH (multi-table sign-bit buckets) ------------------
# Hyperplane components are +/-1.0 derived from the portable md5 hash at
# import time, so BOTH engines get the same literal arrays embedded in
# their expressions — bucket assignment is bit-identical by construction
# (+/-1.0 products are exact in IEEE754; the fold order matches the
# cosine() helpers above).
#
# Multi-table layout (the production LSH shape): L independent hash tables
# of B bits each. A candidate pair collides if it shares a bucket in ANY
# table — recall ~ 1 - (1 - p^B)^L per neighbor, the dial every vector
# store exposes. On these near-random synthetic embeddings 8x4 measures
# recall@3 ~ 0.7 vs brute force (tests/test_similarity_quality.py).
N_LSH_TABLES = 8
N_LSH_BITS = 4


def _hyperplane(h: int) -> list[float]:
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"hp_{h}_{i}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1.0
        for i in range(64)
    ]


HYPERPLANES = [_hyperplane(h) for h in range(N_LSH_TABLES * N_LSH_BITS)]


def _spark_table_buckets(col: str, n_tables: int = N_LSH_TABLES,
                         n_bits: int = N_LSH_BITS) -> str:
    """All L table buckets in ONE nested-lambda expression over a single
    hyperplane-matrix literal. Unrolling 32 separate dot-product
    expressions (x2 for the q/c branches) ballooned whole-stage codegen to
    ~20 s of compile time; one matrix literal referenced once inside one
    lambda tree compiles in normal time and loops at runtime instead.

    (n_tables, n_bits) is the recall/cost dial; n_bits is also the SCALE
    dial for radius search — buckets must shrink as the corpus grows
    (n_bits ~ log2(n)) to keep per-bucket occupancy, and therefore the
    candidate-pair count, linear in n."""
    mat = "array(" + ",".join(
        "array(" + ",".join(f"{c:.1f}D" for c in _hyperplane(h)) + ")"
        for h in range(n_tables * n_bits)
    ) + ")"
    weights = "array(" + ",".join(
        str(1 << b) for b in range(n_bits)
    ) + ")"
    return (
        f"transform(sequence(0, {n_tables - 1}), t ->"
        f" CAST(aggregate("
        f"  zip_with(slice({mat}, t * {n_bits} + 1, {n_bits}),"
        f"   {weights}, (hp, w) ->"
        f"   w * (CASE WHEN aggregate(zip_with({col}, hp,"
        f"     (p, q) -> CAST(p AS DOUBLE) * q),"
        f"     CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= 0.0D"
        f"    THEN 1 ELSE 0 END)),"
        f"  0, (acc2, v2) -> acc2 + v2) AS BIGINT))"
    )


def _sign_bit_duck(col: str, h: int, weight: int) -> str:
    arr = "[" + ",".join(f"{c:.1f}" for c in HYPERPLANES[h]) + "]"
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({col}) + 1),"
        f" i -> CAST({col}[CAST(i AS INTEGER)] AS DOUBLE)"
        f" * ({arr})[CAST(i AS INTEGER)])), (x, y) -> x + y)"
    )
    return f"(CASE WHEN {dot} >= 0.0 THEN {weight} ELSE 0 END)"


def _table_bucket_duck(col: str, t: int, n_bits: int = N_LSH_BITS) -> str:
    """DuckDB twin of one table's bucket id. ``n_bits`` regroups the same
    32 hyperplanes under a different (tables, bits) dial — e.g. the dedup
    candidate generator in functions/dedup.py uses 4x8 (256 buckets/table)
    where the ANN queries here use 8x4."""
    bits = [
        _sign_bit_duck(col, t * n_bits + b, 1 << b)
        for b in range(n_bits)
    ]
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _duck_candidates() -> str:
    joins = "\n        UNION ALL\n".join(
        f"""        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM bucketed q JOIN bucketed c ON q.b{t} = c.b{t}
            AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERY_VECS}"""
        for t in range(N_LSH_TABLES)
    )
    return f"SELECT DISTINCT query_id, neighbor_id FROM (\n{joins}\n    )"


@query(
    "sim_ann_hyperplane_lsh",
    oracle=f"""
    WITH {DUCK_EMB_SURFACE},
    bucketed AS (
        SELECT vec_id, embedding,
               {", ".join(f'{_table_bucket_duck("embedding", t)} AS b{t}'
                          for t in range(N_LSH_TABLES))}
        FROM emb
    ),
    candidates AS (
        {_duck_candidates()}
    ),
    sims AS (
        SELECT cand.query_id, cand.neighbor_id,
               ROUND({duck_cosine("q.embedding", "c.embedding")}, 6) AS cos_sim
        FROM candidates cand
        JOIN emb q ON q.vec_id = cand.query_id
        JOIN emb c ON c.vec_id = cand.neighbor_id
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
    tags=("similarity", "ann"),
)
def sim_ann_hyperplane_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: 8 tables x 4 sign bits;
    a candidate is any vector sharing a bucket with the query in ANY
    table; exact cosine + top-k only over candidates.

    Scale: bucket assignment is one map-side pass (no quantizer training,
    unlike IVF); each table contributes an equi-join on (table, bucket),
    expressed as ONE posexplode + ONE equi-join over all 8 tables — the
    shuffle moves 8 rows per vector (the signature), never pairs. The
    recall/cost dial is (tables, bits): more bits = smaller buckets =
    cheaper; more tables = higher recall.
    """
    # persist: the q and c branches below both consume the bucketed table;
    # without it the bucket expression is planned (and codegen-compiled)
    # once per branch. The signature table is the natural materialization
    # point, same as minhash signatures in functions/dedup.py. The bounded
    # top-k result is localCheckpoint'ed below so the cache unpersists
    # before returning (session cache hygiene — round-7 ADVICE pattern).
    emb = (
        similarity_surface(table(spark, sf, "embeddings", spread=True))
        .withColumn("buckets", F.expr(_spark_table_buckets("embedding")))
        .persist()
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.posexplode("buckets").alias("c_tbl", "c_bucket"),
    )
    sims = (
        F.broadcast(q)
        .join(
            c,
            (F.col("tbl") == F.col("c_tbl"))
            & (F.col("bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
        .distinct()  # collapses multi-table collisions of the same pair
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    try:
        out = (
            sims.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= TOP_K)
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()
    return out


# -- product quantization + asymmetric-distance rerank ----------------------
# The memory-bound scale path: 64-dim float32 vectors (256 B) compress to
# M=8 4-bit codes (4 B packed; kept as 8 tinyints here for clarity) — a
# 100-TB embedding corpus's code table fits in ~1.6 TB of executor memory,
# scannable without touching the raw vectors. Training follows the
# production shape (faiss): codebooks fit on a BOUNDED driver-side sample
# (constant work regardless of corpus size), then encoding, the ADC scan,
# and the exact re-rank are all distributed.

PQ_M = 8       # subspaces (64 dims -> 8 dims each)
PQ_K = 16      # centroids per subspace -> 4-bit codes
PQ_TRAIN_N = 256   # driver-side training sample bound
PQ_CAND = 20   # ADC candidates per query handed to the exact re-rank
PQ_ROUNDS = 10


def _train_pq_codebooks(sample):
    """Deterministic per-subspace Lloyd's k-means on an (n, 64) float64
    sample: seeded with the first PQ_K rows (sample is vec_id-ordered),
    fixed PQ_ROUNDS iterations, empty clusters keep their previous
    centroid. Vectors are L2-normalized first so ADC's squared-L2 is
    rank-equivalent to cosine (d2 = 2 - 2*cos on unit vectors)."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    d_sub = x.shape[1] // PQ_M
    books = []
    for m in range(PQ_M):
        sub = x[:, m * d_sub:(m + 1) * d_sub]
        cents = sub[:PQ_K].copy()
        for _ in range(PQ_ROUNDS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(PQ_K):
                members = sub[assign == k]
                if len(members):
                    cents[k] = members.mean(axis=0)
        books.append(cents)
    return books  # list of (PQ_K, d_sub) arrays


@query("sim_ann_pq_rerank", oracle=None, tags=("similarity", "pq"))
def sim_ann_pq_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank — the third ANN family
    next to IVF (sim_ann_ivf_bucketed) and LSH (sim_ann_hyperplane_lsh),
    and the one that changes the MEMORY story: the scan touches 4-bit
    codes, not vectors.

    Plan: (1) codebooks train on a bounded vec_id-ordered sample
    (driver-side by design — constant cost, the faiss/SCANN shape);
    (2) encoding is one Arrow-batched mapInPandas over the corpus — narrow,
    no shuffle; (3) each probe's 8x16 LUT of subspace distances ships in
    the task closure and the ADC scan emits (query, candidate,
    approx_d2) — still narrow; (4) top-PQ_CAND per query via partitioned
    window, then ONLY those candidates join back (keyed, tiny) to raw
    vectors for the exact cosine re-rank and final top-3. Rows-only in
    the gate: k-means training is not SQL-expressible; recall@3 vs the
    brute-force baseline is asserted in tests/test_similarity_quality.py.

    r14 (composed-corpus find): the similarity_surface rule applies
    here too — a NULL embedding made np.stack ragged and CRASHED the
    encode mapInPandas (one NULL row in 100 TB aborts the whole job),
    and a zero-norm vector NaN-poisons its own codes through the 0/0
    unit-normalization. Pinned by tests/test_composed_robustness.py.
    """
    import numpy as np
    import pandas as pd

    emb = similarity_surface(table(spark, sf, "embeddings", spread=True))
    sample = [
        r["embedding"]
        for r in emb.orderBy("vec_id").limit(PQ_TRAIN_N).collect()
    ]
    books = _train_pq_codebooks(sample)
    probes_raw = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id") < N_QUERY_VECS).collect()
    }
    d_sub = len(sample[0]) // PQ_M
    # per-probe LUT[m][k] = ||probe_sub_m - centroid_mk||^2 (unit-normed)
    luts = {}
    for qid, v in probes_raw.items():
        v = v / np.linalg.norm(v)
        luts[qid] = np.stack([
            ((v[m * d_sub:(m + 1) * d_sub][None, :] - books[m]) ** 2)
            .sum(axis=1)
            for m in range(PQ_M)
        ])  # (M, K)

    def encode(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].values).astype(np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            codes = np.empty((len(x), PQ_M), dtype=np.int32)
            for m in range(PQ_M):
                sub = x[:, m * d_sub:(m + 1) * d_sub]
                d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "codes": list(codes)}
            )

    coded = emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id bigint, codes array<int>"
    )

    def adc_scan(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].values)  # (n, M)
            vids = pdf["vec_id"].values
            out_q, out_v, out_d = [], [], []
            for qid, lut in luts.items():
                # gather: sum over m of LUT[m, code_m] — vectorized
                d2 = lut[np.arange(PQ_M)[None, :], codes].sum(axis=1)
                keep = vids != qid
                out_q.append(np.full(keep.sum(), qid, dtype=np.int64))
                out_v.append(vids[keep])
                out_d.append(d2[keep])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_v),
                    "approx_d2": np.concatenate(out_d),
                }
            )

    cands = coded.mapInPandas(
        adc_scan, "query_id bigint, neighbor_id bigint, approx_d2 double"
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id")
    )
    shortlist = (
        cands.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= PQ_CAND)
        .select("query_id", "neighbor_id")
    )
    probes = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    reranked = (
        shortlist.join(
            emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("c_emb")),
            "neighbor_id",
        )
        .join(F.broadcast(probes), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6)
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        reranked.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


RANGE_THRESHOLD = 0.3  # report candidate pairs with cosine >= this


def _duck_pair_candidates() -> str:
    joins = "\n        UNION ALL\n".join(
        f"""        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               a.embedding AS e_a, c.embedding AS e_b
        FROM bucketed a JOIN bucketed c ON a.b{t} = c.b{t}
            AND a.vec_id < c.vec_id"""
        for t in range(N_LSH_TABLES)
    )
    return f"SELECT DISTINCT id_a, id_b, e_a, e_b FROM (\n{joins}\n    )"


@query(
    "sim_range_search_lsh",
    oracle=f"""
    WITH {DUCK_EMB_SURFACE},
    bucketed AS (
        SELECT vec_id, embedding,
               {", ".join(f'{_table_bucket_duck("embedding", t)} AS b{t}'
                          for t in range(N_LSH_TABLES))}
        FROM emb
    ), cand AS (
        {_duck_pair_candidates()}
    ), sims AS (
        SELECT id_a, id_b,
               ROUND({duck_cosine("e_a", "e_b")}, 6) AS cos_sim
        FROM cand
    )
    SELECT id_a, id_b, cos_sim FROM sims WHERE cos_sim >= {RANGE_THRESHOLD}
    """,
    tags=("similarity",),
)
def sim_range_search_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Radius (range) similarity search: ALL pairs with cosine >= 0.3,
    the query shape behind near-duplicate sweeps and "related items"
    backfills where top-k is the wrong contract (a vector may have 0 or
    50 true neighbors inside the radius).

    Scale: identical bucketed-candidate machinery as the top-k ANN —
    pairs are generated ONLY inside shared hyperplane buckets (shuffle
    moves 8 signature rows per vector, never the n^2 pair space), exact
    cosine runs on candidates alone, and the radius test is a narrow
    filter. The oracle replicates the same deterministic hyperplanes,
    so the result is hash-exact, not approximately compared.

    The gate row pins (8 tables x 4 bits). At FIXED bits the candidate
    count grows ~n^2/2^bits (20x wall at an 8x inflation, SCALE.md);
    the scale rule is n_bits ~ log2(n) — growing the K-fold probe's
    bits by log2(K) restores ~linear candidates/wall. Use
    :func:`range_search_lsh` with an explicit (n_tables, n_bits) for a
    corpus-sized configuration.
    """
    return range_search_lsh(spark, sf)


def range_search_lsh(spark: SparkSession, sf: str,
                     threshold: float = RANGE_THRESHOLD,
                     n_tables: int = N_LSH_TABLES,
                     n_bits: int = N_LSH_BITS) -> DataFrame:
    """Parameterized radius-search engine behind sim_range_search_lsh;
    (n_tables, n_bits) is the recall/scale dial (bits ~ log2(corpus))."""
    emb = (
        similarity_surface(table(spark, sf, "embeddings", spread=True))
        .withColumn(
            "buckets",
            F.expr(_spark_table_buckets("embedding", n_tables, n_bits)),
        )
        .persist()
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("e_a"),
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("e_b"),
        F.posexplode("buckets").alias("b_tbl", "b_bucket"),
    )
    pairs = (
        a.join(
            b,
            (F.col("tbl") == F.col("b_tbl"))
            & (F.col("bucket") == F.col("b_bucket"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "e_a", "e_b")
        .distinct()
    )
    try:
        out = (
            pairs.select(
                "id_a", "id_b",
                F.round(cosine(F.col("e_a"), F.col("e_b")), 6)
                .alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()
    return out


def _hybrid_rrf_oracle() -> str:
    terms = ("scan", "join", "filter")
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in terms
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{t}"
        for t in terms
    )
    contrib = " + ".join(
        f"(ln(1 + (CAST(n_docs AS DOUBLE) - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * 2.2)"
        f" / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl)))"
        for t in terms
    )
    return f"""
    WITH tok AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    tf AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               {tf_cols}
        FROM tok
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
               {df_cols}
        FROM tf
    ),
    lex_scores AS (
        SELECT doc_id, ROUND({contrib}, 4) AS bm25
        FROM tf, corpus
        WHERE tf_scan + tf_join + tf_filter > 0
    ),
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rl
        FROM lex_scores
        ORDER BY bm25 DESC, doc_id LIMIT 50
    ),
    ex AS (
        SELECT vec_id, label,
               unnest(range(1, len(embedding) + 1)) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                    AS BIGINT) AS q
        FROM embeddings
    ),
    qv AS (
        SELECT dim, CAST(SUM(q) // COUNT(*) AS BIGINT) AS v
        FROM ex WHERE label = 0 GROUP BY dim
    ),
    dots AS (
        SELECT e.vec_id, CAST(SUM(e.q * qv.v) AS BIGINT) AS dot
        FROM ex e JOIN qv ON e.dim = qv.dim
        GROUP BY e.vec_id
    ),
    sem AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY dot DESC, vec_id) AS rs
        FROM dots
        ORDER BY dot DESC, vec_id LIMIT 50
    )
    SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id,
           CAST(COALESCE(l.rl, 0) AS BIGINT) AS rank_lex,
           CAST(COALESCE(s.rs, 0) AS BIGINT) AS rank_sem,
           ROUND(COALESCE(1.0 / (60 + l.rl), 0)
                 + COALESCE(1.0 / (60 + s.rs), 0), 6) AS rrf
    FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
    ORDER BY rrf DESC, doc_id LIMIT 15
    """


@query(
    "pipeline_hybrid_rrf",
    oracle=_hybrid_rrf_oracle(),
    tags=("similarity", "search", "llm-pipeline", "pipeline"),
    bench=True,
)
def pipeline_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): the BM25 lexical top-50 (bm25_scored, reused verbatim) fused
    with an embedding-similarity top-50 (quantized integer dot products
    against the label-0 centroid as the query vector), score
    1/(60+rank_lex) + 1/(60+rank_sem) — the stock hybrid-search
    combiner behind every production RAG stack, composed entirely from
    operators this engine already verifies separately.

    Scale shape: each retriever reduces to its top-50 via
    TakeOrderedAndProject BEFORE fusion — at 100 TB you fuse candidate
    lists, never corpora. Ranks inside the 50-row lists come from a
    constant-partition row_number over the LIMITed candidates — a
    single task over <=50 rows by construction, so the corpus-wide
    plan stays partition-parallel (no unbounded global window, no
    nested-loop join; the first draft's count-of-better inequality
    join planned as 4 BroadcastNestedLoopJoins and was caught by the
    plan audit). Determinism: dot
    products are exact int64 (1e6-quantized coords — order-free sums),
    BM25 is the 4 dp-rounded shared scorer, fusion arithmetic is a
    fixed two-term scalar tree rounded to 6 dp.
    """
    from wireduck_spark.functions.text import bm25_scored

    lex50 = (
        bm25_scored(spark, sf)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )

    def rank_limited(df, score, key, rank_name):
        # The input is bounded to <=50 rows by the preceding
        # TakeOrderedAndProject, so a single-task window is the intended
        # plan at ANY corpus size. The partition key must be a constant
        # DERIVED FROM A COLUMN: a bare lit(0) gets constant-folded out
        # of the partition spec, leaving WindowExec partitionSpec-empty —
        # which both logs the global-window WARN and erodes the
        # corpus-scale no-global-window audit invariant. pmod(key, 1) is
        # 0 for every (non-null) candidate row but survives folding.
        w = Window.partitionBy(F.pmod(F.col(key), F.lit(1))).orderBy(
            F.col(score).desc(), F.col(key)
        )
        return df.select(
            key, F.row_number().over(w).cast("bigint").alias(rank_name)
        )

    lexr = rank_limited(lex50, "bm25", "doc_id", "rl")
    e = table(spark, sf, "embeddings")
    # r14 OPTIMIZATION (guide §2.3/§4.1): only the label-0 slice explodes
    # to per-dimension rows (to aggregate the query centroid); the
    # CORPUS-wide posexplode -> broadcast-join -> re-group (a dims-x row
    # blowup through a partial aggregate for a value each row can fold
    # locally) is replaced by one in-row integer dot against the
    # broadcast dim-width query vector. The fold reproduces the old
    # explode+inner-join+SUM semantics exactly: NULL/empty vectors emit
    # no dots row, ragged dims contribute only the common prefix (the
    # inner join on dim), NULL elements are skipped by SUM, and an
    # all-NULL product list yields a NULL dot.
    qv = (
        e.filter(F.col("label") == 0)
        .select(F.posexplode(F.col("embedding")).alias("dim0", "x"))
        .groupBy("dim0")
        .agg(
            F.expr(
                "sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
                " div count(*)"
            ).cast("bigint").alias("v")
        )
    )
    qvarr = qv.groupBy().agg(
        F.expr("array_sort(collect_list(struct(dim0, v)))").alias("qs")
    ).select(F.expr("transform(qs, s -> s.v)").alias("qvec"))
    terms = (
        "transform(sequence(1, least(size(embedding), size(qvec))),"
        " i -> CAST(round(CAST(element_at(embedding, i) AS DOUBLE)"
        " * 1000000, 0) AS BIGINT) * element_at(qvec, i))"
    )
    dots = (
        e.select("vec_id", "embedding")
        .filter(F.expr("embedding IS NOT NULL AND size(embedding) >= 1"))
        .join(F.broadcast(qvarr))
        .filter(F.expr("size(qvec) >= 1"))
        .select(
            "vec_id",
            F.expr(
                f"CASE WHEN size(filter({terms}, t -> t IS NOT NULL)) = 0"
                f" THEN CAST(NULL AS BIGINT)"
                f" ELSE aggregate(filter({terms}, t -> t IS NOT NULL),"
                f" 0L, (acc, t) -> acc + t) END"
            ).cast("bigint").alias("dot"),
        )
    )
    sem50 = dots.orderBy(F.col("dot").desc(), "vec_id").limit(50)
    semr = rank_limited(sem50, "dot", "vec_id", "rs")
    fused = lexr.join(
        semr, lexr["doc_id"] == semr["vec_id"], "full_outer"
    ).select(
        F.coalesce(lexr["doc_id"], semr["vec_id"]).alias("doc_id"),
        F.coalesce(F.col("rl"), F.lit(0)).cast("bigint").alias("rank_lex"),
        F.coalesce(F.col("rs"), F.lit(0)).cast("bigint").alias("rank_sem"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rs")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(15)


_EVAL_DOT_SQL = """
    ex AS (
        SELECT vec_id, label,
               unnest(range(1, len(embedding) + 1)) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                    AS BIGINT) AS q
        FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS q_id, label AS q_label, dim, q AS qq
        FROM ex WHERE vec_id < 50
    ),
    dots AS (
        SELECT qr.q_id, qr.q_label, e.vec_id, e.label,
               CAST(SUM(qr.qq * e.q) AS BIGINT) AS dot
        FROM queries qr JOIN ex e ON qr.dim = e.dim
        WHERE e.vec_id != qr.q_id
        GROUP BY qr.q_id, qr.q_label, e.vec_id, e.label
    )
"""


@query(
    "pipeline_rag_eval_mrr",
    oracle=f"""
    WITH {_EVAL_DOT_SQL},
    ranked AS (
        SELECT q_id, q_label, label,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY dot DESC, vec_id)
                 AS BIGINT) AS rnk
        FROM dots
    ),
    firsts AS (
        SELECT q_id, q_label,
               CAST(MIN(CASE WHEN label = q_label THEN rnk END)
                   AS BIGINT) AS first_hit
        FROM ranked GROUP BY q_id, q_label
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(1000000 // first_hit) AS BIGINT) AS rr_ppm_sum,
           ROUND(CAST(SUM(1000000 // first_hit) AS DOUBLE)
                 / COUNT(*) / 1000000, 4) AS mrr
    FROM firsts
    GROUP BY q_label
    ORDER BY q_label
    """,
    tags=("similarity", "eval", "llm-pipeline", "pipeline"),
)
def pipeline_rag_eval_mrr(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieval-quality evaluation: mean reciprocal rank of the first
    SAME-label neighbor for a FIXED-size eval set (vec_id < 50),
    labels standing in for relevance judgments — the metric a RAG stack
    tracks across embedding-model upgrades, computed inside the engine
    so eval rides the same scan as indexing.

    Determinism: dots are exact int64 (1e6-quantized coords, order-free
    integer sums); ranks are total-ordered by (dot DESC, vec_id); each
    reciprocal rank is the exact integer 1000000 div rank, so the MRR
    numerator is an exact ppm sum and only the final mean divides in
    IEEE (rounded 4 dp).

    Scale: query-side rows are exploded once and joined on the DIM key
    (the hybrid_rrf centroid pattern) — an equi-join shuffle, never a
    nested loop; per-query ranking windows partition on q_id. The %50
    subset is the eval set: at 100 TB the candidate side stays the full
    corpus but queries are O(eval set), so dots is O(|eval| x corpus /
    bucketing) — swap in the IVF/LSH candidate generators from this
    module when exact exhaustive eval is too wide.
    """
    e = table(spark, sf, "embeddings")
    ex = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("bigint")
        .alias("q"),
    )
    queries = ex.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        "dim",
        F.col("q").alias("qq"),
    )
    dots = (
        queries.join(ex, "dim")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "q_label", "vec_id", "label")
        .agg(F.sum(F.col("qq") * F.col("q")).cast("bigint").alias("dot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "vec_id")
    ranked = dots.select(
        "q_id", "q_label", "label",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
    firsts = ranked.groupBy("q_id", "q_label").agg(
        F.min(F.when(F.col("label") == F.col("q_label"), F.col("rnk")))
        .cast("bigint").alias("first_hit")
    )
    return (
        firsts.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum(F.expr("1000000 div first_hit")).cast("bigint")
            .alias("rr_ppm_sum"),
        )
        .select(
            "label", "n_queries", "rr_ppm_sum",
            F.round(
                F.col("rr_ppm_sum").cast("double")
                / F.col("n_queries") / 1000000,
                4,
            ).alias("mrr"),
        )
        .orderBy("label")
    )


@query(
    "embed_hard_negatives",
    oracle=f"""
    WITH {_EVAL_DOT_SQL},
    ranked AS (
        SELECT q_id, vec_id, dot,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY dot DESC, vec_id)
                 AS BIGINT) AS rnk
        FROM dots
        WHERE label != q_label
    )
    SELECT q_id, vec_id AS negative_id, dot, rnk
    FROM ranked WHERE rnk <= 2
    ORDER BY q_id, rnk
    """,
    tags=("similarity", "llm-pipeline", "training"),
)
def embed_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the two highest-similarity candidates with a DIFFERENT label — the
    near-misses that make an embedding model actually learn boundaries
    (random negatives are trivially separable; mining is the step every
    dual-encoder recipe schedules between epochs).

    Same exact-integer dot machinery and dim-keyed equi-join as
    pipeline_rag_eval_mrr (one shared scan shape, no nested loops); the
    per-query top-2 is a q_id-partitioned rank that Spark executes as
    WindowGroupLimit (each task keeps 2 rows per query before the
    final shuffle). At 100 TB, swap the exhaustive candidate set for
    the IVF/LSH bucket generators in this module; the mining contract
    (wrong-label, top-k by dot) is unchanged.
    """
    e = table(spark, sf, "embeddings")
    ex = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("bigint")
        .alias("q"),
    )
    queries = ex.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        "dim",
        F.col("q").alias("qq"),
    )
    dots = (
        queries.join(ex, "dim")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "q_label", "vec_id", "label")
        .agg(F.sum(F.col("qq") * F.col("q")).cast("bigint").alias("dot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "negative_id")
    return (
        dots.filter(F.col("label") != F.col("q_label"))
        .select(
            "q_id", F.col("vec_id").alias("negative_id"), "dot",
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 2)
        .orderBy("q_id", "rnk")
    )


def _int_dot_spark(a: str, b: str) -> str:
    """Exact int64 dot product of two float arrays quantized per
    coordinate to a 1e3 grid — integer products summed by a fold, so
    no float addition order exists."""
    return (
        f"aggregate(zip_with({a}, {b}, (p, q) ->"
        f" CAST(ROUND(CAST(p AS DOUBLE) * 1000, 0) AS BIGINT)"
        f" * CAST(ROUND(CAST(q AS DOUBLE) * 1000, 0) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _int_dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, len({a}) + 1),"
        f" i -> CAST(ROUND(CAST({a}[CAST(i AS INTEGER)] AS DOUBLE)"
        f"   * 1000, 0) AS BIGINT)"
        f" * CAST(ROUND(CAST({b}[CAST(i AS INTEGER)] AS DOUBLE)"
        f"   * 1000, 0) AS BIGINT))), (x, y) -> x + y)"
    )


def _duck_eval_candidates() -> str:
    joins = "\n        UNION ALL\n".join(
        f"""        SELECT q.vec_id AS q_id, c.vec_id AS cand_id
        FROM bucketed q JOIN bucketed c ON q.b{t} = c.b{t}
            AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 50"""
        for t in range(N_LSH_TABLES)
    )
    return f"SELECT DISTINCT q_id, cand_id FROM (\n{joins}\n    )"


@query(
    "pipeline_rag_eval_mrr_lsh",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, label, embedding,
               {", ".join(f'{_table_bucket_duck("embedding", t)} AS b{t}'
                          for t in range(N_LSH_TABLES))}
        FROM embeddings
    ),
    candidates AS (
        {_duck_eval_candidates()}
    ),
    dots AS (
        SELECT cand.q_id, q.label AS q_label, cand.cand_id,
               c.label AS c_label,
               {_int_dot_duck("q.embedding", "c.embedding")} AS dot
        FROM candidates cand
        JOIN embeddings q ON q.vec_id = cand.q_id
        JOIN embeddings c ON c.vec_id = cand.cand_id
    ),
    ranked AS (
        SELECT q_id, q_label, c_label,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY dot DESC, cand_id)
                 AS BIGINT) AS rnk
        FROM dots
    ),
    firsts AS (
        SELECT q_id, q_label,
               MIN(CASE WHEN c_label = q_label THEN rnk END) AS first_hit
        FROM ranked GROUP BY q_id, q_label
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
           CAST(SUM(COALESCE(1000000 // first_hit, 0)) AS BIGINT)
               AS rr_ppm_sum,
           ROUND(CAST(SUM(COALESCE(1000000 // first_hit, 0)) AS DOUBLE)
                 / COUNT(*) / 1000000, 4) AS mrr
    FROM firsts
    GROUP BY q_label
    ORDER BY q_label
    """,
    tags=("similarity", "eval", "llm-pipeline", "ann"),
)
def pipeline_rag_eval_mrr_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """The SUBLINEAR twin of pipeline_rag_eval_mrr: MRR where each
    query's candidates come from the shared hyperplane-LSH buckets
    (any collision across the 8 tables) instead of the whole corpus —
    the eval you actually run at 100 TB, measuring the metric the
    production retriever can achieve INCLUDING its recall loss
    (queries whose buckets hold no same-label vector score 0, reported
    via n_hit).

    Candidate generation is the sim_ann_hyperplane_lsh plan (signature
    explode + per-table equi-join, shuffle moves 8 rows per vector);
    ranking uses the exact integer-grid dot product so ties and hashes
    are engine-identical. Candidates per query are bounded by bucket
    occupancy (the (tables, bits) dial), so eval cost is O(|eval| x
    bucket), not O(|eval| x corpus).

    Metric caveat (tested): this is rank-within-RETRIEVED MRR — the
    restricted candidate list also drops higher-ranked wrong-label
    competitors, so the value can exceed the exhaustive
    pipeline_rag_eval_mrr; the recall loss shows up in n_hit, not
    necessarily in the rank statistic.
    """
    # persist (not bare cache): the q and c branches both consume the
    # bucketed table; the small per-label result is localCheckpoint'ed
    # below so the cache can be unpersisted before returning — a bare
    # cache() would pin executor storage for the whole ~300-query
    # gate/bench session.
    emb = (
        table(spark, sf, "embeddings", spread=True)
        .withColumn("buckets", F.expr(_spark_table_buckets("embedding")))
        .persist()
    )
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.posexplode("buckets").alias("c_tbl", "c_bucket"),
    )
    pairs = (
        F.broadcast(q)
        .join(
            c,
            (F.col("tbl") == F.col("c_tbl"))
            & (F.col("bucket") == F.col("c_bucket"))
            & (F.col("q_id") != F.col("cand_id")),
        )
        .select("q_id", "q_label", "cand_id", "c_label",
                F.expr(_int_dot_spark("q_emb", "c_emb")).alias("dot"))
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "cand_id")
    ranked = pairs.select(
        "q_id", "q_label", "c_label",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
    firsts = ranked.groupBy("q_id", "q_label").agg(
        F.min(F.when(F.col("c_label") == F.col("q_label"), F.col("rnk")))
        .alias("first_hit")
    )
    try:
        out = (
            firsts.groupBy(F.col("q_label").alias("label"))
            .agg(
                F.count("*").cast("bigint").alias("n_queries"),
                F.sum(F.when(F.col("first_hit").isNotNull(), 1).otherwise(0))
                .cast("bigint").alias("n_hit"),
                F.sum(F.coalesce(F.expr("1000000 div first_hit"), F.lit(0)))
                .cast("bigint").alias("rr_ppm_sum"),
            )
            .select(
                "label", "n_queries", "n_hit", "rr_ppm_sum",
                F.round(
                    F.col("rr_ppm_sum").cast("double")
                    / F.col("n_queries") / 1000000,
                    4,
                ).alias("mrr"),
            )
            .orderBy("label")
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()
    return out


@query(
    "embed_hard_negatives_lsh",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, label, embedding,
               {", ".join(f'{_table_bucket_duck("embedding", t)} AS b{t}'
                          for t in range(N_LSH_TABLES))}
        FROM embeddings
    ),
    candidates AS (
        {_duck_eval_candidates()}
    ),
    dots AS (
        SELECT cand.q_id, q.label AS q_label, cand.cand_id,
               c.label AS c_label,
               {_int_dot_duck("q.embedding", "c.embedding")} AS dot
        FROM candidates cand
        JOIN embeddings q ON q.vec_id = cand.q_id
        JOIN embeddings c ON c.vec_id = cand.cand_id
    ),
    ranked AS (
        SELECT q_id, cand_id, dot,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY dot DESC, cand_id)
                 AS BIGINT) AS rnk
        FROM dots
        WHERE c_label != q_label
    )
    SELECT q_id, cand_id AS negative_id, dot, rnk
    FROM ranked WHERE rnk <= 2
    ORDER BY q_id, rnk
    """,
    tags=("similarity", "llm-pipeline", "training", "ann"),
)
def embed_hard_negatives_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """The SUBLINEAR twin of embed_hard_negatives: per query vector,
    the two highest-dot WRONG-label candidates drawn from the shared
    hyperplane-LSH buckets (any collision across the 8 tables) instead
    of the whole corpus — the mining pass a 100-TB dual-encoder
    pipeline actually schedules between epochs, where exhaustive
    all-pairs scoring is off the table. LSH is a natural fit here:
    hard negatives are BY DEFINITION the near-misses, which is exactly
    the neighborhood bucketing preserves (the lost far candidates were
    never hard).

    Candidate generation is the shared sim_ann_hyperplane_lsh plan
    (signature explode + per-table equi-join, shuffle moves 8 rows per
    vector); scoring is the exact 1e3-grid integer dot product
    (`_int_dot_spark`), so ranks and ties are engine-identical; the
    per-query top-2 runs as WindowGroupLimit. Same persist ->
    localCheckpoint -> unpersist hygiene as the MRR twin.
    """
    emb = (
        table(spark, sf, "embeddings", spread=True)
        .withColumn("buckets", F.expr(_spark_table_buckets("embedding")))
        .persist()
    )
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.posexplode("buckets").alias("c_tbl", "c_bucket"),
    )
    pairs = (
        F.broadcast(q)
        .join(
            c,
            (F.col("tbl") == F.col("c_tbl"))
            & (F.col("bucket") == F.col("c_bucket"))
            & (F.col("q_id") != F.col("cand_id")),
        )
        .select("q_id", "q_label", "cand_id", "c_label",
                F.expr(_int_dot_spark("q_emb", "c_emb")).alias("dot"))
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "cand_id")
    try:
        out = (
            pairs.filter(F.col("c_label") != F.col("q_label"))
            .withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= 2)
            .select("q_id", F.col("cand_id").alias("negative_id"),
                    "dot", "rnk")
            .orderBy("q_id", "rnk")
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()
    return out


# -- centroid-IVF retrieval-eval twin --------------------------------------
# A true inverted-file layout next to the hyperplane twin: K fixed coarse
# centroids (+-1 component vectors from the portable md5 derivation, so
# both engines embed identical literals), every vector assigned to its
# argmax-dot cell, queries probing their IVF_NPROBE best cells. The dial
# here is (K, nprobe) — cells shrink as K grows — where the hyperplane
# twin's dial is (tables, bits); production ANN stacks expose exactly
# these two shapes.
K_IVF = 16
IVF_NPROBE = 2


def _ivf_centroid(k: int) -> list[float]:
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"ivfc_{k}_{i}".encode()).hexdigest()[:15], 16) % 2
        == 0
        else -1.0
        for i in range(64)
    ]


IVF_CENTROIDS = [_ivf_centroid(k) for k in range(K_IVF)]


def _spark_ivf_sorted_cells(col: str) -> str:
    """All K centroid dots in ONE matrix-literal lambda tree (the
    _spark_table_buckets codegen lesson: never unroll K separate dot
    expressions), sorted ascending as (dot, -k) structs so the last
    element is the best cell (max dot, min k on ties) and the
    second-to-last the runner-up."""
    mat = "array(" + ",".join(
        "array(" + ",".join(f"{c:.1f}D" for c in _ivf_centroid(k)) + ")"
        for k in range(K_IVF)
    ) + ")"
    return (
        f"array_sort(transform(sequence(0, {K_IVF - 1}), k ->"
        f" named_struct("
        f"  'd', aggregate(zip_with({col}, element_at({mat}, k + 1),"
        f"   (p, c) -> CAST(ROUND(CAST(p AS DOUBLE) * 1000, 0) AS BIGINT)"
        f"    * CAST(c AS BIGINT)),"
        f"   CAST(0 AS BIGINT), (acc, v) -> acc + v),"
        f"  'nk', -k)))"
    )


def _duck_ivf_dot(col: str, k: int) -> str:
    arr = "[" + ",".join(f"{c:.1f}" for c in IVF_CENTROIDS[k]) + "]"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, len({col}) + 1),"
        f" i -> CAST(ROUND(CAST({col}[CAST(i AS INTEGER)] AS DOUBLE)"
        f"   * 1000, 0) AS BIGINT)"
        f" * CAST(({arr})[CAST(i AS INTEGER)] AS BIGINT))), (x, y) -> x + y)"
    )


def _duck_ivf_assigned() -> str:
    unions = "\n        UNION ALL\n".join(
        f"""        SELECT vec_id, label, embedding, {k} AS k,
               {_duck_ivf_dot("embedding", k)} AS d
        FROM embeddings"""
        for k in range(K_IVF)
    )
    return f"""
    dots16 AS (
{unions}
    ),
    assigned AS (
        SELECT vec_id, label, embedding, k,
               CAST(row_number() OVER (
                   PARTITION BY vec_id ORDER BY d DESC, k) AS BIGINT) AS rn
        FROM dots16
    )"""


@query(
    "pipeline_rag_eval_mrr_ivf",
    oracle=f"""
    WITH {_duck_ivf_assigned()},
    corpus AS (
        SELECT vec_id, label, embedding, k AS cell
        FROM assigned WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id, label, embedding, k AS cell
        FROM assigned WHERE rn <= {IVF_NPROBE} AND vec_id < 50
    ),
    dots AS (
        SELECT p.vec_id AS q_id, p.label AS q_label,
               c.vec_id AS cand_id, c.label AS c_label,
               {_int_dot_duck("p.embedding", "c.embedding")} AS dot
        FROM probes p JOIN corpus c
          ON p.cell = c.cell AND c.vec_id != p.vec_id
    ),
    ranked AS (
        SELECT q_id, q_label, c_label,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY dot DESC, cand_id)
                 AS BIGINT) AS rnk
        FROM dots
    ),
    firsts AS (
        SELECT q_id, q_label,
               MIN(CASE WHEN c_label = q_label THEN rnk END) AS first_hit
        FROM ranked GROUP BY q_id, q_label
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
           CAST(SUM(COALESCE(1000000 // first_hit, 0)) AS BIGINT)
               AS rr_ppm_sum,
           ROUND(CAST(SUM(COALESCE(1000000 // first_hit, 0)) AS DOUBLE)
                 / COUNT(*) / 1000000, 4) AS mrr
    FROM firsts
    GROUP BY q_label
    ORDER BY q_label
    """,
    tags=("similarity", "eval", "llm-pipeline", "ann"),
    bench=True,
)
def pipeline_rag_eval_mrr_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """The centroid-IVF twin of pipeline_rag_eval_mrr(_lsh): MRR where
    each query's candidates come from its IVF_NPROBE best coarse cells
    out of K_IVF fixed centroids — the inverted-file layout every
    vector store ships next to LSH. The (K, nprobe) dial trades recall
    for cells scanned where the hyperplane twin trades (tables, bits);
    recall loss surfaces in n_hit exactly as there.

    Cell assignment is ONE matrix-literal lambda expression per row
    (argmax of K exact integer dots — the _spark_table_buckets codegen
    lesson; a zero-shuffle map), so the corpus is hash-partitioned by
    cell and each probe joins only its cells' slice — O(|eval| x
    corpus/K x nprobe), the IVF contract. Ranking uses the shared
    1e3-grid integer dot so ranks/ties are engine-identical; ties in
    cell assignment break toward the lowest centroid id (rule 5) via
    the (dot, -k) struct sort.

    A real deployment would train centroids with
    dedup_semantic_kmeans's k-means engine and re-balance skewed cells
    (salting); fixed +-1 centroids keep the assignment reproducible
    inside both engines, which is what the oracle contract needs.
    """
    emb = (
        table(spark, sf, "embeddings", spread=True)
        .withColumn("cells", F.expr(_spark_ivf_sorted_cells("embedding")))
        .persist()
    )
    best = f"element_at(cells, {K_IVF}).nk * -1"
    second = f"element_at(cells, {K_IVF - 1}).nk * -1"
    corpus = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.expr(best).cast("bigint").alias("cell"),
    )
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.explode(
            F.expr(f"array(CAST({best} AS BIGINT), CAST({second} AS BIGINT))")
        ).alias("q_cell"),
    )
    pairs = (
        F.broadcast(q)
        .join(
            corpus,
            (F.col("q_cell") == F.col("cell"))
            & (F.col("q_id") != F.col("cand_id")),
        )
        .select("q_id", "q_label", "cand_id", "c_label",
                F.expr(_int_dot_spark("q_emb", "c_emb")).alias("dot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "cand_id")
    ranked = pairs.select(
        "q_id", "q_label", "c_label",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
    firsts = ranked.groupBy("q_id", "q_label").agg(
        F.min(F.when(F.col("c_label") == F.col("q_label"), F.col("rnk")))
        .alias("first_hit")
    )
    try:
        out = (
            firsts.groupBy(F.col("q_label").alias("label"))
            .agg(
                F.count("*").cast("bigint").alias("n_queries"),
                F.sum(F.when(F.col("first_hit").isNotNull(), 1).otherwise(0))
                .cast("bigint").alias("n_hit"),
                F.sum(F.coalesce(F.expr("1000000 div first_hit"), F.lit(0)))
                .cast("bigint").alias("rr_ppm_sum"),
            )
            .select(
                "label", "n_queries", "n_hit", "rr_ppm_sum",
                F.round(
                    F.col("rr_ppm_sum").cast("double")
                    / F.col("n_queries") / 1000000,
                    4,
                ).alias("mrr"),
            )
            .orderBy("label")
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()
    return out


# -- matryoshka (truncated-dimension) retrieval eval -----------------------


@query(
    "embed_matryoshka_eval",
    oracle=f"""
    WITH {_EVAL_DOT_SQL.replace(
        "CAST(SUM(qr.qq * e.q) AS BIGINT) AS dot",
        "CAST(SUM(CASE WHEN qr.dim <= 16 THEN qr.qq * e.q ELSE 0 END)"
        " AS BIGINT) AS dot16,"
        " CAST(SUM(qr.qq * e.q) AS BIGINT) AS dot64")},
    stacked AS (
        SELECT q_id, q_label, vec_id, label,
               CAST(16 AS BIGINT) AS dims, dot16 AS dot FROM dots
        UNION ALL
        SELECT q_id, q_label, vec_id, label,
               CAST(64 AS BIGINT) AS dims, dot64 AS dot FROM dots
    ),
    ranked AS (
        SELECT dims, q_id, q_label, label,
               CAST(row_number() OVER (
                   PARTITION BY dims, q_id ORDER BY dot DESC, vec_id)
                 AS BIGINT) AS rnk
        FROM stacked
    ),
    firsts AS (
        SELECT dims, q_id, q_label,
               CAST(MIN(CASE WHEN label = q_label THEN rnk END)
                   AS BIGINT) AS first_hit
        FROM ranked GROUP BY dims, q_id, q_label
    )
    SELECT dims, q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(1000000 // first_hit) AS BIGINT) AS rr_ppm_sum,
           ROUND(CAST(SUM(1000000 // first_hit) AS DOUBLE)
                 / COUNT(*) / 1000000, 4) AS mrr
    FROM firsts
    GROUP BY dims, q_label
    ORDER BY dims, q_label
    """,
    tags=("similarity", "eval", "llm-pipeline", "embedding"),
)
def embed_matryoshka_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-truncation eval: the exhaustive MRR at BOTH the full
    64 dims and the 16-dim prefix of every embedding — the dial an
    MRL-trained embedding stack exposes (serve the prefix, pay 4x less
    memory/compute; this query states what that costs in rank
    quality). The truncated dot is a CONDITIONAL partial sum inside
    the SAME dim-keyed aggregate as the full dot (dim <= 16), so both
    evals ride one join + one shuffle — truncation is free to measure,
    which is exactly why it belongs inside the engine.

    Determinism: both dots are exact int64 on the shared 1e6 grid;
    ranks total-ordered per (dims, q_id) by (dot DESC, vec_id);
    reciprocal ranks are exact integer ppm (the pipeline_rag_eval_mrr
    conventions verbatim).

    Scale: identical profile to pipeline_rag_eval_mrr (fixed eval set
    x corpus through the dim equi-join); the stack step doubles only
    the per-pair ROWS, which are |eval| x corpus before ranking — at
    100 TB swap the candidate generator for the IVF/LSH twins exactly
    as there.
    """
    e = table(spark, sf, "embeddings")
    ex = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("bigint")
        .alias("q"),
    )
    queries = ex.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        "dim",
        F.col("q").alias("qq"),
    )
    dots = (
        queries.join(ex, "dim")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "q_label", "vec_id", "label")
        .agg(
            F.sum(
                F.when(F.col("dim") <= 16, F.col("qq") * F.col("q"))
                .otherwise(F.lit(0))
            ).cast("bigint").alias("dot16"),
            F.sum(F.col("qq") * F.col("q")).cast("bigint").alias("dot64"),
        )
    )
    stacked = dots.selectExpr(
        "q_id", "q_label", "vec_id", "label",
        "stack(2, CAST(16 AS BIGINT), dot16, CAST(64 AS BIGINT), dot64)"
        " AS (dims, dot)",
    )
    w = Window.partitionBy("dims", "q_id").orderBy(F.desc("dot"), "vec_id")
    ranked = stacked.select(
        "dims", "q_id", "q_label", "label",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
    firsts = ranked.groupBy("dims", "q_id", "q_label").agg(
        F.min(F.when(F.col("label") == F.col("q_label"), F.col("rnk")))
        .cast("bigint").alias("first_hit")
    )
    return (
        firsts.groupBy("dims", F.col("q_label").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum(F.expr("1000000 div first_hit")).cast("bigint")
            .alias("rr_ppm_sum"),
        )
        .select(
            "dims", "label", "n_queries", "rr_ppm_sum",
            F.round(
                F.col("rr_ppm_sum").cast("double")
                / F.col("n_queries") / 1000000,
                4,
            ).alias("mrr"),
        )
        .orderBy("dims", "label")
    )


# -- NDCG@10 / recall@10 retrieval eval ------------------------------------

# Cumulative ideal-DCG literals for ranks 1..10 (sum of 1/log2(i+1)),
# embedded with full repr precision so both engines parse the identical
# IEEE doubles.
_IDCG10 = [
    "1.0", "1.6309297535714575", "2.1309297535714578", "2.5616063116448506",
    "2.9484591188793923", "3.3046663059874146", "3.637999639320748",
    "3.953464516106477", "4.254494511770458", "4.543559338088346",
]


@query(
    "pipeline_rag_eval_ndcg",
    oracle=f"""
    WITH {_EVAL_DOT_SQL},
    ranked AS (
        SELECT q_id, q_label, label,
               CAST(row_number() OVER (
                   PARTITION BY q_id ORDER BY dot DESC, vec_id)
                 AS BIGINT) AS rnk
        FROM dots
    ),
    per_q AS (
        SELECT q_id, q_label,
               CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_rel,
               CAST(SUM(CASE WHEN rnk <= 10 AND label = q_label
                        THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
               SUM(CASE WHEN rnk <= 10 AND label = q_label
                   THEN 1.0 / log2(CAST(rnk + 1 AS DOUBLE)) ELSE 0 END)
                   AS dcg10
        FROM ranked GROUP BY q_id, q_label
        HAVING SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) > 0
    ),
    scored AS (
        SELECT q_label, n_rel, hits10,
               dcg10 / ([{",".join(_IDCG10)}])
                   [CAST(CASE WHEN n_rel < 10 THEN n_rel ELSE 10 END
                     AS INTEGER)] AS ndcg10,
               CAST(hits10 AS DOUBLE)
                   / (CASE WHEN n_rel < 10 THEN n_rel ELSE 10 END)
                   AS recall10
        FROM per_q
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(SUM(ndcg10) / COUNT(*), 4) AS ndcg_at_10,
           ROUND(SUM(recall10) / COUNT(*), 4) AS recall_at_10
    FROM scored
    GROUP BY q_label
    ORDER BY q_label
    """,
    tags=("similarity", "eval", "llm-pipeline", "pipeline"),
)
def pipeline_rag_eval_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """NDCG@10 and recall@10 for the fixed eval set — the graded-rank
    and coverage companions to pipeline_rag_eval_mrr (MRR sees only
    the FIRST hit; NDCG rewards packing the whole top-10 with
    relevant items, recall@10 states how much of the achievable
    relevant set the cutoff captured). Binary gains (same-label =
    relevant), the standard label-judgment setup.

    The ideal DCG is a 10-entry cumulative literal table indexed by
    min(n_rel, 10) — both engines parse the identical full-precision
    IEEE doubles, so ndcg = dcg/idcg rides one shared tree; dcg terms
    (1/log2(rnk+1)) are per-row exact and the ≤10-term sums +
    per-label means are order-insensitive at the 4 dp output rounding.
    recall@10 divides by min(n_rel, 10) — the ACHIEVABLE relevant
    count at the cutoff — so a query with 40 relevant docs isn't
    penalized for a 10-slot budget.

    Scale: the pipeline_rag_eval_mrr plan verbatim (dim equi-join,
    per-query rank windows) plus one per-query aggregate; swap in the
    IVF/LSH candidate generators at 100 TB.
    """
    e = table(spark, sf, "embeddings")
    ex = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("bigint")
        .alias("q"),
    )
    queries = ex.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        "dim",
        F.col("q").alias("qq"),
    )
    dots = (
        queries.join(ex, "dim")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "q_label", "vec_id", "label")
        .agg(F.sum(F.col("qq") * F.col("q")).cast("bigint").alias("dot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "vec_id")
    ranked = dots.select(
        "q_id", "q_label", "label",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
    rel = F.col("label") == F.col("q_label")
    per_q = ranked.groupBy("q_id", "q_label").agg(
        F.sum(F.when(rel, 1).otherwise(0)).cast("bigint").alias("n_rel"),
        F.sum(F.when((F.col("rnk") <= 10) & rel, 1).otherwise(0))
        .cast("bigint").alias("hits10"),
        F.sum(
            F.when(
                (F.col("rnk") <= 10) & rel,
                F.lit(1.0) / F.log2((F.col("rnk") + 1).cast("double")),
            ).otherwise(F.lit(0.0))
        ).alias("dcg10"),
    ).filter(F.col("n_rel") > 0)
    # n_rel = 0 (a label with no other member) would index idcg_arr at 0 —
    # Spark's element_at throws ELEMENT_AT_BY_INDEX_ZERO while DuckDB's
    # list[0] returns NULL, so such queries are excluded in BOTH engines
    # (HAVING in the oracle). An un-gradeable query has no defined NDCG.
    idcg_arr = "array(" + ",".join(f"{v}D" for v in _IDCG10) + ")"
    cap = F.when(F.col("n_rel") < 10, F.col("n_rel")).otherwise(F.lit(10))
    scored = per_q.select(
        "q_label", "n_rel", "hits10",
        (
            F.col("dcg10")
            / F.element_at(F.expr(idcg_arr), cap.cast("int"))
        ).alias("ndcg10"),
        (F.col("hits10").cast("double") / cap).alias("recall10"),
    )
    return (
        scored.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.round(F.sum("ndcg10") / F.count("*"), 4).alias("ndcg_at_10"),
            F.round(F.sum("recall10") / F.count("*"), 4).alias("recall_at_10"),
        )
        .orderBy("label")
    )
