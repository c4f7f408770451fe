"""Training-mix layout operators: sequence packing and deterministic
global shuffle/sharding.

These cover the last pre-training data-prep step after cleaning and
dedup (SURVEY.md "beyond the reference" mandate): turning a curated
document set into (a) fixed token-budget training sequences and (b) a
reproducible shard layout for the data loader. Both are pure Catalyst
plans — windows partitioned by bounded keys, no Python, no global
un-partitioned window (the plan-audit rule from round 2's
window_percent_cume finding).

Cross-engine determinism: token counts are exact regexp-match counts
(same convention as functions/text.py), hashes are the portable 60-bit
md5 prefix (functions/dedup.py docstring), and all arithmetic is
integer — so Spark partial aggregation and DuckDB single-node execution
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.registry import query, table

_WORD_RE = r"[A-Za-z0-9]+"

# Portable 60-bit md5 prefix (functions/dedup.py docstring).
_SPARK_H60 = "CAST(conv(substring(md5({s}), 1, 15), 16, 10) AS BIGINT)"
_DUCK_H60 = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"

_PACK_BUDGET = 2048  # tokens per training sequence
_N_SHARDS = 16


@query(
    "seq_pack_greedy",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(text, '{_WORD_RE}')) AS BIGINT)
                 AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS start_offset
      FROM toks
    )
    SELECT source,
           CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM placed
    GROUP BY source, start_offset // {_PACK_BUDGET}
    ORDER BY source, seq_id
    """,
    tags=("packing", "llm-pipeline"),
)
def seq_pack_greedy(spark: SparkSession, sf: str) -> DataFrame:
    """Pack documents into fixed {budget}-token training sequences.

    GPT-style pretraining concatenates documents per domain in a
    deterministic order and slices the token stream into fixed-length
    sequences; a document belongs to the sequence where its first token
    lands (seq_id = exclusive-running-token-offset // budget). That
    running sum is a window PARTITIONED BY source — never a global
    un-partitioned window — so each domain's stream packs independently
    and in parallel. At 100 TB the per-source window shuffles once on
    (source) and the per-partition running sum is a single streaming
    pass; for a pathological single-source corpus, pre-split sources
    into salted sub-sources upstream (the per-source layout is already
    how training mixes are built).

    Reference has no packing operator; this extends the pipeline surface
    (SURVEY.md §2c).
    """
    toks = table(spark, sf, "documents", spread=True).select(
        "source",
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_WORD_RE), 0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("seq_id", F.expr(f"start_offset div {_PACK_BUDGET}"))
    return (
        placed.groupBy("source", "seq_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "seq_id")
    )


@query(
    "shuffle_deterministic_shards",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             {_DUCK_H60.format(s="'shuf:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    )
    SELECT doc_id,
           h % {_N_SHARDS} AS shard,
           CAST(row_number() OVER (
               PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id)
             AS BIGINT) AS pos
    FROM hashed
    ORDER BY shard, pos
    """,
    tags=("packing", "llm-pipeline"),
)
def shuffle_deterministic_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible global shuffle: md5-bucket docs into {n} shards with
    a stable within-shard order.

    Training runs need the SAME shuffle every restart (resume mid-epoch,
    reproduce a loss spike) — rand() cannot provide that across engines
    or retries, a content/key hash can (same argument as
    sampling_stable_split). shard = h60(doc_id) % n is a plain hash
    shuffle; pos = row_number within shard ordered by (h, doc_id) — a
    window PARTITIONED BY shard, so state per task is one counter and
    the sort is per-shard, never global. At 100 TB: one shuffle on
    shard, n ~ O(thousands) balanced partitions (md5 is uniform), each
    shard written as one data-loader file.
    """
    hashed = table(spark, sf, "documents", spread=True).select(
        "doc_id",
        F.expr(
            _SPARK_H60.format(s="concat('shuf:', CAST(doc_id AS STRING))")
        ).alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        hashed.withColumn("shard", F.expr(f"h % {_N_SHARDS}"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


@query(
    "pipeline_training_mix",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, source, text,
             CAST(len(regexp_extract_all(text, '{_WORD_RE}')) AS BIGINT)
                 AS n_tokens
      FROM documents
      WHERE len(regexp_extract_all(text, '{_WORD_RE}')) >= 5
        AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
            / greatest(length(text), 1) <= 0.25
    ),
    keep AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keep_id
      FROM filtered GROUP BY md5(text)
    ),
    deduped AS (
      SELECT f.doc_id, f.source, f.n_tokens
      FROM filtered f JOIN keep k ON f.doc_id = k.keep_id
    ),
    sampled AS (
      SELECT * FROM (
        SELECT doc_id, source, n_tokens,
               10 + 4 * (CAST(substr(source, 4) AS BIGINT) % 10) AS rate_pct,
               {_DUCK_H60.format(
                   s="source || ':' || CAST(doc_id AS VARCHAR)")} % 100 AS hh
        FROM deduped)
      WHERE hh < rate_pct
    ),
    placed AS (
      SELECT source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS start_offset
      FROM sampled
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT start_offset // {_PACK_BUDGET}) AS BIGINT)
               AS n_seqs,
           CAST(SUM(n_tokens) AS BIGINT) AS mix_tokens
    FROM placed
    GROUP BY source
    ORDER BY source
    """,
    tags=("packing", "pipeline", "llm-pipeline"),
    bench=True,
)
def pipeline_training_mix(spark: SparkSession, sf: str) -> DataFrame:
    """The full raw-corpus -> training-mix pipeline as ONE Catalyst plan:
    quality filter -> exact dedup -> stratified per-source sampling ->
    sequence packing -> per-source mix inventory.

    Every stage exists standalone (pipeline_corpus_clean's filter/dedup,
    sampling_stratified_source's hash-rate keep, seq_pack_greedy's
    packing window); this query proves they COMPOSE: the filter pushes
    to the scan, dedup is one hash shuffle, the sample keep is a narrow
    map that runs inside the dedup exchange, and the packing window
    reuses the per-source partitioning. At 100 TB the whole mix build is
    three shuffles (dedup hash, source window, final agg) over
    progressively smaller data — no stage re-reads the corpus.
    """
    d = table(spark, sf, "documents", spread=True)
    n_tokens = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_WORD_RE), 0)
    ).cast("bigint")
    punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9 ]"), 0)
    ).cast("double") / F.greatest(F.length("text"), F.lit(1))
    filtered = (
        d.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct)
        .filter((F.col("n_tokens") >= 5) & (F.col("punct_ratio") <= 0.25))
        .select("doc_id", "source", "text", "n_tokens")
    )
    # r14 OPTIMIZATION (guide §2.4 — remove shuffles outright): exact
    # dedup as ONE hash-keyed window (keep the min doc_id per md5 group)
    # instead of groupBy+self-join. The join shape evaluated `filtered`
    # twice (the quality regexes ran over the corpus once per side; AQE
    # could not reuse the exchanges because the two sides shuffle on
    # different keys) and paid three Exchanges (h-agg, doc_id, keep_id).
    # A row survives iff its doc_id is its md5 group's min — identical
    # to the join on keep_id (doc_id is globally unique, so it can only
    # match its own group's min). Projected to 4 slim columns before the
    # window so the exchange never carries text.
    w_dedup = Window.partitionBy("h")
    deduped = (
        filtered.select(
            "doc_id", "source", "n_tokens",
            F.md5(F.col("text").cast("binary")).alias("h"),
        )
        .withColumn("keep_id", F.min("doc_id").over(w_dedup))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "source", "n_tokens")
    )
    rate = 10 + 4 * (F.substring("source", 4, 10).cast("long") % 10)
    hh = (
        F.expr(_SPARK_H60.format(s="concat(source, ':', CAST(doc_id AS STRING))"))
        % 100
    )
    sampled = (
        deduped.withColumn("rate_pct", rate)
        .withColumn("hh", hh)
        .filter(F.col("hh") < F.col("rate_pct"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sampled.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        placed.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct(
                F.expr(f"start_offset div {_PACK_BUDGET}")
            ).cast("bigint").alias("n_seqs"),
            F.sum("n_tokens").cast("bigint").alias("mix_tokens"),
        )
        .orderBy("source")
    )


@query(
    "embed_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             greatest(list_aggregate(
                 list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE))), 'max'),
               1e-30) AS maxabs,
             embedding
      FROM embeddings
    )
    SELECT vec_id,
           CAST(ROUND(maxabs / 127 * 1000000, 0) AS BIGINT) AS scale_micro,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           md5(array_to_string(
               list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 127 / maxabs, 0)
                             AS BIGINT)),
               ',')) AS q_fp
    FROM scaled
    ORDER BY vec_id
    """,
    tags=("embedding", "llm-pipeline"),
    bench=True,
)
def embed_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the storage/serving layout step (4x smaller than float32, what
    vector stores and ANN serving tiers actually hold).

    q = round(x * 127 / maxabs) per dimension, scale = maxabs/127 kept
    as integer micros. Narrow map stage — array higher-order functions
    only, no shuffle, no Python. Cross-engine determinism: floats are
    widened to double BEFORE any arithmetic (float math promotes
    differently per engine; double ops are IEEE-identical), the
    quantized array is fingerprinted via md5 of its canonical
    comma-joined form (arrays hash engine-specifically, strings don't —
    same canonicalization as scalar_array_funcs), and a 1e-30 floor
    guards all-zero vectors.
    """
    e = table(spark, sf, "embeddings", spread=True)
    maxabs = F.greatest(
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ),
        F.lit(1e-30),
    )
    scaled = e.withColumn("maxabs", maxabs)
    q = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 127 / F.col("maxabs"), 0)
        .cast("bigint"),
    )
    return scaled.select(
        "vec_id",
        F.round(F.col("maxabs") / 127 * 1000000, 0).cast("bigint")
        .alias("scale_micro"),
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.md5(F.array_join(q, ",").cast("binary")).alias("q_fp"),
    ).orderBy("vec_id")


@query(
    "embed_mean_pool",
    oracle="""
    WITH ex AS (
        SELECT label,
               unnest(range(1, len(embedding) + 1)) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                    AS BIGINT) AS q
        FROM embeddings
    ),
    dims AS (
        SELECT label, dim,
               CAST(SUM(q) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM ex GROUP BY label, dim
    )
    SELECT label,
           CAST(MAX(n) AS BIGINT) AS n_vecs,
           md5(array_to_string(list(s ORDER BY dim), ',')) AS sum_fp,
           md5(array_to_string(list(CAST(s // n AS BIGINT) ORDER BY dim),
               ',')) AS mean_fp
    FROM dims
    GROUP BY label
    """,
    tags=("embedding", "llm"),
)
def embed_mean_pool(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label mean-pooled embedding (class centroids / prototype
    vectors — the pooling step behind SemDeDup centroids, k-NN class
    prototypes, and dataset cartography): dim-wise mean of all vectors
    sharing a label.

    Engine-exactness: floats never sum. Each coordinate is quantized to
    an int64 (ROUND(x*1e6)) in a narrow map; integer sums are
    order-independent, and the mean uses int64 truncating division
    (Spark `div` == DuckDB `//` toward zero — verified on negatives).
    The pooled arrays are emitted as md5 fingerprints of their canonical
    comma-joined form (the embed_quantize_int8 convention): top-level
    ARRAY columns are banned in gate outputs because the driver's pandas
    canonicalizer cannot sort/hash list cells (round-6 red row), and
    strings hash identically across engines while arrays don't.

    Scale: posexplode shuffles (label, dim) keyed rows — O(n x d) but
    partially aggregated map-side, so the wire carries one partial sum
    per (label, dim, task), not per vector. The final per-label array is
    rebuilt with array_sort over a d-element struct list — bounded by
    d=64, never by corpus size. No Python, no collect.
    """
    e = table(spark, sf, "embeddings")
    ex = e.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("bigint")
        .alias("q"),
    )
    dims = ex.groupBy("label", "dim").agg(
        F.sum("q").cast("bigint").alias("s"),
        F.count("*").alias("n"),
    )
    return (
        dims.groupBy("label")
        .agg(
            F.max("n").cast("bigint").alias("n_vecs"),
            F.array_sort(
                F.collect_list(F.struct("dim", "s"))
            ).alias("pairs"),
            F.array_sort(
                F.collect_list(
                    F.struct("dim", F.expr("s div n").cast("bigint")
                             .alias("m"))
                )
            ).alias("mpairs"),
        )
        .select(
            "label",
            "n_vecs",
            F.md5(
                F.array_join(F.transform(F.col("pairs"), lambda p: p.s), ",")
                .cast("binary")
            ).alias("sum_fp"),
            F.md5(
                F.array_join(F.transform(F.col("mpairs"), lambda p: p.m), ",")
                .cast("binary")
            ).alias("mean_fp"),
        )
    )


@query(
    "pipeline_rag_chunk_index",
    bench=True,
    oracle="""
    WITH chunks AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   range(0, CAST(ceil(len(text) / 200.0) AS BIGINT)),
                   i -> substr(text, CAST(i * 200 + 1 AS INTEGER), 200)
               )) AS chunk
        FROM documents WHERE len(text) > 0
    ), embedded AS (
        SELECT doc_id, source, len(chunk) AS chunk_len,
               ascii(substr(md5(chunk), 1, 1)) * 256
                 + ascii(substr(md5(chunk), 2, 1)) AS d1,
               ascii(substr(md5(chunk), 3, 1)) * 256
                 + ascii(substr(md5(chunk), 4, 1)) AS d2,
               ascii(substr(md5(chunk), 5, 1)) * 256
                 + ascii(substr(md5(chunk), 6, 1)) AS d3,
               ascii(substr(md5(chunk), 7, 1)) * 256
                 + ascii(substr(md5(chunk), 8, 1)) AS d4
        FROM chunks
    ), bucketed AS (
        SELECT source,
               CAST(CASE WHEN d1 > d2 THEN 2 ELSE 0 END
                  + CASE WHEN d3 > d4 THEN 1 ELSE 0 END AS BIGINT)
                   AS bucket,
               doc_id, chunk_len
        FROM embedded
    )
    SELECT source, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(chunk_len) AS BIGINT) AS sum_chars
    FROM bucketed GROUP BY source, bucket
    """,
    tags=("pipeline", "rag"),
)
def pipeline_rag_chunk_index(spark: SparkSession, sf: str) -> DataFrame:
    """RAG index-build pipeline as ONE Catalyst plan: fixed-width chunking
    (array HOF, no UDTF needed for the simple case), a deterministic
    fake chunk embedding (md5-derived integer dims — swap for a real
    encoder's pandas_udf on a GPU cluster; the pipeline shape is
    unchanged via the `rag_chunk_index` embed_dims seam), sign-test LSH
    bucket routing, and the per-(source, bucket) shard inventory a
    vector-index build job reports.

    Scale: chunking + embedding + routing are all NARROW (chunks never
    shuffle as rows until the final inventory aggregate, which moves
    only (source, bucket, doc_id, len) short rows with map-side
    partials). The real-encoder variant keeps the identical plan with
    the md5 dims swapped for an Arrow-batched pandas_udf — routing and
    inventory stages untouched (proven by tests/test_encoder_seam.py's
    numpy hashing-trick vectorizer through the same seam).
    """
    return rag_chunk_index(table(spark, sf, "documents", spread=True))


def _md5_chunk_dims(chunks: DataFrame) -> DataFrame:
    """Default (fake) chunk encoder: 4 md5-derived integer dims. This is
    the SEAM CONTRACT for any replacement encoder — take the chunks
    frame (doc_id, source, chunk), return (doc_id, source, chunk_len,
    d1..d4 integer dims); routing and inventory stages are untouched.
    A real encoder implements the same contract as an Arrow-batched
    pandas_udf."""
    m = F.md5("chunk")
    dim = lambda k: (  # noqa: E731
        F.ascii(F.substring(m, k, 1)) * 256
        + F.ascii(F.substring(m, k + 1, 1))
    )
    return chunks.select(
        "doc_id", "source",
        F.length("chunk").alias("chunk_len"),
        dim(1).alias("d1"), dim(3).alias("d2"),
        dim(5).alias("d3"), dim(7).alias("d4"),
    )


def rag_chunk_index(d: DataFrame, embed_dims=None) -> DataFrame:
    """The pipeline_rag_chunk_index plan with a pluggable encoder stage:
    fixed-width chunking -> ``embed_dims`` (default: _md5_chunk_dims)
    -> sign-test LSH routing -> per-(source, bucket) inventory."""
    chunks = d.filter(F.length("text") > 0).select(
        "doc_id", "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.length("text") / F.lit(200.0)).cast("bigint")
                    - 1,
                ),
                lambda i: F.substring(
                    F.col("text"), (i * 200 + 1).cast("int"), 200),
            )
        ).alias("chunk"),
    )
    embedded = (embed_dims or _md5_chunk_dims)(chunks)
    bucketed = embedded.select(
        "source", "doc_id", "chunk_len",
        (F.when(F.col("d1") > F.col("d2"), 2).otherwise(0)
         + F.when(F.col("d3") > F.col("d4"), 1).otherwise(0))
        .cast("bigint").alias("bucket"),
    )
    return bucketed.groupBy("source", "bucket").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("chunk_len").cast("bigint").alias("sum_chars"),
    )


@query(
    "embed_drift_audit",
    oracle="""
    WITH ex AS (
        SELECT CASE WHEN (('0x' || substr(md5('snap:' ||
                        CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0
                    THEN 'base' ELSE 'cand' END AS snap,
               unnest(range(1, len(embedding) + 1)) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                    AS BIGINT) AS q
        FROM embeddings
    ),
    dims AS (
        SELECT snap, dim,
               CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q
        FROM ex GROUP BY snap, dim
    ),
    wide AS (
        SELECT b.dim,
               b.mean_q AS mean_base_q,
               c.mean_q AS mean_cand_q,
               abs(b.mean_q - c.mean_q) AS abs_drift_q
        FROM dims b JOIN dims c ON b.dim = c.dim
        WHERE b.snap = 'base' AND c.snap = 'cand'
    )
    SELECT CAST(dim AS BIGINT) AS dim, mean_base_q, mean_cand_q,
           CAST(abs_drift_q AS BIGINT) AS abs_drift_q
    FROM wide
    ORDER BY abs_drift_q DESC, dim LIMIT 10
    """,
    tags=("embedding", "llm-pipeline", "quality"),
)
def embed_drift_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding drift audit — the ML-ops check run when an embedding
    model is upgraded or a corpus snapshot refreshes: per-dimension mean
    shift between two snapshots (here: a stable hash split standing in
    for yesterday/today), reporting the 10 most-drifted dimensions. A
    sudden per-dim mean jump is the cheapest tripwire for silent
    encoder regressions before they poison ANN indexes and dedup
    thresholds downstream.

    Engine-exactness: the embed_mean_pool recipe — coordinates quantized
    to int64 (ROUND(x*1e6)) in a narrow map, integer sums (order-free),
    truncating int division for means; the drift metric is an |int64 -
    int64|. No float ever aggregates.

    Scale: one posexplode keyed on (snapshot, dim) with map-side partial
    sums — wire volume is 2 x d partials per task, not per vector; the
    dim-level self-join is 2d rows (d=64); top-10 is
    TakeOrderedAndProject. Linear in vectors, constant in everything
    else.
    """
    e = table(spark, sf, "embeddings")
    snap = F.when(
        F.expr("CAST(conv(substring(md5(concat('snap:', "
               "CAST(vec_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
        % 2 == 0,
        F.lit("base"),
    ).otherwise(F.lit("cand"))
    ex = e.select(
        snap.alias("snap"),
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "snap",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("bigint")
        .alias("q"),
    )
    dims = ex.groupBy("snap", "dim").agg(
        F.expr("sum(q) div count(*)").cast("bigint").alias("mean_q")
    )
    b = dims.filter(F.col("snap") == "base").alias("b")
    c = dims.filter(F.col("snap") == "cand").alias("c")
    return (
        b.join(c, F.col("b.dim") == F.col("c.dim"))
        .select(
            F.col("b.dim").cast("bigint").alias("dim"),
            F.col("b.mean_q").alias("mean_base_q"),
            F.col("c.mean_q").alias("mean_cand_q"),
            F.abs(F.col("b.mean_q") - F.col("c.mean_q")).cast("bigint")
            .alias("abs_drift_q"),
        )
        .orderBy(F.col("abs_drift_q").desc(), "dim")
        .limit(10)
    )


def _quant_audit_oracle() -> str:
    from wireduck_spark.functions.similarity import duck_cosine

    return f"""
    WITH scaled AS (
      SELECT vec_id,
             greatest(list_aggregate(
                 list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE))), 'max'),
               1e-30) AS maxabs,
             embedding
      FROM embeddings
    ),
    recon AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
                 x -> ROUND(CAST(x AS DOUBLE) * 127 / maxabs, 0)) AS q
      FROM scaled
      WHERE maxabs > 1e-20
    )
    SELECT vec_id,
           ROUND({duck_cosine("embedding", "q")}, 6) AS cos_recon
    FROM recon ORDER BY vec_id
    """


@query(
    "embed_quantization_error_audit",
    oracle=_quant_audit_oracle(),
    tags=("embedding", "llm-pipeline", "quality"),
)
def embed_quantization_error_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Reconstruction-quality audit of embed_quantize_int8: per-vector
    cosine between the original float vector and its int8-quantized
    form. The check that closes the quantization loop — a serving tier
    that stores int8 must KNOW the recall cost (cos_recon ~0.999+ for
    well-scaled vectors; a low row here flags a vector whose dynamic
    range the symmetric scale clips).

    The per-vector scale s = maxabs/127 cancels out of the cosine
    (cos(x, q*s) = cos(x, q) for s > 0), so the audit compares the
    original against the INTEGER code vector directly — one less float
    op chain to keep IEEE-identical. Same deterministic sequential
    fold as dedup_embedding_cosine; floats widened to double before
    any arithmetic; all-zero vectors (maxabs at the 1e-30 floor) are
    excluded rather than emitting cross-engine NaN.

    Scale: a pure narrow map over the embeddings scan — per-vector
    array folds, no shuffle, no Python (the embed_quantize_int8
    profile).
    """
    from wireduck_spark.functions.similarity import cosine

    e = table(spark, sf, "embeddings", spread=True)
    maxabs = F.greatest(
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ),
        F.lit(1e-30),
    )
    scaled = e.withColumn("maxabs", maxabs).filter(F.col("maxabs") > 1e-20)
    q = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 127 / F.col("maxabs"), 0)
        .cast("bigint"),
    )
    return (
        scaled.withColumn("q", q)
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q")), 6)
            .alias("cos_recon"),
        )
        .orderBy("vec_id")
    )
