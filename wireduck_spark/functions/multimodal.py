"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the decode step is a
deterministic fake behind the `fake_decode_stats` mapInPandas transform
(clearly marked; swap in PIL/torchaudio/ffmpeg on a real cluster). What IS
real and tested: the schema contract, the binary column handling, the
Arrow batch shape through mapInPandas, and the partitioning story.

The testdata has no binary table, so `mm_binary_metadata` manufactures a
deterministic binary column from md5(text) — the point is exercising
Spark's BinaryType end-to-end with a DuckDB oracle (BLOB via from_hex).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

from wireduck_spark.registry import query, table

# Schema of a multimodal asset table at scale: content is opaque bytes,
# metadata is typed columns (never parse bytes to learn what you already
# know). Partition by (modality, shard of asset_id) in a real deployment.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("byte_len", LongType(), True),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("byte_len", LongType(), True),
        StructField("first_byte", LongType(), True),
        StructField("checksum_mod", LongType(), True),
    ]
)


def fake_decode_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas transform standing in for image/audio decode.

    Deterministic fake: real deployments replace the body with e.g.
    PIL.Image.open(io.BytesIO(content)) / resize / feature extraction.
    The Arrow batch shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame])
    and the schema contract are the real, tested part.

    Vectorized within each batch: fixed-width content (16-byte md5 here —
    the common case for thumbnails/embeddings too) is viewed as one
    (n, width) uint8 ndarray and reduced with numpy, not a Python lambda
    per cell (round-1 VERDICT minor); ragged/null rows fall back per-row.
    """
    import numpy as np

    for pdf in batches:
        content = pdf["content"]
        lens = content.map(lambda b: len(b) if b is not None else 0).to_numpy()
        if len(content) and lens.min() == lens.max() and lens[0] > 0:
            mat = np.frombuffer(
                b"".join(content.to_list()), dtype=np.uint8
            ).reshape(len(content), lens[0])
            first = mat[:, 0].astype(np.int64)
            csum = mat.sum(axis=1, dtype=np.int64) % 251
        else:  # ragged or empty/null content: per-row fallback
            first = content.map(
                lambda b: int(b[0]) if b is not None and len(b) else -1
            ).to_numpy()
            csum = content.map(
                lambda b: sum(b) % 251 if b is not None else -1
            ).to_numpy()
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "byte_len": lens.astype(np.int64),
                "first_byte": first,
                "checksum_mod": csum,
            }
        )


def documents_as_assets(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic binary asset table derived from documents (md5 bytes
    as fake image content)."""
    d = table(spark, sf, "documents", spread=True)
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.to_binary(F.md5("text"), F.lit("hex")).alias("content"),
        F.lit("image/fake").alias("mime"),
        F.length(F.to_binary(F.md5("text"), F.lit("hex")))
        .cast("bigint")
        .alias("byte_len"),
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           'image' AS modality,
           CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS byte_len,
           upper(substr(md5(text), 1, 8)) AS magic_hex,
           CAST(length(text) % 512 + 1 AS BIGINT) AS fake_width,
           CAST(length(text) % 384 + 1 AS BIGINT) AS fake_height
    FROM documents
    """,
    tags=("multimodal",),
)
def mm_binary_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata path: bytes stay opaque, typed metadata is
    derived/selected without decoding (the scan never materializes content
    for metadata-only queries — column pruning keeps the binary out of the
    read schema at scale)."""
    d = table(spark, sf, "documents", spread=True)
    content = F.to_binary(F.md5("text"), F.lit("hex"))
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.length(content).cast("bigint").alias("byte_len"),
        F.upper(F.substring(F.md5("text"), 1, 8)).alias("magic_hex"),
        (F.length("text") % 512 + 1).cast("bigint").alias("fake_width"),
        (F.length("text") % 384 + 1).cast("bigint").alias("fake_height"),
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS byte_len,
           CAST(('0x' || substr(md5(text), 1, 2))::INTEGER AS BIGINT) AS first_byte,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, 17),
                        i -> ('0x' || substr(md5(text), CAST(i * 2 - 1 AS INTEGER),
                                             2))::BIGINT)),
                (a, x) -> a + x) % 251 AS BIGINT) AS checksum_mod
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("multimodal", "pandas_udf"),
)
def mm_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """Pandas-UDF decode path: binary content -> per-asset features via
    Arrow-batched mapInPandas (the fake decode). The oracle recomputes the
    same deterministic stats from the md5 bytes in SQL, proving the Python
    batch path agrees with a relational definition.

    Scale: mapInPandas streams Arrow batches executor-side — the pattern
    for real decode/resize/feature-extract over 100 TB of media; partition
    count (not driver memory) bounds the working set.
    """
    assets = (
        documents_as_assets(spark, sf)
        .select("asset_id", "content")
        # a NULL-content asset (NULL-text doc) is not decodable and
        # yields no row — the uniform mm_* contract (r13 adversarial
        # pin; the Python fallback's -1 sentinels diverged from the
        # oracle's NULL propagation)
        .filter(F.col("content").isNotNull())
    )
    return assets.mapInPandas(fake_decode_stats, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "asset_id bigint, frame_idx bigint, frame_hex string"
FRAME_BYTES = 4
FRAME_STRIDE = 2  # sample every 2nd frame


def fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-sampling stub: treat content as a fixed-rate "video" of
    FRAME_BYTES-sized frames, emit every FRAME_STRIDE-th frame. A real
    implementation swaps the byte-slicing for pyav/ffmpeg keyframe
    extraction (not in this container — SURVEY brief: stub the codec,
    keep the Spark-side batch shape real)."""
    for pdf in batches:
        ids, idxs, hexes = [], [], []
        for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
            if content is None:
                continue
            n_frames = len(content) // FRAME_BYTES
            for fi in range(0, n_frames, FRAME_STRIDE):
                ids.append(asset_id)
                idxs.append(fi)
                hexes.append(
                    content[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES].hex()
                )
        yield pd.DataFrame(
            {"asset_id": ids, "frame_idx": idxs, "frame_hex": hexes}
        )


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(fi AS BIGINT) AS frame_idx,
           substr(md5(text), CAST(fi * {FRAME_BYTES * 2} + 1 AS INTEGER),
                  {FRAME_BYTES * 2}) AS frame_hex
    FROM documents,
         LATERAL (SELECT unnest(generate_series(
             0, 16 // {FRAME_BYTES} - 1, {FRAME_STRIDE})) AS fi)
    WHERE text IS NOT NULL
    """,
    tags=("multimodal", "pandas_udf"),
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Strided frame sampling over binary "video" content via mapInPandas
    (one output row per sampled frame). The oracle re-derives the sampled
    byte windows from the md5 hex in SQL.

    Scale: sampling is a pure map with output fan-out n_frames/stride —
    no shuffle; at 100 TB the only knobs are partition size and the
    Arrow batch size, both already bounded.
    """
    assets = documents_as_assets(spark, sf).select("asset_id", "content")
    return assets.mapInPandas(fake_frame_sample, schema=FRAME_SCHEMA)


def resize_images(batches: Iterator[pd.DataFrame],
                  real: bool = False) -> Iterator[pd.DataFrame]:
    """Resize stub: real=True is the PIL path (unavailable in this
    container — raises to make the seam explicit); the fake path
    downsamples by byte-striding, preserving the batch contract."""
    if real:
        raise NotImplementedError(
            "real resize needs PIL/ffmpeg; not present in this container"
        )
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "resized_hex": content.map(
                    lambda b: b[::2].hex() if b is not None else None
                ),
                "resized_len": content.map(
                    lambda b: (len(b) + 1) // 2 if b is not None else 0
                ).astype("int64"),
            }
        )


@query(
    "mm_resize_stub",
    oracle="""
    SELECT doc_id AS asset_id,
           lower(list_aggregate(
               list_transform(range(0, 8),
                   i -> substr(md5(text), CAST(i * 4 + 1 AS INTEGER), 2)),
               'string_agg', '')) AS resized_hex,
           CAST(8 AS BIGINT) AS resized_len
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("multimodal", "pandas_udf"),
)
def mm_resize_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-stride "resize" via mapInPandas (every 2nd byte of the fake
    image content); the oracle re-derives the strided hex in SQL.
    NULL-content assets yield no row (the uniform mm_* contract, r13)."""
    assets = (
        documents_as_assets(spark, sf)
        .select("asset_id", "content")
        .filter(F.col("content").isNotNull())
    )
    return assets.mapInPandas(
        resize_images, schema="asset_id bigint, resized_hex string,"
        " resized_len bigint"
    )


@query(
    "mm_asset_dedup",
    oracle="""
    SELECT modality,
           COUNT(*) AS n_assets,
           CAST(COUNT(DISTINCT content_hex) AS BIGINT) AS n_unique_blobs,
           CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
           CAST(SUM(byte_len)
                - SUM(CASE WHEN rn = 1 THEN byte_len ELSE 0 END)
                AS BIGINT) AS dedup_savings_bytes
    FROM (
      SELECT modality, content_hex, byte_len,
             row_number() OVER (PARTITION BY modality, content_hex
                                ORDER BY asset_id) AS rn
      FROM (
        SELECT doc_id AS asset_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS modality,
               md5(text) AS content_hex,
               CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS byte_len
        FROM documents)
    )
    GROUP BY modality
    """,
    tags=("multimodal", "dedup"),
)
def mm_asset_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Content-addressed dedup of binary assets: group blobs by content
    hash within each modality and count the storage a keep-one policy
    reclaims (the de-facto first pass over any crawled media corpus —
    identical bytes under different URLs/ids).

    Scale: the shuffle key is the 16-byte content hash, never the blob —
    the same never-move-the-payload rule as dedup_exact; per-modality
    uniques and savings come from one window + one aggregate over hash
    groups. At 100 TB the hash is computed at ingest and stored as a
    column, so this query never reads content at all (column pruning).
    """
    from pyspark.sql import Window

    d = table(spark, sf, "documents", spread=True)
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    content = F.to_binary(F.md5("text"), F.lit("hex"))
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.md5("text").alias("content_hex"),
        F.length(content).cast("bigint").alias("byte_len"),
    )
    w = Window.partitionBy("modality", "content_hex").orderBy("asset_id")
    ranked = assets.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.countDistinct("content_hex").alias("n_unique_blobs"),
        F.sum("byte_len").alias("total_bytes"),
        (
            F.sum("byte_len")
            - F.sum(F.when(F.col("rn") == 1, F.col("byte_len")).otherwise(0))
        ).alias("dedup_savings_bytes"),
    )


@query(
    "mm_phash_neardup",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, substr(md5(text), 1, 3) AS phash,
               CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS byte_len
        FROM documents
    )
    SELECT a.phash,
           a.doc_id AS asset_a,
           b.doc_id AS asset_b
    FROM hashed a JOIN hashed b
      ON a.phash = b.phash AND a.doc_id < b.doc_id
    """,
    tags=("multimodal", "dedup"),
)
def mm_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for binary assets: a
    12-bit pHash (stub: md5 prefix of the fake-decoded content — a real
    pipeline swaps in DCT-based pHash inside the mapInPandas decode seam,
    same shapes) buckets assets; equal hashes become candidate duplicate
    pairs via a self equi-join.

    Scale: the join key is the hash bucket — identical to
    dedup_minhash_lsh's banding join, O(sum of bucket^2) never all-pairs.
    A production 64-bit pHash with hamming tolerance uses multi-band
    sub-hashes (split 64 bits into 4x16-bit bands, equi-join per band,
    verify hamming distance on candidates) — the exact LSH machinery of
    functions/similarity.py applied to image space.
    """
    d = table(spark, sf, "documents", spread=True)
    hashed = d.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 3).alias("phash"),
    )
    a = hashed.select(F.col("phash"), F.col("doc_id").alias("asset_a"))
    b = hashed.select(F.col("phash").alias("phash_b"),
                      F.col("doc_id").alias("asset_b"))
    return (
        a.join(b, (F.col("phash") == F.col("phash_b"))
               & (F.col("asset_a") < F.col("asset_b")))
        .select("phash", "asset_a", "asset_b")
    )


AUDIO_FRAME_LEN = 32  # samples per analysis frame (fake 8-bit PCM)

AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("total_energy", LongType(), True),
        StructField("max_frame_energy", LongType(), True),
        StructField("max_frame_idx", LongType(), True),
    ]
)


def fake_audio_frame_energy(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas transform standing in for audio decode + framing.

    Deterministic fake: real deployments replace the ndarray view with
    torchaudio/soundfile PCM decode. The real, tested part is the audio
    pipeline SHAPE — fixed-length analysis frames over a sample stream,
    per-frame energy reduction, one output row per asset — all
    vectorized numpy over Arrow batches (no per-sample Python).
    """
    import numpy as np

    for pdf in batches:
        content = pdf["content"]
        lens = content.map(lambda b: len(b) if b is not None else 0).to_numpy()
        n = len(content)
        if n and lens.min() == lens.max() and lens[0] >= AUDIO_FRAME_LEN:
            width = int(lens[0])
            n_frames = width // AUDIO_FRAME_LEN
            mat = np.frombuffer(
                b"".join(content.to_list()), dtype=np.uint8
            ).reshape(n, width)[:, : n_frames * AUDIO_FRAME_LEN]
            sq = mat.astype(np.int64) ** 2
            frames = sq.reshape(n, n_frames, AUDIO_FRAME_LEN).sum(axis=2)
            total = frames.sum(axis=1)
            fmax = frames.max(axis=1)
            fidx = frames.argmax(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_samples": np.full(n, n_frames * AUDIO_FRAME_LEN,
                                         dtype=np.int64),
                    "n_frames": np.full(n, n_frames, dtype=np.int64),
                    "total_energy": total,
                    "max_frame_energy": fmax,
                    "max_frame_idx": fidx,
                }
            )
        elif n:  # ragged/short content: per-row fallback
            rows = []
            for aid, b in zip(pdf["asset_id"], content):
                if b is None or len(b) < AUDIO_FRAME_LEN:
                    rows.append((aid, 0, 0, 0, 0, -1))
                    continue
                nf = len(b) // AUDIO_FRAME_LEN
                en = [
                    sum(x * x for x in b[i * AUDIO_FRAME_LEN:
                                         (i + 1) * AUDIO_FRAME_LEN])
                    for i in range(nf)
                ]
                rows.append((aid, nf * AUDIO_FRAME_LEN, nf, sum(en),
                             max(en), en.index(max(en))))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_ENERGY_SCHEMA.fields])


@query(
    "mm_audio_frame_energy",
    oracle="""
    WITH pcm AS (
        SELECT doc_id AS asset_id,
               md5(text) || md5(text || '1') || md5(text || '2')
                 || md5(text || '3') || md5(text || '4') || md5(text || '5')
                 || md5(text || '6') || md5(text || '7') AS h
        FROM documents WHERE text IS NOT NULL
    ), samples AS (
        SELECT asset_id,
               list_transform(range(0, 128), i ->
                   (strpos('0123456789abcdef',
                           substr(h, 2 * CAST(i AS INTEGER) + 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef',
                          substr(h, 2 * CAST(i AS INTEGER) + 2, 1)) - 1
               ) AS s
        FROM pcm
    ), frames AS (
        SELECT asset_id,
               list_transform(range(0, 4), f ->
                   list_aggregate(
                       list_transform(range(0, 32), j ->
                           s[CAST(f * 32 + j + 1 AS INTEGER)]
                         * s[CAST(f * 32 + j + 1 AS INTEGER)]),
                       'sum')
               ) AS e
        FROM samples
    )
    SELECT asset_id,
           CAST(128 AS BIGINT) AS n_samples,
           CAST(4 AS BIGINT) AS n_frames,
           CAST(list_aggregate(e, 'sum') AS BIGINT) AS total_energy,
           CAST(list_aggregate(e, 'max') AS BIGINT) AS max_frame_energy,
           CAST(list_position(e, list_aggregate(e, 'max')) - 1 AS BIGINT)
               AS max_frame_idx
    FROM frames
    """,
    tags=("multimodal", "audio"),
)
def mm_audio_frame_energy(spark: SparkSession, sf: str) -> DataFrame:
    """Audio framing + per-frame energy — the front half of every audio
    feature pipeline (VAD, loudness normalization, MFCC windowing):
    fixed-length analysis frames over the PCM stream, an integer energy
    per frame, and per-asset frame statistics.

    The fake "decode" derives a deterministic 128-byte PCM8 stream from
    chained md5 blocks (the container has no codecs — swap the ndarray
    view for torchaudio on a real cluster; the docstring marks the
    seam). The DuckDB oracle recomputes the identical stream hex-side,
    proving the Arrow path end-to-end: binary column -> numpy view ->
    frame reshape -> energy reduce.

    Scale: pure narrow mapInPandas — zero shuffles, one output row per
    asset; energies are int64 sums (order-free, no float drift).
    """
    d = table(spark, sf, "documents", spread=True)
    hexcol = F.concat(
        F.md5("text"),
        *[F.md5(F.concat(F.col("text"), F.lit(str(i)))) for i in range(1, 8)],
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.to_binary(hexcol, F.lit("hex")).alias("content"),
    ).filter(F.col("content").isNotNull())  # NULL-content: no row (r13)
    return assets.mapInPandas(fake_audio_frame_energy, AUDIO_ENERGY_SCHEMA)


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", LongType(), True),
        StructField("n_cuts", LongType(), True),
        StructField("first_cut_frame", LongType(), True),
        StructField("max_diff", LongType(), True),
    ]
)

SCENE_CUT_THRESHOLD = 1300  # sum of |Δbyte| over a 16-byte frame


def fake_scene_cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas transform standing in for video decode + shot-boundary
    detection. Real deployments replace the ndarray view with a PyAV
    frame iterator + histogram distance; the tested part is the SHAPE:
    consecutive-frame difference over a frame axis, thresholded cuts,
    one summary row per asset — all vectorized numpy (no per-frame
    Python loop).
    """
    import numpy as np

    for pdf in batches:
        content = pdf["content"]
        lens = content.map(lambda b: len(b) if b is not None else 0).to_numpy()
        n = len(content)
        if n == 0:
            continue
        width = int(lens.max()) if len(lens) else 0
        if lens.min() == lens.max() and width >= 32 and width % 16 == 0:
            nf = width // 16
            mat = np.frombuffer(
                b"".join(content.to_list()), dtype=np.uint8
            ).reshape(n, nf, 16).astype(np.int64)
            diffs = np.abs(np.diff(mat, axis=1)).sum(axis=2)  # (n, nf-1)
            cuts = diffs > SCENE_CUT_THRESHOLD
            n_cuts = cuts.sum(axis=1)
            first = np.where(
                cuts.any(axis=1), cuts.argmax(axis=1) + 1, -1
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_frames": np.full(n, nf, dtype=np.int64),
                    "n_cuts": n_cuts,
                    "first_cut_frame": first,
                    "max_diff": diffs.max(axis=1),
                }
            )
        else:  # ragged/short: per-row fallback
            rows = []
            for aid, b in zip(pdf["asset_id"], content):
                if b is None or len(b) < 32 or len(b) % 16:
                    rows.append((aid, 0, 0, -1, 0))
                    continue
                nf = len(b) // 16
                fr = [b[i * 16:(i + 1) * 16] for i in range(nf)]
                diffs = [
                    sum(abs(x - y) for x, y in zip(fr[i], fr[i + 1]))
                    for i in range(nf - 1)
                ]
                cuts = [i + 1 for i, d in enumerate(diffs)
                        if d > SCENE_CUT_THRESHOLD]
                rows.append((aid, nf, len(cuts),
                             cuts[0] if cuts else -1, max(diffs)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              SCENE_CUT_SCHEMA.fields])


@query(
    "mm_video_scene_cut",
    oracle="""
    WITH strm AS (
        SELECT doc_id AS asset_id,
               md5(text) || md5(text || '1') || md5(text || '2')
                 || md5(text || '3') AS h
        FROM documents WHERE text IS NOT NULL
    ), samples AS (
        SELECT asset_id,
               list_transform(range(0, 64), i ->
                   (strpos('0123456789abcdef',
                           substr(h, 2 * CAST(i AS INTEGER) + 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef',
                          substr(h, 2 * CAST(i AS INTEGER) + 2, 1)) - 1
               ) AS s
        FROM strm
    ), diffs AS (
        SELECT asset_id,
               list_transform(range(0, 3), f ->
                   list_aggregate(
                       list_transform(range(0, 16), j ->
                           abs(s[CAST(f * 16 + j + 17 AS INTEGER)]
                             - s[CAST(f * 16 + j + 1 AS INTEGER)])),
                       'sum')
               ) AS d
        FROM samples
    ), cuts AS (
        SELECT asset_id,
               list_transform(d, x -> CASE WHEN x > 1300 THEN 1 ELSE 0 END)
                   AS c, d
        FROM diffs
    )
    SELECT asset_id,
           CAST(4 AS BIGINT) AS n_frames,
           CAST(list_aggregate(c, 'sum') AS BIGINT) AS n_cuts,
           CAST(CASE WHEN list_aggregate(c, 'sum') > 0
                     THEN list_position(c, 1) ELSE -1 END AS BIGINT)
               AS first_cut_frame,
           CAST(list_aggregate(d, 'max') AS BIGINT) AS max_diff
    FROM cuts
    """,
    tags=("multimodal", "video"),
)
def mm_video_scene_cut(spark: SparkSession, sf: str) -> DataFrame:
    """Video shot-boundary detection plumbing: consecutive-frame absolute
    difference over a fake 4-frame x 16-byte stream (chained md5
    blocks), thresholded into scene cuts — the sampling front-end of
    video training-data pipelines (pick one keyframe per shot, drop
    static spans).

    The DuckDB oracle recomputes the identical frame stream hex-side;
    the Spark side is the real Arrow path: binary column -> (asset,
    frame, byte) ndarray -> vectorized np.diff -> per-asset summary.
    diff semantics match tshark-free video heuristics: sum |Δ| per
    frame pair, cut when above threshold, frames indexed from the new
    shot's first frame.

    Scale: pure narrow mapInPandas, zero shuffles, one row per asset.
    """
    d = table(spark, sf, "documents", spread=True)
    hexcol = F.concat(
        F.md5("text"),
        *[F.md5(F.concat(F.col("text"), F.lit(str(i)))) for i in range(1, 4)],
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.to_binary(hexcol, F.lit("hex")).alias("content"),
    ).filter(F.col("content").isNotNull())  # NULL-content: no row (r13)
    return assets.mapInPandas(fake_scene_cuts, SCENE_CUT_SCHEMA)
