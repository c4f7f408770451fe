"""Custom Python operators on the Arrow batch path: a UDTF (table
function) and a grouped-map applyInPandas — the two extension shapes the
reference cannot host at all (DuckDB-extension users get only the three
registered C++ functions; arbitrary user logic means writing C++).

Both queries keep the cross-engine contract hash-exact by doing ONLY
integer/string math in Python: floats never cross the Python boundary, so
numpy summation order can't drift from DuckDB's.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table

CHUNK_WIDTH = 200
CHUNK_STRIDE = 150


@query(
    "text_chunk_udtf",
    oracle=f"""
    SELECT d.doc_id,
           CAST(off / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           substr(d.text, off + 1, {CHUNK_WIDTH}) AS chunk
    FROM documents d,
         LATERAL (SELECT unnest(generate_series(
                      0, GREATEST(len(d.text) - 1, 0), {CHUNK_STRIDE})) AS off)
    WHERE d.doc_id <= 100 AND d.text IS NOT NULL
    """,
    tags=("text", "udtf"),
)
def text_chunk_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking via a Python UDTF: each document explodes
    into overlapping fixed-width chunks (width {w}, stride {s}) — the
    standard prep step for embedding/training pipelines whose models have
    a context limit.

    Scale: a UDTF is a per-row generator on the Arrow path — no shuffle,
    no state; chunking 100 TB of text is embarrassingly parallel and this
    plan keeps it that way (lateral join to the generator, pure map
    stage). NULL text yields NO chunks (the generator's None-guard; the
    oracle filters the same docs — r13 adversarial-corpus pin), while
    empty text yields exactly one empty chunk on both engines.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk: string")
    class ChunkText:
        def eval(self, text: str):
            if text is None:
                return
            for i in range(0, max(len(text), 1), CHUNK_STRIDE):
                yield i // CHUNK_STRIDE, text[i:i + CHUNK_WIDTH]

    spark.udtf.register("chunk_text", ChunkText)
    d = table(spark, sf, "documents").filter(F.col("doc_id") <= 100)
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM {d} d, LATERAL chunk_text(d.text) c",
        d=d,
    )


text_chunk_udtf.__doc__ = text_chunk_udtf.__doc__.format(
    w=CHUNK_WIDTH, s=CHUNK_STRIDE
)


@query(
    "grouped_apply_deviation",
    oracle="""
    SELECT user_id, event_id,
           CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                * (COUNT(*) OVER w)
                - (SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w)
                AS BIGINT) AS dev_scaled
    FROM events
    WHERE user_id <= 30
    WINDOW w AS (PARTITION BY user_id)
    """,
    tags=("udf", "grouped"),
)
def grouped_apply_deviation(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user scaled deviation
    (value_cents * n_user - sum_cents_user — the z-score numerator kept
    in exact int64 so pandas and DuckDB agree bit-for-bit).

    Scale: applyInPandas shuffles once on the group key and hands each
    group to Python as one Arrow batch — the escape hatch for per-group
    logic Spark expressions can't state (sklearn fits, per-entity models).
    The cents quantization happens in Spark BEFORE Python so no float
    ever crosses the boundary.

    NULL-value contract (r14 degenerate-events probe): a NULL value
    reaches pandas as NaN, and the original ``astype("int64")`` raised
    IntCastingNaNError — ONE NULL value in a 100-TB corpus aborted the
    whole job. The oracle's window semantics are mirrored exactly:
    COUNT(*) counts the NULL row, SUM skips it, and its own dev_scaled
    is NULL (nullable Int64 out, so Arrow ships a proper NULL).
    """
    e = (
        table(spark, sf, "events")
        .filter(F.col("user_id") <= 30)
        .select("user_id", "event_id", cents(F.col("value")).alias("vc"))
    )

    def dev(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)  # COUNT(*): NULL rows included
        mask = pdf["vc"].notna().to_numpy()
        vals = pdf["vc"].to_numpy()[mask].astype("int64")
        s = int(vals.sum())  # SUM skips NULL, like the oracle window
        out = pd.array([None] * n, dtype="Int64")
        out[mask] = vals * n - s
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "dev_scaled": out,
            }
        )

    return e.groupBy("user_id").applyInPandas(
        dev, "user_id bigint, event_id bigint, dev_scaled bigint"
    )
