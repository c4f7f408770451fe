"""Real-encoder seam proof (round-7 VERDICT #6): the fake md5 embedding
in pipeline_rag_chunk_index is a documented swap-point — these tests swap
in a tiny REAL encoder (a numpy hashing-trick byte-trigram vectorizer
inside an Arrow-batched pandas_udf) through the `rag_chunk_index`
embed_dims seam and prove the routing + inventory stages are untouched:
same schema, same embedding-independent invariants, deterministic.

No new container deps: numpy + pandas + Arrow are baked in, so the test
is NOT skip-gated. A GPU sentence-encoder drops in the same way (replace
the vectorizer body; the seam contract and plan shape are identical).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wireduck_spark.registry import QUERIES, load_all_queries, table

load_all_queries()


def _ngram_hash_dims_udf():
    """Hashing-trick byte-trigram vectorizer, pure numpy, as an
    Arrow-batched pandas_udf: each trigram hashes (Knuth multiplicative)
    into one of 4 integer dims. Stands in for a real encoder —
    deterministic, content-sensitive, non-md5. Built lazily: pandas_udf
    type parsing needs an active session."""

    @F.pandas_udf("array<long>")
    def _ngram_hash_dims(chunks: pd.Series) -> pd.Series:
        import numpy as np

        def vec(s: str) -> list[int]:
            v = np.zeros(4, dtype=np.int64)
            b = (s or "").encode("utf-8", "ignore")
            for i in range(len(b) - 2):
                h = (int.from_bytes(b[i:i + 3], "big")
                     * 2654435761) % (1 << 32)
                v[h & 3] += h >> 16
            return [int(x) for x in v]

        return chunks.map(vec)

    return _ngram_hash_dims


def _real_encoder(chunks):
    """Seam-contract implementation backed by the pandas_udf above."""
    e = chunks.withColumn("dims", _ngram_hash_dims_udf()("chunk"))
    return e.select(
        "doc_id", "source",
        F.length("chunk").alias("chunk_len"),
        *[F.element_at("dims", k + 1).alias(f"d{k + 1}") for k in range(4)],
    )


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_seam_runs_and_keeps_schema(spark, docs):
    from wireduck_spark.functions.packing import rag_chunk_index

    default = rag_chunk_index(docs)
    swapped = rag_chunk_index(docs, embed_dims=_real_encoder)
    assert swapped.schema == default.schema
    rows = swapped.collect()
    assert rows, "real-encoder pipeline produced no inventory rows"
    assert all(0 <= r["bucket"] <= 3 for r in rows)


def test_seam_preserves_embedding_independent_invariants(spark, docs):
    """Chunk counts and char totals are decided by the CHUNKING stage;
    an encoder swap may only re-route chunks across buckets, never
    create/destroy/resize them."""
    from wireduck_spark.functions.packing import rag_chunk_index

    def totals(df):
        r = df.agg(
            F.sum("n_chunks").alias("c"),
            F.sum("sum_chars").alias("s"),
        ).collect()[0]
        return r["c"], r["s"]

    assert totals(rag_chunk_index(docs)) == totals(
        rag_chunk_index(docs, embed_dims=_real_encoder))


def test_seam_encoder_is_deterministic(spark, docs):
    from wireduck_spark.functions.packing import rag_chunk_index

    def snap(df):
        return sorted(map(tuple, df.collect()))

    a = snap(rag_chunk_index(docs, embed_dims=_real_encoder))
    b = snap(rag_chunk_index(docs, embed_dims=_real_encoder))
    assert a == b


def test_registered_query_still_uses_default_seam(spark, sf_dir):
    """The registered query's result is byte-identical to calling the
    seam with the default encoder — the refactor changed no behavior."""
    from wireduck_spark.functions.packing import rag_chunk_index

    got = sorted(map(tuple,
                     QUERIES["pipeline_rag_chunk_index"].fn(spark, sf_dir)
                     .collect()))
    want = sorted(map(tuple,
                      rag_chunk_index(table(spark, sf_dir, "documents"))
                      .collect()))
    assert got == want
