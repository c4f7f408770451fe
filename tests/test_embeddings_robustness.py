"""Degenerate-embedding robustness pins: the similarity battery over a
corpus containing zero vectors, NULL embeddings, and a NULL label.

The fixture has none of these, and the r13 probe found the whole sim_*
query family CRASHING Spark-side on the zero vector — ANSI
DIVIDE_BY_ZERO in the cosine's norm product — which at 100 TB means one
all-zero embedding aborts the entire job. The pinned contract
(`similarity_surface` / `DUCK_EMB_SURFACE`): NULL and zero-norm
embeddings are excluded from the similarity surface on both engines —
the embeddings analogue of the token-less-document shingle exclusion.

r14 closes the rest of the battery (VERDICT r13 + ADVICE):
- dedup_embedding_cosine joins the surface rule — a zero-norm vector
  hashes to a concrete all-ones LSH bucket in EVERY table, so two
  same-label zero vectors (900001/900004 below, deliberately colliding)
  were a guaranteed candidate pair whose cosine is 0/0: a job abort the
  earlier corpus missed by fixture luck (one zero vector per label).
- dedup_semantic_kmeans / embed_centroid_spread exclude NULL embeddings
  on both engines (a NULL vector has no position): the oracles' UNNEST
  silently dropped them / minted 64 phantom NULL rows while Spark
  disagreed, hash-diverging the rollups. Zero vectors STAY in both
  (legitimate grid points in pure-L2/integer-cosine space — no divide).
"""

from __future__ import annotations

import os

import duckdb
import pytest

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

SIM_BATTERY = [
    "sim_topk_bruteforce",
    "sim_ann_ivf_bucketed",
    "sim_ann_hyperplane_lsh",
    "sim_range_search_lsh",
    "dedup_embedding_cosine",
    # r14: the two NULL-embedding value-divergence repairs. Zero
    # vectors remain first-class rows for both (no cosine divide).
    "dedup_semantic_kmeans",
    "embed_centroid_spread",
]


@pytest.fixture(scope="module")
def adv_emb_dir(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("degenerate_embeddings")
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            os.symlink(os.path.join(sf_dir, f), d / f)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])
    extra = spark.createDataFrame(
        [
            (900001, [0.0] * dim, 0),     # zero vector: cosine 0/0
            (900002, None, 0),            # NULL embedding
            (900003, [0.0] * dim, None),  # zero vector + NULL label
            # r14 (ADVICE): a SECOND same-label zero vector — 900001 and
            # 900004 collide in every LSH table (identical all-ones
            # buckets), the guaranteed-candidate 0/0 pair the earlier
            # corpus missed by fixture luck — plus a second NULL
            # embedding in the same label for bucket-asymmetry cover.
            (900004, [0.0] * dim, 0),
            (900005, None, 0),
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    base.unionByName(extra).coalesce(1).write.parquet(
        str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", SIM_BATTERY)
def test_similarity_battery_on_degenerate_embeddings(
        spark, adv_emb_dir, name):
    """Each query must neither crash nor diverge from its oracle when
    zero-norm / NULL embeddings are present."""
    spec = QUERIES[name]
    # key=repr: NULL-label rows make mixed None/int tuples unsortable
    got = sorted(
        (tuple(round(v, 6) if isinstance(v, float) else v for v in r)
         for r in spec.fn(spark, adv_emb_dir).collect()), key=repr)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{adv_emb_dir}/embeddings.parquet/*.parquet')")
        want = sorted(
            (tuple(round(v, 6) if isinstance(v, float) else v for v in r)
             for r in con.execute(spec.oracle).fetchall()), key=repr)
    finally:
        con.close()
    assert got == want, f"{name} diverges on degenerate embeddings"
    assert got, f"{name} must still produce rows for the healthy vectors"


def test_degenerate_vectors_are_excluded_from_the_surface(
        spark, adv_emb_dir):
    """The contract, asserted directly: no output row references the
    zero-norm or NULL vectors on either side of any sim query — and the
    guaranteed same-label zero-vector collision pair (900001, 900004)
    never reaches the dedup cosine (pre-fix: an ANSI DIVIDE_BY_ZERO
    job abort)."""
    bad = {900001, 900002, 900003, 900004, 900005}
    rows = QUERIES["sim_topk_bruteforce"].fn(spark, adv_emb_dir).collect()
    assert not [r for r in rows
                if r["query_id"] in bad or r["neighbor_id"] in bad]
    pairs = QUERIES["dedup_embedding_cosine"].fn(
        spark, adv_emb_dir).collect()
    assert not [r for r in pairs
                if r["vec_a"] in bad or r["vec_b"] in bad]
