"""Training-data pipeline operators: dedup/similarity/multimodal invariants
that the DuckDB oracle can't express (recall vs. exact baseline, hamming
distance, Arrow batch plumbing)."""

import pytest
from pyspark.sql import functions as F

from wireduck_spark.functions.multimodal import (
    DECODE_SCHEMA, documents_as_assets, fake_decode_stats,
)
from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """MinHash est_jaccard within 0.45 of exact n-gram jaccard on shared
    pairs (8 permutations -> coarse but correlated)."""
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    assert est, "LSH should produce candidate pairs on this corpus"
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    shared = set(est) & set(exact)
    for pair in shared:
        assert abs(est[pair] - exact[pair]) <= 0.45


def test_simhash_range(spark, sf_dir):
    rows = QUERIES["dedup_simhash"].fn(spark, sf_dir).collect()
    assert all(0 <= r["simhash16"] < 65536 for r in rows)
    n_docs = QUERIES["dedup_exact"].fn(spark, sf_dir).count()
    assert len(rows) == n_docs


def test_ann_equals_bucket_restricted_exact(spark, sf_dir):
    """The testdata embeddings are isotropic (labels are not geometric
    clusters), so bucketed-ANN recall vs. global top-k is ~nprobe/nlist by
    theory — not a correctness signal. The correctness property is: the
    ANN result IS the exact top-k restricted to the probed bucket."""
    from pyspark.sql import Window

    from wireduck_spark.functions.similarity import (
        N_QUERY_VECS, TOP_K, cosine,
    )
    from wireduck_spark.registry import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("q_emb"),
    )
    restricted = (
        q.join(emb, (emb.label == F.col("qlabel")) & (emb.vec_id != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    expected = {
        (r["query_id"], r["neighbor_id"])
        for r in restricted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_ann_ivf_bucketed"].fn(spark, sf_dir).collect()
    }
    assert approx == expected
    assert len(approx) == N_QUERY_VECS * TOP_K


def test_multimodal_decode_batches(spark, sf_dir):
    assets = documents_as_assets(spark, sf_dir)
    out = assets.mapInPandas(fake_decode_stats, schema=DECODE_SCHEMA)
    rows = out.collect()
    assert len(rows) == assets.count()
    r = rows[0]
    assert r["byte_len"] == 16  # md5 -> 16 bytes
    assert 0 <= r["first_byte"] <= 255
    assert 0 <= r["checksum_mod"] < 251


def test_binary_column_roundtrip(spark, sf_dir):
    assets = documents_as_assets(spark, sf_dir)
    row = assets.select("content").first()
    assert isinstance(row["content"], bytearray | bytes)
    assert len(row["content"]) == 16


def test_cluster_components_reliable_checkpoint(spark, sf_dir, tmp_path):
    """checkpoint_dir switches lineage truncation from localCheckpoint to
    reliable checkpoint() files, with identical cluster output (the 100-TB
    path: a lost executor replays from storage instead of failing)."""
    from wireduck_spark.functions.dedup import dedup_cluster_components

    ckdir = tmp_path / "ckpt"
    base = dedup_cluster_components(spark, sf_dir).collect()
    rel = dedup_cluster_components(
        spark, sf_dir, checkpoint_dir=str(ckdir)
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, rel))
    assert any(ckdir.rglob("*")), "no reliable checkpoint files written"


def test_embedding_cosine_lsh_recovers_planted_duplicates(spark, tmp_path):
    """The r12 LSH-bucketed candidate generator's load-bearing property:
    GENUINE near-duplicates (cosine ~0.999) collide in at least one of
    the 4x8 hyperplane tables with overwhelming probability, so the
    per-label top-3 shortlist recovers every planted pair. The driver
    fixture cannot test this (its random embeddings max out at cosine
    ~0.51 — no true near-dups exist, and at those angles LSH correctly
    prunes most pairs); this planted frame is the production regime the
    rewrite exists for."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wireduck_spark.functions.dedup import dedup_embedding_cosine

    rng = np.random.RandomState(7)
    vec_id, label, emb = [], [], []
    planted = {}  # label -> set of (vec_a, vec_b), vec_a < vec_b
    for lab in (0, 1):
        # ids lab*14 + 0..11 are random bases; +12/+13 are near-dup
        # copies of bases 0 and 1.
        base = rng.randn(12, 64)
        for i in range(12):
            vec_id.append(lab * 14 + i)
            label.append(lab)
            emb.append(base[i].astype("float32"))
        for i in range(2):
            dup = base[i] + 0.01 * rng.randn(64)
            vec_id.append(lab * 14 + 12 + i)
            label.append(lab)
            emb.append(dup.astype("float32"))
        planted[lab] = {(lab * 14 + i, lab * 14 + 12 + i) for i in range(2)}
    sf = tmp_path / "planted_sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array(vec_id, pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float32())),
            "label": pa.array(label, pa.int32()),
        }),
        str(sf / "embeddings.parquet"),
    )
    out = dedup_embedding_cosine(spark, str(sf)).collect()
    got = {(r["label"], r["vec_a"], r["vec_b"]): r["cos_sim"] for r in out}
    for lab in (0, 1):
        for (a, b) in planted[lab]:
            assert (lab, a, b) in got, (
                f"planted near-dup pair {(a, b)} in label {lab} missing "
                f"from the LSH shortlist: {sorted(got)}")
            assert got[(lab, a, b)] > 0.99


def test_bpe_train_reliable_checkpoint(spark, sf_dir, tmp_path):
    """VERDICT r11 #2: _bpe_train hard-coded localCheckpoint while its
    docstring claimed the reliable variant threads like
    dedup_cluster_components'. checkpoint_dir= now exists: a reliable
    dir must yield the identical merge table AND write checkpoint files
    (on a real cluster an executor lost mid-10-round-chain replays from
    storage, not from deliberately-truncated lineage)."""
    from wireduck_spark.functions.text import text_bpe_train_merges

    ckdir = tmp_path / "bpe_ckpt"
    base = text_bpe_train_merges(spark, sf_dir).collect()
    rel = text_bpe_train_merges(
        spark, sf_dir, checkpoint_dir=str(ckdir)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, rel))
    assert any(ckdir.rglob("*")), "BPE chain wrote no reliable checkpoint"


def test_minhash_lsh_threads_checkpoint_dir(spark, sf_dir, tmp_path):
    """ADVICE r9: dedup_cluster_components(checkpoint_dir=...) used to call
    dedup_minhash_lsh with an UNCONDITIONAL localCheckpoint inside, so an
    executor lost during the LSH stage still killed the query on a real
    cluster. The kwarg now threads through: a reliable dir must produce
    checkpoint files from the LSH call itself, with identical pairs."""
    from wireduck_spark.functions.dedup import dedup_minhash_lsh

    ckdir = tmp_path / "lsh_ckpt"
    base = dedup_minhash_lsh(spark, sf_dir).collect()
    rel = dedup_minhash_lsh(
        spark, sf_dir, checkpoint_dir=str(ckdir)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, rel))
    assert any(ckdir.rglob("*")), "LSH stage wrote no reliable checkpoint"


# ---------------------------------------------------------------------------
# Parameterized SemDeDup engine (functions/curation.py)
# ---------------------------------------------------------------------------

def _planted_qv(spark, sf_dir):
    """Embeddings + exact copies of every 50th vector, quantized — the
    planted-duplicate protocol shared with the oracle-checked gate row."""
    from wireduck_spark.functions.curation import _quantize
    from wireduck_spark.registry import table

    emb = table(spark, sf_dir, "embeddings")
    aug = emb.select("vec_id", "embedding").unionAll(
        emb.filter(F.col("vec_id") % 50 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    return aug.select("vec_id", _quantize(F.col("embedding")).alias("g"))


def test_semantic_kmeans_scaled_drops_planted_duplicates(spark, sf_dir):
    """The scale configuration (k=sqrt(n), k-means|| seeding, LSH-routed
    assignment) must assign EVERY vector and flag EVERY planted exact
    copy: identical vectors get identical distances, the deterministic
    tie-break puts both in the same cluster, and cosine=1 >= 0.9."""
    from wireduck_spark.functions.curation import semantic_kmeans_dedup

    qv = _planted_qv(spark, sf_dir)
    n_total = qv.count()
    flags = semantic_kmeans_dedup(
        qv, k=None, rounds=2, seeding="kmeanspar", assignment="lsh"
    ).collect()
    assert len(flags) == n_total  # every vector assigned exactly once
    dropped = {r.vec_id for r in flags if r.dropped}
    planted = {r.vec_id for r in flags if r.vec_id >= 1000000}
    assert planted, "fixture should plant duplicates"
    assert planted <= dropped, "every planted exact copy must be flagged"


def test_semantic_kmeans_explicit_k_and_determinism(spark, sf_dir):
    """k= is honored (cluster ids stay < k) and two runs of the same
    configuration produce identical assignments/flags — no rand(), no
    partition-order dependence."""
    from wireduck_spark.functions.curation import semantic_kmeans_dedup

    qv = _planted_qv(spark, sf_dir)
    k = 7
    run = lambda: sorted(
        map(tuple, semantic_kmeans_dedup(
            qv, k=k, rounds=2, seeding="spread", assignment="lsh"
        ).collect())
    )
    first = run()
    assert first == run()
    assert {t[1] for t in first} <= set(range(k))


def test_semantic_kmeans_lsh_matches_broadcast_assignment(spark, sf_dir):
    """Sanity on the routed path: with candidate routing + brute-force
    residual fallback, every vec_id appears exactly once (no dup rows
    from multi-table collisions, no vector lost between the two arms)."""
    from wireduck_spark.functions.curation import (
        _assign_nearest, _seed_centroids, semantic_kmeans_dedup,
    )

    qv = _planted_qv(spark, sf_dir)
    cents = _seed_centroids(qv, 10, "spread")
    routed = _assign_nearest(qv, cents, "lsh")
    ids = [r.vec_id for r in routed.select("vec_id").collect()]
    assert len(ids) == len(set(ids)) == qv.count()


def test_audio_frame_energy_ragged_fallback(spark):
    """Ragged / null / short content must take the per-row path and agree
    with the vectorized path's semantics (truncate to whole frames)."""
    import pandas as pd

    from wireduck_spark.functions.multimodal import (
        AUDIO_ENERGY_SCHEMA, AUDIO_FRAME_LEN, fake_audio_frame_energy,
    )

    long_b = bytes(range(AUDIO_FRAME_LEN)) + bytes([7] * 10)  # 1 frame + tail
    pdf = pd.DataFrame(
        {
            "asset_id": [1, 2, 3],
            "content": [long_b, None, b"\x02" * (AUDIO_FRAME_LEN - 1)],
        }
    )
    out = pd.concat(list(fake_audio_frame_energy(iter([pdf]))))
    by_id = {int(r.asset_id): r for r in out.itertuples()}
    expect_e = sum(x * x for x in range(AUDIO_FRAME_LEN))
    assert by_id[1].n_frames == 1
    assert by_id[1].n_samples == AUDIO_FRAME_LEN  # tail truncated
    assert by_id[1].total_energy == expect_e
    assert by_id[1].max_frame_energy == expect_e
    assert by_id[1].max_frame_idx == 0
    assert by_id[2].n_frames == 0 and by_id[2].max_frame_idx == -1
    assert by_id[3].n_frames == 0  # below one frame -> no frames
    # schema contract: column names match the declared struct
    assert list(out.columns) == [f.name for f in AUDIO_ENERGY_SCHEMA.fields]


def test_pca_power_iteration_matches_numpy_replay(spark, sf_dir):
    """embed_pca_top_component's distributed iteration is integer-exact
    between driver-side normalizations, so a numpy replay of the SAME
    quantized algorithm must agree EXACTLY (no tolerance): same grid
    quantization (Spark ROUND = half-up), same truncating `div`, same
    serial-order float normalization on the driver."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from wireduck_spark.functions.curation import pca_power_iteration
    from wireduck_spark.registry import table

    def half_up(y):
        return np.sign(y) * np.floor(np.abs(y) + 0.5)

    def tdiv(a, b):  # Spark's `div`: truncation toward zero
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    emb = np.stack(
        [np.asarray(e, dtype=np.float64) for e in
         t.column("embedding").to_pylist()]
    )
    g = half_up(emb * 1000.0).astype(np.int64)
    n, d = g.shape
    mu = np.array([tdiv(int(g[:, j].sum()), n) for j in range(d)],
                  dtype=np.int64)
    gc = g - mu
    v = [1_000_000] * d
    for _ in range(8):
        s = np.array(
            [tdiv(int((gc[i] * np.array(v, dtype=np.int64)).sum()),
                  100000) for i in range(n)],
            dtype=np.int64,
        )
        w = [int((gc[:, j] * s).sum()) for j in range(d)]
        norm = math.sqrt(sum(float(x) * float(x) for x in w))
        if norm == 0:
            break
        v = [int(round(1_000_000 * float(x) / norm)) for x in w]

    e = table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    qv = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "x")
    ).select(
        "vec_id", "dim",
        F.round(F.col("x").cast("double") * 1000, 0).cast("bigint")
        .alias("g"),
    )
    v_spark, lam, trace = pca_power_iteration(qv)
    assert v_spark == v  # exact integer equality, all 64 loadings
    assert trace == int((gc.astype(object) ** 2).sum())
    assert 0 < lam < trace


def test_pca_two_components_match_numpy_replay(spark, sf_dir):
    """pca_components with Hotelling deflation must equal the numpy
    replay EXACTLY for both components: the deflation is pure int64
    ((s*v) div VV with truncating div), so the second iteration's
    input grid — and therefore its loadings — admit no tolerance."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from wireduck_spark.functions.curation import pca_components
    from wireduck_spark.registry import table

    def half_up(y):
        return np.sign(y) * np.floor(np.abs(y) + 0.5)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    emb = np.stack(
        [np.asarray(e, dtype=np.float64) for e in
         t.column("embedding").to_pylist()]
    )
    g = half_up(emb * 1000.0).astype(np.int64)
    n, d = g.shape
    mu = np.array([tdiv(int(g[:, j].sum()), n) for j in range(d)],
                  dtype=np.int64)
    gc = g - mu

    def power(mat):
        v = [1_000_000] * d
        for _ in range(8):
            s = np.array(
                [tdiv(int((mat[i] * np.array(v, dtype=np.int64)).sum()),
                      100000) for i in range(n)], dtype=np.int64)
            w = [int((mat[:, j] * s).sum()) for j in range(d)]
            norm = math.sqrt(sum(float(x) * float(x) for x in w))
            if norm == 0:
                break
            v = [int(round(1_000_000 * float(x) / norm)) for x in w]
        return v

    v1 = power(gc)
    va = np.array(v1, dtype=np.int64)
    vv = int((va.astype(object) ** 2).sum())
    defl = gc.copy()
    for i in range(n):
        s_full = int((gc[i].astype(object) * va.astype(object)).sum())
        defl[i] = gc[i] - np.array(
            [tdiv(s_full * int(va[j]), vv) for j in range(d)],
            dtype=np.int64)
    v2 = power(defl)

    e = table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    qv = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "x")
    ).select(
        "vec_id", "dim",
        F.round(F.col("x").cast("double") * 1000, 0).cast("bigint")
        .alias("g"),
    )
    comps, trace = pca_components(qv, n_components=2)
    assert comps[0][0] == v1
    assert comps[1][0] == v2
    # Eigenvalue sanity: both positive, far below trace. NOT asserted:
    # lambda_2 < lambda_1 — on these near-isotropic synthetic embeddings
    # the eigengap is tiny, so 8 fixed iterations leave v1 slightly
    # unconverged and the post-deflation Rayleigh quotient can edge past
    # it (measured 13.53M vs 13.06M); the loadings above are still
    # EXACTLY reproducible, which is the determinism contract.
    assert 0 < comps[0][1] < trace
    assert 0 < comps[1][1] < trace
    assert comps[1][1] < comps[0][1] * 1.2


# -- round-8: weighted-PageRank invariants -----------------------------------


def test_pagerank_suppliers_mass_conservation(spark, sf_dir):
    """Total rank mass is conserved up to floor-division truncation: after
    any number of hops, sum(rank) over ALL nodes stays within N_nodes *
    (teleport truncation + per-edge div loss) of RANK_SCALE. The top-25
    output is a slice, so this re-runs the loop body's final table via
    the registered query's building blocks: mass conservation is the
    canonical PageRank sanity check (a leak means the damping or degree
    arithmetic is wrong)."""
    from pyspark.sql import functions as F

    from wireduck_spark.operators.graph import (
        DAMP_DEN, DAMP_NUM, PRS_ITERS, RANK_SCALE,
    )
    from wireduck_spark.registry import table

    l = table(spark, sf_dir, "lineitem")
    ps = l.groupBy(
        (F.col("l_partkey") * 2).alias("pnode"),
        (F.col("l_suppkey") * 2 + 1).alias("snode"),
    ).agg(F.count("*").cast("bigint").alias("w"))
    edges = ps.select(F.col("pnode").alias("src"),
                      F.col("snode").alias("dst"), "w").unionAll(
        ps.select(F.col("snode").alias("src"),
                  F.col("pnode").alias("dst"), "w"))
    wdeg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wd"))
    e = edges.join(wdeg, "src").select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst"),
        F.col("w").alias("e_w"), F.col("wd").alias("e_wd"))
    nodes = e.select(F.col("e_src").alias("node")).distinct()
    n_nodes = nodes.count()
    base = (15 * RANK_SCALE) // (100 * n_nodes)
    ranks = nodes.withColumn("rank",
                             F.lit(RANK_SCALE // n_nodes).cast("long"))
    # max deficit per hop: teleport truncation (N * <100/N-ulp) plus one
    # unit of div loss per (node's) outgoing edge-group term; bound
    # loosely by N * 100 + total directed edges
    n_edges = e.count()
    tol = n_nodes * 100 + n_edges
    for _ in range(PRS_ITERS):
        contrib = ranks.join(e, ranks.node == e.e_src).select(
            F.col("e_dst").alias("node"),
            F.expr(f"(`rank` * {DAMP_NUM} * e_w)"
                   f" div ({DAMP_DEN} * e_wd)").alias("c"))
        ranks = contrib.groupBy("node").agg(
            (F.lit(base) + F.sum("c")).cast("long").alias("rank"))
        mass = ranks.agg(F.sum("rank")).collect()[0][0]
        assert RANK_SCALE - tol <= mass <= RANK_SCALE, (
            f"rank mass leaked: {mass} vs {RANK_SCALE} (tol {tol})")


def test_pagerank_suppliers_matches_volume_intuition(spark, sf_dir):
    """The top supplier by weighted PageRank must be one whose total
    shipment volume (weighted degree) is in the top decile — PageRank
    refines volume ranking with part importance, it cannot contradict
    it outright on a bipartite graph."""
    from pyspark.sql import functions as F

    from wireduck_spark.registry import QUERIES, table

    top = QUERIES["graph_pagerank_suppliers"].fn(spark, sf_dir).collect()
    assert 1 <= len(top) <= 25  # sf0.001 has only ~10 suppliers
    assert all(r["rank_ppm"] >= 0 for r in top)
    best = top[0]["suppkey"]
    l = table(spark, sf_dir, "lineitem")
    vol = (l.groupBy("l_suppkey").agg(F.count("*").alias("v"))
           .orderBy(F.desc("v"), "l_suppkey").collect())
    decile = max(1, len(vol) // 10)
    assert best in {r["l_suppkey"] for r in vol[:decile]}, (
        f"top PageRank supplier {best} not in top volume decile")


# -- round-8 continuation: label spreading + rank-statistic invariants -------


def test_label_spread_partitions_all_strong_tie_nodes(spark, sf_dir):
    """Every node of the strong-tie graph ends up in exactly one
    community: per-side n_nodes sums match the distinct node counts of
    the w>=2 edge list, labels stay in the nation domain, and no
    customer is left unlabeled (hop 1 reaches every node with an edge).
    n_native can never exceed the community size."""
    from wireduck_spark.registry import QUERIES, table

    rows = QUERIES["graph_label_spread_nation"].fn(spark, sf_dir).collect()
    assert rows, "label spread returned no communities"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    strong = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.countDistinct("o_orderkey").alias("w"))
        .filter(F.col("w") >= 2)
    )
    n_cust = strong.select("o_custkey").distinct().count()
    n_supp = strong.select("l_suppkey").distinct().count()
    got = {"customer": 0, "supplier": 0}
    for r in rows:
        assert r["nation_label"] is not None, "unlabeled community emitted"
        assert 0 <= r["nation_label"] <= 24
        assert 0 <= r["n_native"] <= r["n_nodes"]
        got[r["side"]] += r["n_nodes"]
    assert got["customer"] == n_cust
    assert got["supplier"] == n_supp


def test_roc_auc_antisymmetry_and_rational_consistency(spark, sf_dir):
    """The registered AUC row is internally consistent (auc ==
    num2/den2 to 6 dp, counts partition the users) and the rank-sum
    machinery satisfies the defining antisymmetry: scoring by -score
    must give exactly 1 - AUC (same ties, mirrored ranks)."""
    from wireduck_spark.operators.relational import _global_midrank2
    from wireduck_spark.registry import QUERIES, table

    r = QUERIES["stats_roc_auc"].fn(spark, sf_dir).collect()[0]
    n_users = (table(spark, sf_dir, "events")
               .select("user_id").distinct().count())
    assert r["n_pos"] + r["n_neg"] == n_users
    assert r["auc_den2"] == 2 * r["n_pos"] * r["n_neg"]
    assert 0 <= r["auc_num2"] <= r["auc_den2"]
    # auc is ROUND(.., 6) of the rational — agree to half an ulp of 6 dp
    assert abs(r["auc"] - r["auc_num2"] / r["auc_den2"]) <= 5e-7

    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint").alias("score"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .alias("label"),
    )

    def auc_of(col):
        lab = per_user.select("user_id", col.alias("s"), "label")
        mid = _global_midrank2(lab, "s", "user_id", keep=("label",))
        m = mid.agg(
            F.sum(1 - F.col("label")).alias("n0"),
            F.sum("label").alias("n1"),
            F.sum(F.when(F.col("label") == 1, F.col("midrank2"))
                  .otherwise(0)).alias("r1_2"),
        ).collect()[0]
        return (m["r1_2"] - m["n1"] * (m["n1"] + 1), 2 * m["n0"] * m["n1"])

    fwd_num, den = auc_of(F.col("score"))
    rev_num, den2 = auc_of(-F.col("score"))
    assert den == den2
    assert fwd_num + rev_num == den, (
        f"AUC antisymmetry broken: {fwd_num} + {rev_num} != {den}")


def test_spearman_exact_on_monotone_transforms(spark, sf_dir):
    """Spearman is defined by ranks alone: rho(x, x^3-ish monotone
    transform) == 1.0 exactly and rho(x, -x) == -1.0 exactly, ties and
    all — computed through the same midrank fold the registered query
    uses. The registered row itself must land in [-1, 1]."""
    from wireduck_spark.operators.relational import _global_midrank2
    from wireduck_spark.registry import QUERIES, table

    r = QUERIES["stats_spearman_corr"].fn(spark, sf_dir).collect()[0]
    assert -1.0 <= r["spearman_rho"] <= 1.0
    assert r["n"] > 0

    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("x"))

    def rho(ycol):
        sv = s.select("sk", "x", ycol.cast("bigint").alias("y"))
        rx = _global_midrank2(sv, "x", "sk", keep=("sk",)).select(
            "sk", F.col("midrank2").alias("x2"))
        ry = _global_midrank2(sv, "y", "sk", keep=("sk",)).select(
            "sk", F.col("midrank2").alias("y2"))
        m = rx.join(ry, "sk").agg(
            F.count("*").alias("n"), F.sum("x2").alias("sx"),
            F.sum("y2").alias("sy"),
            F.sum(F.col("x2") * F.col("y2")).alias("sxy"),
            F.sum(F.col("x2") * F.col("x2")).alias("sxx"),
            F.sum(F.col("y2") * F.col("y2")).alias("syy"),
        ).collect()[0]
        num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
        den = ((m["n"] * m["sxx"] - m["sx"] ** 2)
               * (m["n"] * m["syy"] - m["sy"] ** 2)) ** 0.5
        return num / den

    # x -> x*3+7 is strictly monotone: identical ranks, rho exactly 1;
    # x -> -x mirrors ranks (ties included), rho exactly -1.
    assert rho(F.col("x") * 3 + 7) == pytest.approx(1.0, abs=1e-12)
    assert rho(-F.col("x")) == pytest.approx(-1.0, abs=1e-12)


def test_brier_calibration_decomposes_exactly(spark, sf_dir):
    """Bins partition the users; the exact integer Brier numerators
    re-aggregate to a global score in [0, 1]; rates and predictions are
    proper probabilities."""
    from wireduck_spark.registry import QUERIES, table

    rows = QUERIES["stats_brier_calibration"].fn(spark, sf_dir).collect()
    assert rows and all(0 <= r["bin"] <= 9 for r in rows)
    n_users = (table(spark, sf_dir, "events")
               .select("user_id").distinct().count())
    assert sum(r["n"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n"]
        assert 0.0 <= r["obs_rate"] <= 1.0
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert 0.0 <= r["brier"] <= 1.0
        assert 0 <= r["sq_err_num"]
    total_sq = sum(r["sq_err_num"] for r in rows)
    total_n = sum(r["n"] for r in rows)
    # global Brier from the exact per-bin integers: recompute maxc from
    # per-bin consistency (brier = sq/(n*maxc^2) within rounding)
    import math
    r0 = max(rows, key=lambda r: r["sq_err_num"])
    if r0["brier"] > 0:
        maxc2 = r0["sq_err_num"] / (r0["n"] * r0["brier"])
        global_brier = total_sq / (total_n * maxc2)
        assert 0.0 <= global_brier <= 1.0 + 1e-6
        assert not math.isnan(global_brier)


def test_quantile_normalize_aligns_every_source(spark, sf_dir):
    """The whole point of quantile normalization: after it, every
    source's distribution is (discretely) uniform — median lands near
    500000 ppm and the global 900000 threshold selects ~10% of EVERY
    source, no matter how the raw n_chars distributions differ.
    Tolerances are generous for tiny per-source counts at sf0.001."""
    from wireduck_spark.registry import QUERIES, table

    rows = QUERIES["curation_quantile_normalize"].fn(
        spark, sf_dir).collect()
    n_sources = (table(spark, sf_dir, "documents")
                 .select("source").distinct().count())
    assert len(rows) == n_sources
    for r in rows:
        assert r["n_docs"] > 0
        # uniform-in-[0,1e6] mean is 500000; discrete midranks keep the
        # exact mean at 500000*(n+? )/n-ish — bound loosely
        mean_ppm = r["sum_norm_ppm"] / r["n_docs"]
        assert 400000 <= mean_ppm <= 600000, r
        assert 350000 <= r["med_norm_ppm"] <= 650000, r
        frac_top = r["n_top_decile"] / r["n_docs"]
        assert frac_top <= 0.25, r  # ~10% by construction, never a flood


def test_rank_stats_degrade_to_null_on_degenerate_inputs(spark, tmp_path):
    """The NDCG n_rel=0 lesson applied up front: one-class labels
    (everyone's spend equal => nobody above the median), zero-click
    corpora, and zero-variance rank vectors must DEGRADE (NULL / p=0
    bins), not crash or mint engine-specific inf/NaN. Runs the real
    registered builders against constructed degenerate parquet."""
    import datetime

    from wireduck_spark.registry import QUERIES

    d = str(tmp_path)
    ts = datetime.datetime(2024, 1, 1)
    # 4 users, one equal-value purchase each, zero clicks
    ev = spark.createDataFrame(
        [(i, ts, i, "purchase", 5.0, "{}") for i in range(4)],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING",
    )
    ev.write.parquet(f"{d}/events.parquet")

    r = QUERIES["stats_roc_auc"].fn(spark, d).collect()[0]
    assert r["n_pos"] == 0 and r["auc_den2"] == 0
    assert r["auc"] is None

    rows = QUERIES["stats_brier_calibration"].fn(spark, d).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0  # everyone at p=0
    assert rows[0]["n"] == 4

    # 3 suppliers with identical shipped volume -> zero-variance y ranks
    sup = spark.createDataFrame(
        [(i, 100.0 + i) for i in range(1, 4)],
        "s_suppkey BIGINT, s_acctbal DOUBLE",
    )
    li = spark.createDataFrame(
        [(i, 7.0) for i in range(1, 4)],
        "l_suppkey BIGINT, l_quantity DOUBLE",
    )
    sup.write.parquet(f"{d}/supplier.parquet")
    li.write.parquet(f"{d}/lineitem.parquet")
    s = QUERIES["stats_spearman_corr"].fn(spark, d).collect()[0]
    assert s["n"] == 3
    assert s["spearman_rho"] is None

    ap = QUERIES["stats_pr_auc_average_precision"].fn(
        spark, d).collect()[0]
    assert ap["n_pos"] == 0 and ap["ap_scaled_sum"] == 0
    assert ap["average_precision"] is None


def test_average_precision_perfect_and_inverted_rankings(spark, tmp_path):
    """AP is 1.0 exactly when every positive outranks every negative,
    and hits its analytic minimum when the ranking is inverted: for 2
    positives at the bottom of 4 ((1/3 + 2/4)/2), AP = 0.416666 at the
    query's 6-dp rounding. Constructed parquet drives the real builder;
    the registered row at the fixture scale must sit in (0, 1]."""
    import datetime

    from wireduck_spark.registry import QUERIES

    ts = datetime.datetime(2024, 1, 1)

    def make(dirname, clicks_by_user):
        d = str(tmp_path / dirname)
        rows = []
        eid = 0
        for u, (n_clicks, purch) in clicks_by_user.items():
            rows.append((eid, ts, u, "purchase", purch, "{}")); eid += 1
            for _ in range(n_clicks):
                rows.append((eid, ts, u, "click", 1.0, "{}")); eid += 1
        spark.createDataFrame(
            rows,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
            " event_type STRING, value DOUBLE, props STRING",
        ).write.parquet(f"{d}/events.parquet")
        return d

    # positives (purch 10.0 > median 5.5) get MORE clicks -> ranked first
    perfect = make("ap_perfect", {1: (5, 10.0), 2: (4, 10.0),
                                  3: (2, 1.0), 4: (1, 1.0)})
    r = QUERIES["stats_pr_auc_average_precision"].fn(
        spark, perfect).collect()[0]
    assert (r["n_users"], r["n_pos"]) == (4, 2)
    assert r["average_precision"] == 1.0

    # positives get FEWER clicks -> ranked last: AP = (1/3 + 2/4) / 2
    inverted = make("ap_inverted", {1: (1, 10.0), 2: (2, 10.0),
                                    3: (4, 1.0), 4: (5, 1.0)})
    r = QUERIES["stats_pr_auc_average_precision"].fn(
        spark, inverted).collect()[0]
    assert r["n_pos"] == 2
    assert r["average_precision"] == pytest.approx(
        (1 / 3 + 2 / 4) / 2, abs=1e-6)


def test_iterative_graph_reliable_checkpoint_equivalence(spark, sf_dir,
                                                         tmp_path):
    """Round-8 VERDICT #3: localCheckpoint stores blocks on executors —
    on a real cluster one lost executor kills an 8-hop iterative query.
    Both iterative graph queries now accept checkpoint_dir= (reliable
    df.checkpoint into fault-tolerant storage, mirroring
    dedup_cluster_components); the reliable path must converge to
    output IDENTICAL to the default local path."""
    from wireduck_spark.operators.graph import (
        graph_label_spread_nation, graph_pagerank_suppliers,
    )

    ckpt = str(tmp_path / "reliable_ckpt")
    for fn in (graph_pagerank_suppliers, graph_label_spread_nation):
        local = [tuple(r) for r in fn(spark, sf_dir).collect()]
        reliable = [tuple(r)
                    for r in fn(spark, sf_dir, checkpoint_dir=ckpt).collect()]
        assert local == reliable, fn.__name__
        assert local, f"{fn.__name__} returned no rows"


def test_burstiness_vmr_matches_bruteforce(spark, sf_dir):
    """Re-derive one term's VMR and Church-Gale burstiness from raw
    per-doc counts in Python (including zero-docs) — the algebraic
    identity var*n = (n*ss - s*s)/n used by the query must agree with
    the direct two-pass computation, and burstiness = total/df >= 1."""
    import re

    from wireduck_spark.registry import QUERIES, table

    out = {r["term"]: r
           for r in QUERIES["text_burstiness_vmr"].fn(spark, sf_dir)
           .collect()}
    assert out, "no term reached the 20-occurrence floor"
    term = sorted(out)[0]
    docs = [r["text"] for r in
            table(spark, sf_dir, "documents").select("text").collect()]
    counts = [len(re.findall(r"[a-z0-9]+", t.lower()))
              and sum(1 for w in re.findall(r"[a-z0-9]+", t.lower())
                      if w == term)
              for t in docs]
    n = len(counts)
    s = sum(counts)
    mean = s / n
    var = sum((c - mean) ** 2 for c in counts) / n
    r = out[term]
    assert r["total_count"] == s
    assert r["df"] == sum(1 for c in counts if c > 0)
    assert abs(r["vmr"] - var / mean) < 1e-3
    assert r["burstiness"] == round(s / r["df"], 4)
    assert r["burstiness"] >= 1
    # every reported term: VMR positive, df <= n
    for t, row in out.items():
        assert row["vmr"] > 0 and 0 < row["df"] <= n


def test_bpe_train_merges_matches_python_replay(spark, sf_dir):
    """Replay the full BPE trainer in pure Python (the reference
    Sennrich merge loop over the distinct-word frequency table:
    left-to-right simultaneous merge, argmax with (count DESC, p1 ASC,
    p2 ASC) tiebreak) and require EXACT equality of the learned merge
    table — symbols and counts — with the Spark plan's output."""
    import re

    from wireduck_spark.registry import QUERIES, table

    d = table(spark, sf_dir, "documents")
    words = {}
    for r in d.select("text").collect():
        for w in re.split(r"[^a-z]+", r["text"].lower()):
            if len(w) >= 2:
                words[w] = words.get(w, 0) + 1

    segs = {w: list(w) for w in words}
    expected = []
    for step in range(1, 11):
        counts = {}
        for w, syms in segs.items():
            c = words[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        (p1, p2), c = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expected.append((step, p1, p2, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out

    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in QUERIES["text_bpe_train_merges"].fn(spark, sf_dir).collect()
    ]
    assert got == expected
    # the hierarchy property that makes this a TRAINER, not a pair
    # count: some later merge must consume an earlier merge's output
    merged = {p1 + p2 for _, p1, p2, _ in got}
    assert any(p1 in merged or p2 in merged for _, p1, p2, _ in got), \
        "no hierarchical merge in 10 steps — fixture degenerate?"


def test_bpe_segment_compression_matches_python_replay(spark, sf_dir):
    """Replay the apply side: run the same Python Sennrich loop, then
    compute the compression stats from the final segmentations and
    require exact equality (ints exact; the ratio re-derived with the
    same float division and 4-dp round)."""
    import re

    from wireduck_spark.registry import QUERIES, table

    d = table(spark, sf_dir, "documents")
    words = {}
    for r in d.select("text").collect():
        for w in re.split(r"[^a-z]+", r["text"].lower()):
            if len(w) >= 2:
                words[w] = words.get(w, 0) + 1
    segs = {w: list(w) for w in words}
    for step in range(10):
        counts = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        (p1, p2), _ = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out

    chars_total = sum(words[w] * len(w) for w in words)
    tokens_total = sum(words[w] * len(s) for w, s in segs.items())
    [r] = QUERIES["text_bpe_segment_compression"].fn(
        spark, sf_dir).collect()
    assert r["n_distinct_words"] == len(words)
    assert r["words_total"] == sum(words.values())
    assert r["chars_total"] == chars_total
    assert r["tokens_total"] == tokens_total
    assert r["chars_per_token"] == round(chars_total / tokens_total, 4)
    assert r["tokens_total"] < r["chars_total"], \
        "10 merges bought no compression — fixture degenerate?"
