"""Degenerate-document robustness pins: the documents battery over a
corpus of NULL / empty / whitespace-only / punctuation-only / unicode /
single-token / duplicated docs.

The driver fixture has ZERO such docs (min 47 chars, no NULLs), so the
oracle gate is blind to this entire input class — and the r13 probe of
it found five real defects: Spark's array_join([], ' ') minted a
concrete '' shingle that paired every token-less doc (and would funnel
them all into ONE LSH band bucket at 100 TB — quadratic pair blowup)
while DuckDB's array_to_string([], ' ') NULLed out and self-excluded;
the text_fingerprint oracle folded NULL text to the empty-string hash
0; text_chunk_udtf's oracle emitted a phantom NULL chunk the UDTF's
None-guard skips; io_binaryfile_ingest CRASHED encoding NULL text and
Spark's binaryFile source silently skips the zero-byte assets the
oracle counted; and four mm_* queries diverged between Python -1/0
sentinels and SQL NULL propagation on NULL content.

The pinned contract: token-less docs are excluded from the shingle
surface, NULL text yields NULL fingerprints and no chunks, and
NULL/empty-content assets yield no rows. Every query below runs the
REAL builder against its REGISTERED oracle over this corpus.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

# One doc per degenerate class; docs 8/9 are exact duplicates and the
# only legitimate near-dup pair.
DOCS = [
    (1, None, "en", "src0", 0),
    (2, "", "en", "src0", 0),
    (3, "   ", "en", "src1", 3),
    (4, "a", "en", "src1", 1),
    (5, "!!! ??? ...", "en", "src2", 11),
    (6, "héllo wörld 你好世界 🎉 café", "zh", "src2", 24),
    (7, "spam spam spam spam spam spam spam spam spam spam", "en",
     "src0", 50),
    (8, "the quick brown fox jumps over the lazy dog near a riverbank"
        " today", "en", "src1", 67),
    (9, "the quick brown fox jumps over the lazy dog near a riverbank"
        " today", "en", "src2", 67),
    (10, "supercalifragilisticexpialidociousantidisestablishmentarianism",
     "en", "src0", 62),
    (11, "data query spark table row group sort key order fast slow"
         " index scan merge join", "en", "src1", 80),
    (12, "\n\ttabs and\n\nnewlines\n", "en", "src2", 20),
]

# The battery: every query the r13 probe exercised that reads documents
# and carries an oracle, including all five repaired ones and the
# shingle-sharing family.
BATTERY = [
    "dedup_exact", "dedup_simhash", "dedup_paragraph_exact",
    "dedup_keep_best", "dedup_minhash_lsh", "dedup_minhash_calibration",
    "dedup_ngram_jaccard", "dedup_ngram_containment",
    "text_fingerprint", "text_langid", "text_quality_score",
    "text_token_count", "text_heavy_hitters", "text_chunk_udtf",
    "text_source_novelty", "io_binaryfile_ingest",
    "mm_binary_metadata", "mm_decode_features", "mm_frame_sample",
    "mm_resize_stub", "mm_audio_frame_energy", "mm_video_scene_cut",
    "mm_asset_dedup", "sampling_stable_split",
]


@pytest.fixture(scope="module")
def adv_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_docs")
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(sf_dir, f), d / f)
    df = spark.createDataFrame(
        DOCS, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
              "n_chars BIGINT")
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _canon(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", BATTERY)
def test_documents_battery_on_degenerate_corpus(spark, adv_dir, name):
    spec = QUERIES[name]
    got = _canon(tuple(r) for r in spec.fn(spark, adv_dir).collect())
    con = duckdb.connect()
    try:
        for t in ("documents", "events", "orders", "lineitem",
                  "customer", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{adv_dir}/{t}.parquet/*.parquet', "
                f"union_by_name=true)"
                if os.path.isdir(f"{adv_dir}/{t}.parquet")
                else f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{adv_dir}/{t}.parquet')")
        want = _canon(tuple(r)
                      for r in con.execute(spec.oracle).fetchall())
    finally:
        con.close()
    assert got == want, f"{name} diverges on the degenerate corpus"


def test_degenerate_corpus_contract_highlights(spark, adv_dir):
    """The load-bearing contract points, asserted directly: token-less
    docs produce NO minhash pairs among themselves (docs 1/2/3/5 used
    to pair with est=1.0), the exact-duplicate pair still surfaces,
    NULL text fingerprints as NULL/NULL, and the chunker emits nothing
    for NULL text but one empty chunk for empty text."""
    lsh = {(r["doc_a"], r["doc_b"])
           for r in QUERIES["dedup_minhash_lsh"].fn(spark, adv_dir)
           .collect()}
    assert (8, 9) in lsh
    degenerate = {1, 2, 3, 5}
    assert not [p for p in lsh if set(p) <= degenerate]

    fp = {r["doc_id"]: (r["norm_md5"], r["poly_hash"])
          for r in QUERIES["text_fingerprint"].fn(spark, adv_dir)
          .collect()}
    assert fp[1] == (None, None)
    assert fp[2][1] == 0  # empty text legitimately hashes to the seed

    chunks = {}
    for r in QUERIES["text_chunk_udtf"].fn(spark, adv_dir).collect():
        chunks.setdefault(r["doc_id"], []).append(r["chunk"])
    assert 1 not in chunks            # NULL text: no chunks
    assert chunks[2] == [""]          # empty text: one empty chunk
