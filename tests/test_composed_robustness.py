"""Composed-degeneracy robustness pins (SURVEY §13 item 1b, pulled
forward into r14): EVERY fixture table degenerate at once
(tools/make_degenerate_all.py composes the events + lineitem/orders +
customer/supplier/part recipes with the documents and embeddings
adversarial rows), swept with the FULL 352-query oracle corpus.

The per-table sweeps cannot fire cross-table interactions or holes in
their own battery selection — and the composed sweep's first run found
exactly two, both repaired and pinned here:

- text_contamination_ngram (and pipeline_eval_holdout, same latent
  construction): the whole-doc fallback gram for a TOKEN-LESS doc was
  Spark `array_join([], ' ')` = a CONCRETE '' string — pairing every
  token-less test doc with every token-less train doc, and at 100 TB
  funneling them all into ONE join bucket — while DuckDB's
  `array_to_string([], ' ')` NULLed out and self-excluded. This is the
  r13 token-less SHINGLE class resurfacing in the contamination gram
  surface (the r13 docs battery did not cover these two queries, and
  the r13 12-doc corpus never placed a token-less doc in the test
  split). Token-less docs are now excluded from the gram surface on
  both engines; they still count as test/eval docs.
- sim_ann_pq_rerank: a NULL embedding made np.stack ragged and CRASHED
  the encode mapInPandas (one NULL row in 100 TB aborts the job); a
  zero-norm vector NaN-poisoned its own codes through 0/0
  normalization. The similarity_surface rule now applies.

The battery re-runs the repaired queries plus the most cross-table
queries (multi-dim TPC-H joins, graph projections, referential audits)
over the composed corpus.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

BATTERY = [
    # the two composed-sweep finds (+ the shared-construction twin)
    "text_contamination_ngram", "pipeline_eval_holdout",
    # cross-table: customer x orders x lineitem x dims, all degenerate
    "tpch_q3", "tpch_q5", "tpch_q10", "tpch_q18",
    "join_star_q9_profit", "graph_pagerank_bipartite",
    "dq_referential_orphans", "subquery_exists_in",
    # degenerate events x degenerate users
    "event_rfm_segmentation", "event_retention_cohorts",
    # docs + embeddings together
    "dedup_minhash_lsh", "sim_topk_bruteforce",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from make_degenerate_all import build

    d = str(tmp_path_factory.mktemp("degenerate_all") / "sf")
    return build(d)


def _canon(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", BATTERY)
def test_composed_battery(spark, adv_dir, name):
    spec = QUERIES[name]
    got = _canon(tuple(r) for r in spec.fn(spark, adv_dir).collect())
    con = duckdb.connect()
    try:
        for t in ("events", "orders", "lineitem", "customer", "nation",
                  "region", "supplier", "part", "documents",
                  "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{adv_dir}/{t}.parquet')")
        want = _canon(tuple(r)
                      for r in con.execute(spec.oracle).fetchall())
    finally:
        con.close()
    assert got == want, f"{name} diverges on the composed corpus"
    assert got, f"{name} lost its healthy rows on the composed corpus"


def test_pq_rerank_survives_composed_corpus(spark, adv_dir):
    """The rows-only PQ query (no oracle) must neither crash on the NULL
    embedding nor emit any degenerate vector as query or neighbor."""
    rows = QUERIES["sim_ann_pq_rerank"].fn(spark, adv_dir).collect()
    assert rows
    bad = {900001, 900002, 900003, 900004, 900005}
    assert not [r for r in rows
                if r["query_id"] in bad or r["neighbor_id"] in bad]


def test_tokenless_docs_cannot_contaminate(spark, adv_dir):
    """Direct contract assert: the punctuation-only test doc (900005)
    shares no gram with the whitespace-only train doc (900003) — the ''
    phantom gram is gone, but both docs still count in n_test_docs."""
    got = {r["source"]: (r["n_test_docs"], r["n_contaminated"])
           for r in QUERIES["text_contamination_ngram"].fn(
               spark, adv_dir).collect()}
    n_test, n_cont = got["src2"]
    assert n_test >= 2      # doc 900005 still counted as a test doc
    assert n_cont == 0      # but it cannot be "contaminated" via ''
