"""Degenerate-events robustness pins: the events battery over a corpus
with NULL ts / NULL user / NULL event_type / NULL value / negative /
exact-half-cent / 1e10-magnitude / duplicate-(user,ts) / singleton-user
rows (tools/make_degenerate_events.py, the SURVEY §12 item 0 recipe).

The driver fixture has ZERO such rows, so the oracle gate is blind to
this entire input class — and the r14 probe of it found 34/96 events
queries diverging or crashing. The repaired contract, pinned here:

- rule 10 (time_surface): events with a NULL ts are EXCLUDED from
  time-keyed queries on both engines — Spark `F.window` and DuckDB
  `time_bucket` place a NULL ts differently, and window ORDER BY
  defaults differ (Spark NULLS FIRST, DuckDB NULLS LAST), so every
  bucketing / session / daily fold / as-of scan / ts-ordered frame
  silently diverged.
- rule 11 (cents_clamped): second-moment queries winsorize to ±1e7
  cents — one 1e10-magnitude value overflowed the oracle's int64
  square and would abort the Spark job under ANSI.
- divide guards: rank-deficient OLS determinants, one-user arms, and
  zero-variance corpora emit NULL via NULLIF on both engines instead
  of DIVIDE_BY_ZERO job aborts (stats_ols_two_feature was a genuine
  100-TB job killer: one degenerate event_type group crashed the whole
  query under PySpark 4 ANSI defaults).
- identity exclusions: experiment-arm queries drop NULL user_id (an
  arm needs an identity; md5(NULL) diverged between engines), per-type
  daily folds drop NULL event_type (the oracle's recursive-CTE fold
  cannot follow a NULL join key while Spark's aggregate() HOF folds
  it), and scalar_inet_funcs drops NULL identities (DuckDB
  split_part(NULL) -> '' crashes the BIGINT cast; Spark -> NULL).
- PSI is Laplace-smoothed on both engines (a bucket present in one
  snapshot only was ln(0): oracle abort / -Infinity).
- grouped_apply_deviation's pandas kernel tolerates NULL values
  (NaN.astype(int64) aborted the job; output is nullable Int64).

Every query below runs the REAL builder against its REGISTERED oracle
over this corpus.
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

# The 34 queries the r14 probe caught red-handed (value divergence or
# engine crash on this corpus), now all repaired. Kept verbatim as the
# regression surface.
BATTERY = [
    "agg_incremental_merge", "anomaly_zscore_trailing",
    "dq_distribution_drift_psi", "event_ab_srm_drift_daily",
    "event_cuped_adjustment", "event_interval_merge",
    "event_sessionization_gap", "event_survival_kaplan_meier",
    "event_transition_bigrams", "event_trigram_paths",
    "forecast_holt_linear", "grouped_apply_deviation", "join_asof",
    "resample_m4_downsample", "scalar_inet_funcs", "scd2_history_build",
    "stats_acf_daily_lags", "stats_cusum_drift",
    "stats_ewma_control_chart", "stats_granger_lagged_daily",
    "stats_ols_two_feature", "stats_page_hinkley_drift",
    "stats_welch_ttest", "tw_session", "tw_sliding", "tw_tumbling",
    "window_analytic", "window_ewma", "window_frames",
    "window_gaps_islands", "window_median_sliding", "window_nth_value",
    "window_rolling_regression", "window_running_distinct",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from make_degenerate_events import build

    d = str(tmp_path_factory.mktemp("degenerate_events") / "sf")
    return build(d)


def _canon(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", BATTERY)
def test_events_battery_on_degenerate_corpus(spark, adv_dir, name):
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
    assert got == want, f"{name} diverges on the degenerate corpus"


def test_degenerate_corpus_contract_highlights(spark, adv_dir):
    """The load-bearing contract points, asserted directly."""
    # rule 10: the NULL-ts event (event_id 900001) appears in no
    # time-bucketed output — tw_tumbling covers every bucket.
    tw = QUERIES["tw_tumbling"].fn(spark, adv_dir).collect()
    assert all(r["window_start"] is not None for r in tw)

    # the OLS job SURVIVES the rank-deficient groups the corpus mints
    # (the pre-fix behavior was a whole-job ANSI DIVIDE_BY_ZERO abort)
    # and emits NULL coefficients for them instead.
    ols = {r["event_type"]: r["b0_cents"]
           for r in QUERIES["stats_ols_two_feature"].fn(
               spark, adv_dir).collect()}
    assert "error" in ols  # the 1e10-cents row's singleton-ish group ran

    # rule 11: the 1e10-magnitude value is winsorized, not propagated —
    # welch's means stay in clamped-cents range on both engines.
    welch = QUERIES["stats_welch_ttest"].fn(spark, adv_dir).collect()[0]
    assert abs(welch["mean_treatment_cents"]) <= 1e7 * 1.0
    assert abs(welch["mean_control_cents"]) <= 1e7 * 1.0

    # identity exclusion: the NULL-identity row reaches no /16 rollup.
    inet = QUERIES["scalar_inet_funcs"].fn(spark, adv_dir).collect()
    assert all(r["subnet_16"] is not None for r in inet)

    # smoothed PSI is finite on a corpus with one-snapshot-only buckets.
    import math
    psi = QUERIES["dq_distribution_drift_psi"].fn(
        spark, adv_dir).collect()
    assert psi and all(math.isfinite(r["psi"]) for r in psi)
