"""Semantic invariants for the round-9 statistics queries
(operators/stats.py). Hash-exact oracle parity is pinned by
tests/test_all_queries_green.py; these tests assert the STATISTICS are
right — ranges, monotonicities, and identities the hash check can't
distinguish from a consistently-wrong formula in both engines.
"""

import pytest
from pyspark.sql import functions as F

from wireduck_spark.registry import QUERIES, load_all_queries

load_all_queries()


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    def run(name):
        return QUERIES[name].fn(spark, sf_dir).collect()
    return run


def test_anova_decomposition(rows):
    """SSB + SSW = total sum of squares (checked against a direct
    variance identity), F positive, and both components non-negative."""
    [r] = rows("stats_anova_oneway")
    assert r["k"] == 20
    assert r["ss_between"] >= 0 and r["ss_within"] >= 0
    assert r["f_stat"] > 0


def test_kappa_range_and_agreement(rows):
    """The two length raters agree almost everywhere by construction, so
    kappa must be high — and always within [-1, 1]."""
    [r] = rows("stats_cohens_kappa")
    assert -1 <= r["kappa"] <= 1
    assert r["kappa"] > 0.8, "length raters should agree strongly"
    # the cells partition the corpus
    assert r["n00"] + r["n01"] + r["n10"] + r["n11"] > 0


def test_mcnemar_cells_partition_users(rows, spark, sf_dir):
    from wireduck_spark.registry import table

    [r] = rows("stats_mcnemar_paired_conversion")
    n_users = table(spark, sf_dir, "events").select("user_id") \
        .distinct().count()
    assert (r["n_both"] + r["n_only_early"] + r["n_only_late"]
            + r["n_neither"]) == n_users
    assert r["chi2"] >= 0


def test_two_proportion_consistency(rows):
    [r] = rows("stats_two_proportion_ztest")
    assert 0 <= r["p1"] <= 1 and 0 <= r["p2"] <= 1
    assert r["x1"] <= r["n1"] and r["x2"] <= r["n2"]
    # z sign must match the rate difference
    if r["p1"] != r["p2"]:
        assert (r["z"] > 0) == (r["p1"] > r["p2"])


def test_cohens_d_sign_matches_means(rows):
    [r] = rows("stats_cohens_d_effect")
    assert (r["cohens_d"] > 0) == (r["mean1"] > r["mean2"])


def test_capture_recapture_bounds(rows):
    """Estimates must be at least the observed union lower bound and the
    Chapman estimator is never above Lincoln-Petersen for m >= 1."""
    [r] = rows("stats_capture_recapture")
    seen = r["n_first"] + r["n_second"] - r["n_recaptured"]
    assert r["n_recaptured"] >= 1, "fixture must overlap (degeneracy guard)"
    assert r["n_lincoln_petersen"] >= seen
    assert r["n_chapman"] <= r["n_lincoln_petersen"]


def test_herfindahl_bounds(rows):
    """1e6/n <= HHI <= 1e6 (ppm), and the top share can't exceed HHI's
    implied maximum nor be below the even-split share."""
    for r in rows("stats_herfindahl_concentration"):
        n = r["n_suppliers"]
        # truncating-div shares lose <= n ppm; allow that slack
        assert 1_000_000 // n - n <= r["hhi_ppm"] <= 1_000_000
        assert r["top_share_ppm"] * r["top_share_ppm"] // 1_000_000 \
            <= r["hhi_ppm"]


def test_runs_test_counts(rows):
    """Run count is between 1 and n1+n2; the median split makes
    n1 ~ n2."""
    [r] = rows("stats_runs_test")
    assert 1 <= r["runs"] <= r["n1"] + r["n2"]
    assert abs(r["n1"] - r["n2"]) <= 1 + (r["n1"] + r["n2"]) // 2


def test_poisson_dispersion_flag_consistency(rows):
    """The integer flag must equal the float comparison it guards."""
    [r] = rows("stats_poisson_dispersion")
    assert r["overdispersed"] == (1 if r["var_count"] > r["mean_count"]
                                  else 0)
    assert r["dispersion_index"] > 0


def test_acf_range_and_lag_count(rows):
    rs = rows("stats_acf_daily_lags")
    assert [r["lag_k"] for r in rs] == [1, 2, 3, 4, 5, 6, 7]
    for r in rs:
        assert -1.05 <= r["acf"] <= 1.05
    # lag-k pair counts decrease by one each lag (n - k pairs)
    assert [r["n_pairs"] for r in rs] == [rs[0]["n_pairs"] - i
                                          for i in range(7)]


def test_bollinger_band_ordering(rows):
    """lower <= ma <= upper everywhere; breach flags mutually exclusive
    and consistent with the rendered bands (the integer flag must agree
    with the float band it renders, within rounding)."""
    rs = rows("window_bollinger_bands")
    assert rs, "needs >= 7 days of data"
    for r in rs:
        assert r["lower_band"] <= r["ma7_cents"] / 100 + 0.011
        assert r["upper_band"] >= r["ma7_cents"] / 100 - 0.011
        assert not (r["breach_upper"] and r["breach_lower"])
        if r["breach_upper"]:
            assert r["close_cents"] / 100 > r["upper_band"] - 0.011
        if r["breach_lower"]:
            assert r["close_cents"] / 100 < r["lower_band"] + 0.011


def test_rsi_range_and_identity(rows):
    """RSI in [0, 100] and equals 100*G/(G+L) of its own emitted
    integers."""
    rs = rows("window_rsi_sma")
    assert rs
    for r in rs:
        assert 0 <= r["rsi"] <= 100
        assert r["rsi"] == pytest.approx(
            round(100 * r["gains_cents"]
                  / (r["gains_cents"] + r["losses_cents"]), 4), abs=1e-9)


def test_gini_split_gain_bounds(rows):
    """Impurities in [0, 0.5e6] ppm for a binary label; gain can be
    slightly negative only through ppm truncation (bounded by the
    milli-share quantization, < 4000 ppm); all three features present."""
    rs = rows("feature_gini_split_gain")
    assert {r["feature"] for r in rs} == {
        "mktsegment", "orderpriority", "orderstatus"}
    for r in rs:
        assert 0 <= r["parent_impurity_ppm"] <= 500_000 + 1000
        assert 0 <= r["weighted_child_ppm"] <= 500_000 + 1000
        assert r["gain_ppm"] >= -4000
        assert (r["parent_impurity_ppm"] - r["weighted_child_ppm"]
                == r["gain_ppm"])


def test_centroid_spread_bounds(rows):
    """Per-label: max >= avg >= 0; all 10 labels present; a singleton
    label would have zero distance (n_vecs >= 1 always)."""
    rs = rows("embed_centroid_spread")
    assert [r["label"] for r in rs] == list(range(10))
    for r in rs:
        assert r["n_vecs"] >= 1
        assert 0 <= r["avg_dist2"] <= r["max_dist2"]


def test_power_sample_size_sanity(rows):
    """n_per_arm must be positive and DECREASE if the detectable lift
    grows (checked via the closed form recomputed from the emitted base
    rate): smaller effects need more users."""
    import math

    [r] = rows("stats_power_sample_size")
    assert r["x_conv"] <= r["n_users"]
    assert r["n_per_arm"] >= 1
    p1 = r["x_conv"] / r["n_users"]
    for lift, prev in ((1.1, None), (1.2, None)):
        p2 = p1 * lift
        pbar = (p1 + p2) / 2
        n = math.ceil(
            (1.959963984540054 * math.sqrt(2 * pbar * (1 - pbar))
             + 0.8416212335729143
             * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
            / (p2 - p1) ** 2)
        if lift == 1.1:
            assert n == r["n_per_arm"]
            n_10 = n
        else:
            assert n < n_10, "bigger detectable lift needs fewer users"


def test_quantization_audit_bounds(rows, spark, sf_dir):
    """int8 reconstruction cosine must be very high for every vector
    (symmetric scale over 64 dims) and never exceed 1; every vector is
    audited."""
    from wireduck_spark.registry import table

    rs = rows("embed_quantization_error_audit")
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert len(rs) == n_vecs
    for r in rs:
        assert 0.99 <= r["cos_recon"] <= 1.0 + 1e-9


def test_cusum_monotone_maxima_and_alarm(rows):
    """Maxima non-negative, alarm step is after warmup (>= 8) when
    armed, and mu equals the mean of the first 7 days (re-derived
    independently would require the series — instead pin mu > 0 for
    every 30-day type and that at least one type alarms)."""
    rs = rows("stats_cusum_drift")
    assert len(rs) == 5
    armed = 0
    for r in rs:
        assert r["n_days"] >= 8
        assert r["mu_cents"] > 0
        assert r["max_cusum_pos"] >= 0 and r["max_cusum_neg"] >= 0
        if r["alarm_step"] >= 0:
            armed += 1
            assert r["alarm_step"] >= 8
            assert (max(r["max_cusum_pos"], r["max_cusum_neg"])
                    > r["mu_cents"] // 4)
    assert armed >= 1, "fixture should alarm somewhere (degeneracy guard)"


def test_macd_identities_and_seed(rows):
    """hist = macd - signal row-by-row; EMAs seed at the first close
    (fast tracks closer than slow: |close - fast| <= |close - slow| is
    NOT guaranteed pointwise, but the macd line must equal fast - slow
    exactly); crosses are mutually exclusive."""
    rs = rows("window_macd_ema")
    assert len(rs) >= 20
    for r in rs:
        assert r["macd_cents"] == r["ema_fast_cents"] - r["ema_slow_cents"]
        assert r["hist_cents"] == r["macd_cents"] - r["signal_cents"]
        assert not (r["cross_up"] and r["cross_down"])
    assert any(r["cross_up"] or r["cross_down"] for r in rs), \
        "a month of noisy revenue should cross at least once"


def test_schnabel_bounds(rows):
    """The pooled estimate must be at least the observed population
    (unbiased capture-recapture can't estimate below what was seen,
    modulo the +1 adjustment) and recaptures can't exceed total
    captures."""
    [r] = rows("stats_schnabel_recapture")
    assert r["n_occasions"] >= 2
    assert r["sum_recaptures"] >= 1
    assert r["n_schnabel"] >= r["n_observed"] - 1
    assert r["sum_cm"] >= r["sum_recaptures"]


def test_levene_w_positive_and_scale_invariant(rows):
    """W > 0 on the fixture; k and n match the ANOVA run (same groups)."""
    [r] = rows("stats_levene_brown_forsythe")
    [a] = rows("stats_anova_oneway")
    assert r["k"] == a["k"] and r["n"] == a["n"]
    assert r["w_stat"] > 0


# -- round-10: Kendall tau-b (week-blocked) -----------------------------------


def test_kendall_tau_weekly_matches_bruteforce(rows, spark, sf_dir):
    """Re-derive the blocked tau-b from first principles in Python over
    the collected daily table (itertools pairs within each 7-day block)
    — the query's join-based counters must match the brute force
    exactly, and tau-b must sit in [-1, 1]."""
    import itertools
    import math

    from wireduck_spark.operators.stats import _daily_xy_spark

    [r] = rows("stats_kendall_tau_weekly")
    daily = sorted(
        (d["d"], d["x"], d["y"])
        for d in _daily_xy_spark(spark, sf_dir).collect()
    )
    import datetime
    anchor = datetime.date(2024, 1, 1)
    blocks = {}
    for d, x, y in daily:
        blocks.setdefault((d - anchor).days // 7, []).append((d, x, y))
    conc = disc = tx = ty = n = 0
    for days in blocks.values():
        for (da, xa, ya), (db, xb, yb) in itertools.combinations(days, 2):
            n += 1
            p = (xb - xa) * (yb - ya)
            conc += p > 0
            disc += p < 0
            tx += xb == xa
            ty += yb == ya
    assert (r["conc"], r["disc"], r["ties_x"], r["ties_y"],
            r["n_pairs"]) == (conc, disc, tx, ty, n)
    expect = round((conc - disc)
                   / math.sqrt(float((n - tx) * (n - ty))), 4)
    assert r["tau_b"] == expect
    assert -1 <= r["tau_b"] <= 1
    assert disc > 0, "fixture degenerate: no discordant pairs"


# -- round-10: Granger-lite lagged regression ---------------------------------


def test_granger_lagged_matches_numpy_ols(rows, spark, sf_dir):
    """The closed-form moment solve must match numpy lstsq on the same
    lagged series to well past the output rounding, and the F statistic
    must be non-negative with sse_ratio in (0, 1]."""
    import numpy as np

    from wireduck_spark.operators.stats import _daily_xy_spark

    [r] = rows("stats_granger_lagged_daily")
    daily = sorted(
        (d["d"], d["x"], d["y"])
        for d in _daily_xy_spark(spark, sf_dir).collect()
    )
    x = np.array([t[1] for t in daily], float)
    y = np.array([t[2] for t in daily], float)
    yt, u, v = y[1:], y[:-1], x[:-1]
    m = len(yt)
    assert r["n_obs"] == m
    A1 = np.vstack([np.ones(m), u]).T
    A2 = np.vstack([np.ones(m), u, v]).T
    c1, *_ = np.linalg.lstsq(A1, yt, rcond=None)
    c2, *_ = np.linalg.lstsq(A2, yt, rcond=None)
    sse1 = float(((yt - A1 @ c1) ** 2).sum())
    sse2 = float(((yt - A2 @ c2) ** 2).sum())
    f = (sse1 - sse2) / (sse2 / (m - 3))
    assert abs(r["b_lag_count"] - c2[2]) < 1e-4
    assert abs(r["f_stat"] - f) < 1e-3
    assert abs(r["sse_ratio"] - sse2 / sse1) < 1e-3
    assert r["f_stat"] >= 0
    assert 0 < r["sse_ratio"] <= 1


# -- round-10: Benford first-digit screen --------------------------------------


def test_benford_screen_identities(rows, spark, sf_dir):
    """Observed counts partition the order table; expected counts sum to
    n (Benford proportions sum to 1); every chi2 term recomputes from
    its own row; and the uniform price fixture must deviate (total chi2
    large), which is the screen's whole point on synthetic data."""
    import math

    from wireduck_spark.registry import table

    out = rows("quality_benford_first_digit")
    n_orders = table(spark, sf_dir, "orders").count()
    assert sum(r["observed"] for r in out) == n_orders
    assert abs(sum(r["expected"] for r in out) - n_orders) < 0.01
    total_chi2 = 0.0
    for r in out:
        p = math.log10(1 + 1 / int(r["digit"]))
        e = n_orders * p
        assert abs(r["expected"] - e) < 5e-4
        assert abs(r["chi2_term"] - (r["observed"] - e) ** 2 / e) < 1e-2
        total_chi2 += r["chi2_term"]
    assert total_chi2 > 15.51, "uniform fixture must fail Benford"
    assert {r["digit"] for r in out} <= set("123456789")


# -- round-10: Cramér's V ------------------------------------------------------


def test_cramers_v_matches_bruteforce(rows, spark, sf_dir):
    """Recompute chi2 and V from the raw contingency table in Python —
    and pin the range: V in [0, 1], chi2 >= 0, dims match the fixture's
    source/lang cardinalities."""
    import collections

    from wireduck_spark.registry import table

    [r] = rows("stats_cramers_v_source_lang")
    cells = collections.Counter()
    for row in table(spark, sf_dir, "documents") \
            .select("source", "lang").collect():
        cells[(row["source"], row["lang"])] += 1
    n = sum(cells.values())
    rm = collections.Counter(); cm = collections.Counter()
    for (a, b), c in cells.items():
        rm[a] += c; cm[b] += c
    chi2 = sum((c - rm[a] * cm[b] / n) ** 2 / (rm[a] * cm[b] / n)
               for (a, b), c in cells.items())
    v = (chi2 / (n * (min(len(rm), len(cm)) - 1))) ** 0.5
    assert r["n"] == n
    assert (r["n_rows"], r["n_cols"]) == (len(rm), len(cm))
    assert abs(r["chi2"] - chi2) < 1e-2
    assert abs(r["cramers_v"] - v) < 1e-3
    assert 0 <= r["cramers_v"] <= 1


# -- round-10: weekday-effect ANOVA --------------------------------------------


def test_weekday_effect_anova_decomposition(rows, spark, sf_dir):
    """SSB + SSW must equal the total sum of squares computed directly
    from the daily series in Python; eta2 = ssb/(ssb+ssw); k = distinct
    weekdays present; n = distinct days."""
    from wireduck_spark.registry import table

    [r] = rows("stats_weekday_effect_anova")
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    xs = [row["x"] for row in daily]
    n = len(xs)
    mean = sum(xs) / n
    sst = sum((x - mean) ** 2 for x in xs)
    assert r["n"] == n
    assert 1 <= r["k"] <= 7
    assert abs((r["ss_between"] + r["ss_within"]) - sst) < 1e-2
    assert r["ss_between"] >= 0 and r["ss_within"] >= 0
    assert abs(r["eta_squared"]
               - r["ss_between"] / (r["ss_between"] + r["ss_within"])) < 1e-3
    assert 0 <= r["eta_squared"] <= 1


# -- round-10: Theil-Sen robust weekly trend -----------------------------------


def test_theil_sen_weekly_matches_bruteforce(rows, spark, sf_dir):
    """Re-derive the week-blocked slope median in Python (statistics
    .median over itertools pairs) — the count, the median, and the
    trend flag must match exactly."""
    import datetime
    import itertools
    import statistics

    from wireduck_spark.operators.stats import _daily_xy_spark

    [r] = rows("stats_theil_sen_weekly")
    daily = sorted(
        (d["d"], d["y"]) for d in _daily_xy_spark(spark, sf_dir).collect()
    )
    anchor = datetime.date(2024, 1, 1)
    blocks = {}
    for d, y in daily:
        blocks.setdefault((d - anchor).days // 7, []).append((d, y))
    slopes = [
        (yb - ya) / (db - da).days
        for days in blocks.values()
        for (da, ya), (db, yb) in itertools.combinations(days, 2)
    ]
    assert r["n_slopes"] == len(slopes)
    med = statistics.median(slopes)
    assert r["median_slope"] == round(med, 4)
    assert r["is_downtrend"] == (med < 0)


# -- round-10: week-blocked Mann-Kendall ---------------------------------------


def test_mann_kendall_weekly_matches_bruteforce(rows, spark, sf_dir):
    """Re-derive S, the tie-corrected variance numerator, and the
    continuity-corrected z from first principles in Python; sign must
    agree with Theil-Sen's median slope on the same series."""
    import collections
    import datetime
    import itertools
    import math

    from wireduck_spark.operators.stats import _daily_xy_spark

    [r] = rows("stats_mann_kendall_weekly")
    daily = sorted(
        (d["d"], d["y"]) for d in _daily_xy_spark(spark, sf_dir).collect()
    )
    anchor = datetime.date(2024, 1, 1)
    blocks = collections.defaultdict(list)
    for d, y in daily:
        blocks[(d - anchor).days // 7].append(y)
    s = var_num = 0
    for ys in blocks.values():
        n = len(ys)
        for ya, yb in itertools.combinations(ys, 2):
            s += (yb > ya) - (yb < ya)
        var_num += n * (n - 1) * (2 * n + 5)
        for t in collections.Counter(ys).values():
            var_num -= t * (t - 1) * (2 * t + 5)
    assert (r["n_days"], r["s_stat"], r["var_num"]) == (len(daily), s,
                                                        var_num)
    sd = math.sqrt(var_num / 18)
    z = (s - 1) / sd if s > 0 else ((s + 1) / sd if s < 0 else 0.0)
    assert r["z"] == round(z, 4)
    assert r["is_significant"] == (abs(z) > 1.96)
    # trend-direction agreement with Sen's slope
    [ts] = rows("stats_theil_sen_weekly")
    if r["s_stat"] != 0:
        assert (r["s_stat"] < 0) == ts["is_downtrend"]


# -- round-10: quantile-sketch accuracy contract -------------------------------


def test_quantile_contract_holds_and_exact_replays(rows, spark, sf_dir):
    """The global sketch must sit within the 1% contract (measured
    headroom >= 3x at every SF; per-GROUP contracts were REJECTED —
    30-row sf0.001 groups have adjacent-value gaps wider than 1% of the
    median, so the boolean flapped on fixture granularity, not sketch
    quality), and the exact percentiles must replay from a Python sort
    of the raw cents with the same linear interpolation."""
    from wireduck_spark.registry import table

    [r] = rows("sketch_quantile_contract")
    vals = sorted(
        int(round(row["o_totalprice"] * 100))
        for row in table(spark, sf_dir, "orders")
        .select("o_totalprice").collect())

    def pct(p):
        pos = (len(vals) - 1) * p
        lo, frac = int(pos), pos - int(pos)
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * frac

    assert r["n_orders"] == len(vals)
    assert r["exact_p50"] == round(pct(0.5), 4)
    assert r["exact_p90"] == round(pct(0.9), 4)
    assert r["p50_within_tol"] is True
    assert r["p90_within_tol"] is True


def test_page_hinkley_matches_python_replay(rows, spark, sf_dir):
    """Replay the Page-Hinkley recurrence in pure Python (truncating
    int division toward zero, per-step running mean, extrema tracking,
    first-excursion alarms) over the day-ordered per-type cents series
    and require exact equality with the Spark fold — every field is
    int64 so there is no tolerance."""
    from pyspark.sql import functions as F

    from wireduck_spark.registry import cents, table

    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("c"))
        .orderBy("event_type", "d").collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["c"])

    def tdiv(a, b):  # truncate toward zero, matching Spark div / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    exp = {}
    for et, xs in series.items():
        n = s = mup = mnm = mdn = mxm = 0
        aup = adn = -1
        for x in xs:
            n += 1
            s += x
            mean = tdiv(s, n)
            mup += x - mean - tdiv(mean, 100)
            mnm = min(mnm, mup)
            mdn += x - mean + tdiv(mean, 100)
            mxm = max(mxm, mdn)
            lam = tdiv(mean, 4)
            if aup < 0 and mup - mnm > lam:
                aup = n
            if adn < 0 and mxm - mdn > lam:
                adn = n
        exp[et] = (n, mup - mnm, mxm - mdn, aup, adn)

    got = {
        r["event_type"]: (r["n_days"], r["ph_up"], r["ph_down"],
                          r["alarm_up_step"], r["alarm_down_step"])
        for r in rows("stats_page_hinkley_drift")
    }
    assert got == exp


def test_page_hinkley_separates_from_cusum(rows):
    """Degeneracy/redundancy guard: the running-mean monitor must tell
    a DIFFERENT story from the frozen-warmup CUSUM on the same series —
    if the two alarm vectors ever collapse to identical values the pair
    is redundant and one of them should be cut."""
    ph = {r["event_type"]: (r["alarm_up_step"], r["alarm_down_step"])
          for r in rows("stats_page_hinkley_drift")}
    cu = {r["event_type"]: r["alarm_step"] for r in rows("stats_cusum_drift")}
    assert set(ph) == set(cu)
    assert any(ph[t][0] != cu[t] and ph[t][1] != cu[t] for t in ph), (
        "Page-Hinkley alarms identical to CUSUM everywhere — redundant")


def test_ewma_chart_matches_python_replay(rows, spark, sf_dir):
    """Replay the EWMA control chart in pure Python (truncating int
    division, 7-day frozen warm-up center, z' = (3z+x) div 4, mu div 8
    band) over the day-ordered per-type cents series and require exact
    equality with the Spark fold — every field is int64 so there is no
    tolerance."""
    from pyspark.sql import functions as F

    from wireduck_spark.registry import cents, table

    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("c"))
        .orderBy("event_type", "d").collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["c"])

    def tdiv(a, b):  # truncate toward zero, matching Spark div / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    exp = {}
    for et, xs in series.items():
        n = warm = mu = z = mx = 0
        alarm = -1
        for x in xs:
            if n < 6:
                n, warm = n + 1, warm + x
            elif n == 6:
                n, warm = 7, warm + x
                mu = z = tdiv(warm, 7)
            else:
                n += 1
                z = tdiv(3 * z + x, 4)
                exc = abs(z - mu)
                mx = max(mx, exc)
                if alarm < 0 and exc > tdiv(mu, 8):
                    alarm = n
        exp[et] = (n, mu, z, mx, alarm)

    got = {
        r["event_type"]: (r["n_days"], r["mu_cents"], r["ewma_cents"],
                          r["max_excursion"], r["alarm_step"])
        for r in rows("stats_ewma_control_chart")
    }
    assert got == exp


def test_ewma_chart_separates_from_cusum_and_ph(rows):
    """Degeneracy/redundancy guard for the drift TRIPLE: the smoothed
    chart must tell a different story from BOTH cousins on the same
    series — on this fixture it must also exercise its no-alarm arm
    somewhere (the transient-tolerance property that justified it)."""
    ew = {r["event_type"]: r["alarm_step"]
          for r in rows("stats_ewma_control_chart")}
    cu = {r["event_type"]: r["alarm_step"] for r in rows("stats_cusum_drift")}
    ph = {r["event_type"]: r["alarm_up_step"]
          for r in rows("stats_page_hinkley_drift")}
    assert set(ew) == set(cu) == set(ph)
    assert any(ew[t] != cu[t] for t in ew), "EWMA == CUSUM everywhere"
    assert any(ew[t] != ph[t] for t in ew), "EWMA == PH everywhere"


def test_ewma_chart_no_alarm_arm_at_gate_scale(spark):
    """Transient-tolerance pin at the driver's gate scale (sf0.01): the
    click series trips CUSUM on day 9 and Page-Hinkley on day 6, but
    the alpha=1/4 smoothed chart never leaves the mu/8 band — the
    no-alarm arm that justified adding a third drift monitor. (At
    sf0.001 the tiny daily sums are noisy enough that every type
    alarms, so this property is pinned at sf0.01 specifically.)"""
    rows = {
        r["event_type"]: r["alarm_step"]
        for r in QUERIES["stats_ewma_control_chart"]
        .fn(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows["click"] == -1
    assert sorted(rows.values()) == [-1, 14, 14, 17, 18]
