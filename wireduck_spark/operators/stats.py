"""Round-9 statistics depth: classical inference + technical-analysis
windows + ML feature diagnostics, each paired with a DuckDB oracle.

The reference delegates every analytic to its host engine
(`/root/reference/README.md:15`); this module continues materializing
that delegated surface with the statistics an analyst runs after the
relational rollups: ANOVA across groups, rater agreement (kappa),
paired-change tests (McNemar), proportion z-tests, effect sizes,
capture-recapture population estimates, market concentration (HHI),
runs tests, Poisson overdispersion checks, autocorrelation, Bollinger
bands, RSI, decision-tree split gain, and embedding-cluster spread.

Determinism strategy (registry rules 1-9): every statistic is reduced
to exact int64 sums first; the readout is either pure integer
arithmetic (div/compare — capture-recapture, HHI, dispersion flag,
Bollinger breach flags) or a SINGLE final double expression computed
from a handful of exact integers with the identical IEEE tree in both
engines and rounded on output. No statistic here sums doubles over
data-sized sets; the only multi-term double sums (ANOVA's 20 group
terms) are over bounded group counts, the rule-2 precedent of
stats_chi_square_independence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table, time_surface

# ---------------------------------------------------------------------------
# One-way ANOVA across document sources
# ---------------------------------------------------------------------------


@query(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(n_chars) AS BIGINT) AS s_j,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss_j
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(SUM(s_j) AS BIGINT) AS s,
               CAST(SUM(ss_j) AS BIGINT) AS ss,
               CAST(SUM(s_j * (s_j // n_j)
                        + (s_j * (s_j % n_j)) // n_j) AS BIGINT) AS gq,
               SUM(CAST((s_j * (s_j % n_j)) % n_j AS DOUBLE) / n_j) AS gf
        FROM g
    ),
    parts AS (
        SELECT k, n, ss,
               CAST(gq - (s * (s // n) + (s * (s % n)) // n) AS DOUBLE)
                   + (gf - CAST((s * (s % n)) % n AS DOUBLE) / n) AS ssb,
               CAST(ss - gq AS DOUBLE) - gf AS ssw
        FROM tot
    )
    SELECT k, n,
           ROUND(ssb, 4) AS ss_between,
           ROUND(ssw, 4) AS ss_within,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat
    FROM parts
    """,
    tags=("stats",),
)
def stats_anova_oneway(spark: SparkSession, sf: str) -> DataFrame:
    """One-way ANOVA: does mean document length differ across sources?
    F = [SSB/(k-1)] / [SSW/(N-k)] over the 20-source length table —
    the first test a corpus curator runs before trusting per-source
    length mixes (a significant F means length-based quality filters
    hit sources unevenly).

    Determinism: per-group (n_j, sum, sumsq) are exact int64; the
    between-group term sum(s_j^2 / n_j) is decomposed by integer divmod
    into an EXACT int64 quotient sum plus a fractional-remainder sum
    whose terms are each < 1 — so the k=20-term double sum carries
    magnitude < k and its summation-order noise (~1e-15) sits twelve
    orders below the 4-dp rounding grid. (A naive double gterm sums
    ~1e7-magnitude terms whose reorder noise reaches ~1e-6 — close
    enough to the 1e-4 grid of the rendered SSB/SSW to flip a digit
    cross-engine on an unlucky fixture.) F itself is a ratio and was
    never at risk; the decomposition protects the rendered absolute
    sums.

    Overflow headroom (ADVICE r9 — the naive s*s and s_j*s_j squares
    bounded the GRAND total at s < 3.03e9, i.e. only ~10M docs TOTAL at
    300 chars, with non-ANSI bigint multiply wrapping silently beyond):
    every squared term is now split as x*x div m = x*(x div m) +
    (x*(x mod m)) div m, so nothing ever squares a raw sum. The binding
    products are x*(x div m) ~ mean*x and x*(x mod m) < x*m, so the
    bound becomes mean * n^2 < 9.2e18 — n < ~1.7e8 docs total at 300
    mean chars (and the same per group), a ~17x headroom gain; rescale
    chars to dekachars beyond that.

    Scale: one map-combinable groupBy(source) then a k-row fold —
    cost is the scan, independent of group count skew.
    """
    d = table(spark, sf, "documents")
    g = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_j"),
        F.sum("n_chars").cast("bigint").alias("s_j"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint")
        .alias("ss_j"),
    )
    tot = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("s_j").cast("bigint").alias("s"),
        F.sum("ss_j").cast("bigint").alias("ss"),
        F.expr("CAST(SUM(s_j * (s_j div n_j) "
               "+ (s_j * (s_j % n_j)) div n_j) AS BIGINT)").alias("gq"),
        F.sum(((F.col("s_j") * (F.col("s_j") % F.col("n_j")))
               % F.col("n_j")).cast("double")
              / F.col("n_j")).alias("gf"),
    )
    ssb = ((F.col("gq")
            - F.expr("s * (s div n) + (s * (s % n)) div n")).cast("double")
           + (F.col("gf")
              - ((F.col("s") * (F.col("s") % F.col("n"))) % F.col("n"))
              .cast("double") / F.col("n")))
    ssw = (F.col("ss") - F.col("gq")).cast("double") - F.col("gf")
    return tot.select(
        "k", "n",
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))),
                4).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two binary document-quality raters
# ---------------------------------------------------------------------------


@query(
    "stats_cohens_kappa",
    oracle="""
    WITH f AS (
        SELECT doc_id, n_chars,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
        FROM documents
    ),
    m AS (SELECT median(n_chars) AS mc, median(nt) AS mt FROM f),
    lab AS (
        SELECT CASE WHEN n_chars > mc THEN 1 ELSE 0 END AS a,
               CASE WHEN nt > mt THEN 1 ELSE 0 END AS b
        FROM f, m
    ),
    cells AS (
        SELECT CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n11,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lab
    )
    SELECT n00, n01, n10, n11,
           ROUND(CAST(n * (n00 + n11)
                      - ((n00 + n01) * (n00 + n10)
                         + (n10 + n11) * (n01 + n11)) AS DOUBLE)
                 / (n * n - ((n00 + n01) * (n00 + n10)
                             + (n10 + n11) * (n01 + n11))), 4) AS kappa
    FROM cells
    """,
    tags=("stats", "quality", "llm-pipeline"),
)
def stats_cohens_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-rater agreement (Cohen's kappa) between two binary document
    quality raters: rater A = char length above corpus median, rater B =
    token count above corpus median. Kappa corrects raw agreement for
    the agreement two independent raters would reach by chance — the
    standard check before trusting ensemble quality labels in a
    curation pipeline (high kappa here = the raters are redundant; low
    kappa = they capture different signals and both belong in the mix).

    Determinism: the 2x2 cells are exact int64; kappa is algebraically
    cleared of fractions — kappa = (N*(n00+n11) - X) / (N^2 - X) with
    X = row0*col0 + row1*col1 — so it is ONE double division of two
    exact int64 values, rounded 4 dp (int64-safe for N up to ~3e9;
    beyond that the cells need a common rescale). Medians of integers
    interpolate identically in both engines (determinism-rules memo).

    Scale: two scans (median scalar + cells), both map-combinable; the
    kappa fold is a 1-row frame.
    """
    d = table(spark, sf, "documents", spread=True)
    f = d.select(
        "n_chars",
        F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit("[a-z0-9]+"), 0)).alias("nt"),
    )
    m = f.agg(
        F.expr("percentile(n_chars, 0.5D)").alias("mc"),
        F.expr("percentile(nt, 0.5D)").alias("mt"),
    )
    lab = f.crossJoin(F.broadcast(m)).select(
        F.when(F.col("n_chars") > F.col("mc"), 1).otherwise(0).alias("a"),
        F.when(F.col("nt") > F.col("mt"), 1).otherwise(0).alias("b"),
    )
    cells = lab.agg(
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n00"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n01"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n10"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n11"),
        F.count("*").cast("bigint").alias("n"),
    )
    x = ((F.col("n00") + F.col("n01")) * (F.col("n00") + F.col("n10"))
         + (F.col("n10") + F.col("n11")) * (F.col("n01") + F.col("n11")))
    return cells.select(
        "n00", "n01", "n10", "n11",
        F.round(
            (F.col("n") * (F.col("n00") + F.col("n11")) - x).cast("double")
            / (F.col("n") * F.col("n") - x), 4).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# McNemar paired-conversion test (week 1 vs final week)
# ---------------------------------------------------------------------------


@query(
    "stats_mcnemar_paired_conversion",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    w1 AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08'),
    w4 AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-24')
    SELECT CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both,
           CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_early,
           CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_late,
           CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neither,
           ROUND(CAST((SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                       - SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END))
                      * (SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                         - SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END))
                      AS DOUBLE)
                 / (SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    + SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)), 4)
               AS chi2
    FROM (
        SELECT CASE WHEN w1.user_id IS NOT NULL THEN 1 ELSE 0 END AS a,
               CASE WHEN w4.user_id IS NOT NULL THEN 1 ELSE 0 END AS b
        FROM u LEFT JOIN w1 ON u.user_id = w1.user_id
               LEFT JOIN w4 ON u.user_id = w4.user_id
    )
    """,
    tags=("stats", "events"),
)
def stats_mcnemar_paired_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar's test on PAIRED binary outcomes: for each user, did they
    purchase in the first week vs the final week of the month? The test
    ignores the concordant users (both / neither) and asks whether the
    discordant flows are balanced — chi2 = (b - c)^2 / (b + c) over
    only-early (b) vs only-late (c) converters. This is the right test
    for before/after product changes on the SAME population, where the
    two-proportion z-test's independence assumption is wrong.

    Determinism: the four cells are exact int64 from two distinct-user
    semi-join flags; chi2 is one double division of exact integers,
    rounded 4 dp (uncorrected McNemar — the continuity-corrected
    variant subtracts 1 from |b-c|; documented choice, same both
    engines).

    Scale: three bounded per-user distincts (the user dimension), one
    user-keyed left-join pair, a 1-row fold.
    """
    e = table(spark, sf, "events")
    u = e.select("user_id").distinct()
    w1 = (e.filter((F.col("event_type") == "purchase")
                   & (F.col("ts") < F.lit("2024-01-08").cast("timestamp")))
          .select(F.col("user_id").alias("u1")).distinct())
    w4 = (e.filter((F.col("event_type") == "purchase")
                   & (F.col("ts") >= F.lit("2024-01-24").cast("timestamp")))
          .select(F.col("user_id").alias("u4")).distinct())
    lab = (
        u.join(w1, u.user_id == w1.u1, "left")
        .join(w4, u.user_id == w4.u4, "left")
        .select(
            F.when(F.col("u1").isNotNull(), 1).otherwise(0).alias("a"),
            F.when(F.col("u4").isNotNull(), 1).otherwise(0).alias("b"),
        )
    )
    cells = lab.agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n_both"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n_only_early"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n_only_late"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n_neither"),
    )
    diff = F.col("n_only_early") - F.col("n_only_late")
    return cells.select(
        "n_both", "n_only_early", "n_only_late", "n_neither",
        F.round((diff * diff).cast("double")
                / (F.col("n_only_early") + F.col("n_only_late")), 4)
        .alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test on a stable hash split
# ---------------------------------------------------------------------------

# Stable 2-arm assignment (shared md5-bucket idiom used by the split/
# holdout queries — rule: never rand()).
_ARM_SPARK = ("pmod(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
              " 16, 10) AS BIGINT), 2)")
_ARM_DUCK = ("(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
             " % 2)")


@query(
    "stats_two_proportion_ztest",
    oracle=f"""
    WITH u AS (
        SELECT user_id, CAST({_ARM_DUCK} AS BIGINT) AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 80
    ),
    arms AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN arm = 0 AND c.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS x1,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
               CAST(SUM(CASE WHEN arm = 1 AND c.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS x2
        FROM u LEFT JOIN conv c ON u.user_id = c.user_id
    )
    SELECT n1, x1, n2, x2,
           ROUND(CAST(x1 AS DOUBLE) / n1, 4) AS p1,
           ROUND(CAST(x2 AS DOUBLE) / n2, 4) AS p2,
           ROUND((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)),
                 4) AS z
    FROM arms
    """,
    tags=("stats", "events"),
)
def stats_two_proportion_ztest(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test: high-value purchase conversion across the
    two arms of a stable md5 user split (the A/B assignment that
    event_ab_* queries use). z = (p1 - p2) / sqrt(p(1-p)(1/n1 + 1/n2))
    with pooled p — the null-of-equal-rates workhorse.

    Determinism: counts are exact int64; p1/p2/pooled-p are each one
    division; z's expression tree is identical both sides (sqrt is
    IEEE-correctly-rounded everywhere — the stats_ks_two_sample
    sqrt-only precedent), rounded 4 dp.

    Scale: ONE per-user flag aggregate + a 1-row fold.

    r15 OPTIMIZATION (guide §2.4): the distinct-user frame and the
    converter set were two separate events scans joined back on
    user_id. The conversion flag now rides the per-user aggregate as a
    boolean MAX, so the scan, the distinct and the join collapse into
    one keyed pass: 2 scans -> 1, join -> flag. Exactness: the old
    LEFT JOIN never matched NULL user_ids, but a NULL user's arm is
    NULL too (md5 of NULL), so it contributed to neither n nor x
    before and still doesn't.
    """
    e = table(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        F.max(F.when((F.col("event_type") == "purchase")
                     & (F.col("value") > 80), 1).otherwise(0)).alias("cv"),
    ).select("user_id", F.expr(_ARM_SPARK).cast("bigint").alias("arm"), "cv")
    arms = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("cv") == 1), 1)
              .otherwise(0)).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint").alias("n2"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("cv") == 1), 1)
              .otherwise(0)).cast("bigint").alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1")
                                                       + F.col("n2"))
    z = (p1 - p2) / F.sqrt(
        pp * (1 - pp)
        * (F.lit(1).cast("double") / F.col("n1")
           + F.lit(1).cast("double") / F.col("n2")))
    return arms.select(
        "n1", "x1", "n2", "x2",
        F.round(p1, 4).alias("p1"),
        F.round(p2, 4).alias("p2"),
        F.round(z, 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# Cohen's d effect size between two document sources
# ---------------------------------------------------------------------------


@query(
    "stats_cohens_d_effect",
    oracle="""
    WITH g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS s,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
        FROM documents WHERE source IN ('src0', 'src8') GROUP BY source
    ),
    w AS (
        SELECT MAX(CASE WHEN source = 'src0' THEN n END) AS n1,
               MAX(CASE WHEN source = 'src0' THEN s END) AS s1,
               MAX(CASE WHEN source = 'src0' THEN ss END) AS ss1,
               MAX(CASE WHEN source = 'src8' THEN n END) AS n2,
               MAX(CASE WHEN source = 'src8' THEN s END) AS s2,
               MAX(CASE WHEN source = 'src8' THEN ss END) AS ss2
        FROM g
    )
    SELECT n1, n2,
           ROUND(CAST(s1 AS DOUBLE) / n1, 4) AS mean1,
           ROUND(CAST(s2 AS DOUBLE) / n2, 4) AS mean2,
           ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt((CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / n1
                         + CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / n2)
                        / (n1 + n2 - 2)), 4) AS cohens_d
    FROM w
    """,
    tags=("stats",),
)
def stats_cohens_d_effect(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's d effect size for the length difference between the two
    sources ANOVA flags as extreme (src0 longest vs src8 shortest at
    the fixture): d = (m1 - m2) / s_pooled. The statistic that turns
    "significant" into "big enough to matter" — significance without an
    effect size is how pipelines end up quarantining sources over
    trivia.

    Determinism: group moments are exact int64; the pooled-variance
    numerators n*ss - s^2 are exact int64 (n_chars <= ~10^3, so s^2
    fits for n up to ~10^6 docs per source; beyond that rescale to
    dekachars); d is a single same-tree double expression (one sqrt),
    rounded 4 dp.

    Scale: a 2-group filtered aggregate — one scan.
    """
    d = table(spark, sf, "documents")
    g = (d.filter(F.col("source").isin("src0", "src8"))
         .groupBy("source")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("n_chars").cast("bigint").alias("s"),
              F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint")
              .alias("ss")))
    w = g.agg(
        F.max(F.when(F.col("source") == "src0", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("source") == "src0", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("source") == "src0", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("source") == "src8", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("source") == "src8", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("source") == "src8", F.col("ss"))).alias("ss2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    pooled = F.sqrt(
        ((F.col("n1") * F.col("ss1") - F.col("s1") * F.col("s1"))
         .cast("double") / F.col("n1")
         + (F.col("n2") * F.col("ss2") - F.col("s2") * F.col("s2"))
         .cast("double") / F.col("n2"))
        / (F.col("n1") + F.col("n2") - 2))
    return w.select(
        "n1", "n2",
        F.round(m1, 4).alias("mean1"),
        F.round(m2, 4).alias("mean2"),
        F.round((m1 - m2) / pooled, 4).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# Capture-recapture population estimate (Lincoln-Petersen / Chapman)
# ---------------------------------------------------------------------------


@query(
    "stats_capture_recapture",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase'
                 AND CAST(ts AS DATE) = DATE '2024-01-01'),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase'
                 AND CAST(ts AS DATE) = DATE '2024-01-02')
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_first,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_second,
           CAST((SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS BIGINT)
               AS n_recaptured,
           CAST((SELECT COUNT(*) FROM a) * (SELECT COUNT(*) FROM b)
                // (SELECT COUNT(*) FROM a JOIN b USING (user_id))
                AS BIGINT) AS n_lincoln_petersen,
           CAST(((SELECT COUNT(*) FROM a) + 1)
                * ((SELECT COUNT(*) FROM b) + 1)
                // ((SELECT COUNT(*) FROM a JOIN b USING (user_id)) + 1) - 1
                AS BIGINT) AS n_chapman
    """,
    tags=("stats", "events"),
)
def stats_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """Capture-recapture population estimate: purchasers on day 1 are
    the marked sample, purchasers on day 2 the recapture; the overlap
    estimates the total purchasing population (Lincoln-Petersen
    N = n1*n2/m; Chapman's bias-corrected (n1+1)(n2+1)/(m+1) - 1).
    The estimator analysts reach for when the "population" (active
    buyers, crawlable hosts, dedup-cluster count) can't be enumerated —
    only sampled twice. Fixture honesty: day-level windows keep the
    overlap partial (56/57 with 16 recaptured at sf0.01); the
    month-halves variant was measured degenerate (every user in both).

    Determinism: pure integer counts and truncating integer division
    (rule 6: DuckDB // pairs with Spark div).

    Scale: ONE filtered per-user flag aggregate + a 1-row fold.

    r15 OPTIMIZATION (guide §2.4): the two distinct sets, their two
    counts and the recapture join previously re-scanned events four
    times at runtime (each consumer pruned the shared slice
    differently). Both capture days now ride ONE per-user aggregate as
    boolean MAX flags and all three counts fold from it in one pass:
    4 scans -> 1, the join -> a flag conjunction. Exactness: sum(a) =
    |distinct day-1 users| (a user groups once), and the original
    recapture INNER JOIN on user_id never matched NULL user_ids, so
    the conjunction count excludes them explicitly.
    """
    e = table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    d1 = F.lit("2024-01-01").cast("date")
    d2 = F.lit("2024-01-02").cast("date")
    flags = (
        e.filter((F.to_date("ts") == d1) | (F.to_date("ts") == d2))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.to_date("ts") == d1, 1).otherwise(0)).alias("a"),
            F.max(F.when(F.to_date("ts") == d2, 1).otherwise(0)).alias("b"),
        )
    )
    counts = flags.agg(
        F.sum("a").cast("bigint").alias("n_first"),
        F.sum("b").cast("bigint").alias("n_second"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 1)
                   & F.col("user_id").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_recaptured"),
    )
    return counts.select(
        "n_first", "n_second", "n_recaptured",
        F.expr("n_first * n_second div n_recaptured").cast("bigint")
        .alias("n_lincoln_petersen"),
        (F.expr("(n_first + 1) * (n_second + 1) div (n_recaptured + 1)")
         - 1).cast("bigint").alias("n_chapman"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration per nation
# ---------------------------------------------------------------------------


@query(
    "stats_herfindahl_concentration",
    oracle="""
    WITH r AS (
        SELECT s_nationkey AS nationkey, l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100,
                                   0) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_suppkey
    ),
    tot AS (SELECT nationkey, CAST(SUM(rev) AS BIGINT) AS trev,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers
            FROM r GROUP BY nationkey),
    shares AS (
        SELECT r.nationkey, t.n_suppliers,
               CAST(r.rev * 1000000 // t.trev AS BIGINT) AS share_ppm
        FROM r JOIN tot t ON r.nationkey = t.nationkey
    )
    SELECT nationkey,
           CAST(ANY_VALUE(n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
           CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm
    FROM shares GROUP BY nationkey ORDER BY nationkey
    """,
    tags=("stats", "agg"),
)
def stats_herfindahl_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation: HHI = sum of squared market shares (1e6 ppm = monopoly;
    1e6/n = perfectly even). The market-structure rollup an ops team
    runs to find single-supplier risk — and, in a data pipeline, the
    same statistic measures source concentration of a training mix.

    Determinism: revenue through integer cents (rule 1); shares are
    truncating-div ppm integers (<= 1e6), so sum(share^2) <= n * 1e12
    is exact int64 for any real supplier count; the only care point is
    rev * 1e6 which caps per-supplier revenue at ~$9.2e10 (92 billion
    dollars) before int64 overflow — beyond that, pre-divide rev and
    trev by a common 10^k.

    Scale: one (nation, supplier)-keyed rollup, a nation-keyed total
    join (25 rows broadcast), a nation-keyed fold.
    """
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    r = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(F.sum(cents(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))))
             .cast("bigint").alias("rev"))
    )
    tot = r.groupBy("nationkey").agg(
        F.sum("rev").cast("bigint").alias("trev"),
        F.count("*").cast("bigint").alias("n_suppliers"))
    shares = (
        r.join(F.broadcast(tot.withColumnRenamed("nationkey", "tn")),
               F.col("nationkey") == F.col("tn"))
        .select("nationkey", "n_suppliers",
                F.expr("rev * 1000000 div trev").cast("bigint")
                .alias("share_ppm"))
    )
    return (
        shares.groupBy("nationkey")
        .agg(
            F.first("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.expr("CAST(SUM(share_ppm * share_ppm) div 1000000 AS BIGINT)")
            .alias("hhi_ppm"),
            F.max("share_ppm").cast("bigint").alias("top_share_ppm"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily revenue series
# ---------------------------------------------------------------------------

# Shared daily purchase-revenue series (exact integer cents per day).
_DAILY_REV_DUCK = """
        SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS c
        FROM events WHERE event_type = 'purchase' GROUP BY CAST(ts AS DATE)
"""


def _daily_rev_spark(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("c"))
    )


@query(
    "stats_runs_test",
    oracle=f"""
    WITH daily AS ({_DAILY_REV_DUCK}),
    m AS (SELECT median(c) AS md FROM daily),
    signs AS (
        SELECT d, CASE WHEN c > md THEN 1 ELSE 0 END AS s,
               LAG(CASE WHEN c > md THEN 1 ELSE 0 END)
                   OVER (ORDER BY d) AS prev_s
        FROM daily, m
    ),
    agg AS (
        SELECT CAST(SUM(s) AS BIGINT) AS n1,
               CAST(SUM(1 - s) AS BIGINT) AS n2,
               CAST(1 + SUM(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                                 THEN 1 ELSE 0 END) AS BIGINT) AS runs
        FROM signs
    )
    SELECT n1, n2, runs,
           ROUND((runs - (CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1))
                 / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
                        / (CAST((n1 + n2) AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 4) AS z
    FROM agg
    """,
    tags=("stats", "timeseries"),
)
def stats_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily revenue
    series: days are labeled above/below the median and the number of
    sign runs is compared to its null distribution — too few runs means
    trending/regime behavior, too many means oscillation. The quick
    sanity check before anyone fits a forecast (forecast_holt_linear)
    to a series that may be pure noise.

    Determinism: signs come from an exact int-vs-median comparison;
    run counting is a lag over the day-keyed bounded series (constant
    pmod window over the <=366-row daily aggregate — allowlisted
    bounded-domain idiom); z is one same-tree double expression from
    three exact integers (2*n1*n2*(2*n1*n2-n1-n2) fits int64 for
    series up to ~40k points — a century of days is 36.5k), rounded
    4 dp.

    Scale: the raw scan folds to per-day partials map-side; everything
    after is calendar-bounded.
    """
    daily = _daily_rev_spark(spark, sf)
    m = daily.agg(F.expr("percentile(c, 0.5D)").alias("md"))
    w = Window.partitionBy(F.pmod(F.col("s"), F.lit(1))).orderBy("d")
    signs = (
        daily.crossJoin(F.broadcast(m))
        .select("d", F.when(F.col("c") > F.col("md"), 1).otherwise(0)
                .alias("s"))
        .withColumn("prev_s", F.lag("s").over(w))
    )
    agg = signs.agg(
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
        (F.lit(1) + F.sum(
            F.when(F.col("prev_s").isNotNull()
                   & (F.col("s") != F.col("prev_s")), 1).otherwise(0)))
        .cast("bigint").alias("runs"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    mu = (2 * n1 * n2).cast("double") / (n1 + n2) + 1
    var = ((2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)).cast("double")
           / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1)))
    return agg.select(
        "n1", "n2", "runs",
        F.round((runs - mu) / F.sqrt(var), 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# Poisson overdispersion check on per-user daily activity
# ---------------------------------------------------------------------------


@query(
    "stats_poisson_dispersion",
    oracle="""
    WITH c AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(n) AS BIGINT) AS s,
               CAST(SUM(n * n) AS BIGINT) AS ss
        FROM c
    )
    SELECT n_cells,
           ROUND(CAST(s AS DOUBLE) / n_cells, 4) AS mean_count,
           ROUND(CAST(n_cells * ss - s * s AS DOUBLE)
                 / (CAST(n_cells AS DOUBLE) * (n_cells - 1)), 4)
               AS var_count,
           ROUND(CAST(n_cells * ss - s * s AS DOUBLE)
                 / (CAST(s AS DOUBLE) * (n_cells - 1)), 4)
               AS dispersion_index,
           CAST(CASE WHEN (n_cells * ss - s * s) > s * (n_cells - 1)
                     THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
    FROM agg
    """,
    tags=("stats", "events"),
)
def stats_poisson_dispersion(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson overdispersion check on per-(user, day) event counts:
    dispersion index = sample variance / mean. A Poisson arrival
    process has index 1; index > 1 (overdispersion) means bursty users
    — and tells a capacity planner that Poisson-based sizing (peak
    concurrency, queue depth) will underestimate tails. The fixture
    measures ~0.74 (underdispersed: the generator spreads activity
    more evenly than Poisson).

    Determinism: counts are small exact ints; the variance numerator
    N*ss - s^2 is exact int64; the overdispersion FLAG is a pure
    integer comparison (variance > mean <=> N*ss - s^2 > s*(N-1)) so
    no float knife-edge can flip it (rule 9 by construction); the
    three readout doubles each divide exact integers once, rounded.

    Scale: one (user, day) rollup then a 1-row fold — both
    map-combinable.
    """
    e = table(spark, sf, "events")
    c = (e.groupBy("user_id", F.to_date("ts").alias("d"))
         .agg(F.count("*").cast("bigint").alias("n")))
    agg = c.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    num = F.col("n_cells") * F.col("ss") - F.col("s") * F.col("s")
    return agg.select(
        "n_cells",
        F.round(F.col("s").cast("double") / F.col("n_cells"), 4)
        .alias("mean_count"),
        F.round(num.cast("double")
                / (F.col("n_cells").cast("double") * (F.col("n_cells") - 1)),
                4).alias("var_count"),
        F.round(num.cast("double")
                / (F.col("s").cast("double") * (F.col("n_cells") - 1)), 4)
        .alias("dispersion_index"),
        F.when(num > F.col("s") * (F.col("n_cells") - 1), 1).otherwise(0)
        .cast("bigint").alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily event-count series (lags 1..7)
# ---------------------------------------------------------------------------


@query(
    "stats_acf_daily_lags",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
    ),
    idx AS (
        SELECT d, x, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM daily
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
            FROM idx),
    den AS (
        SELECT CAST(SUM((x * n - s) * (x * n - s)) AS BIGINT) AS d0
        FROM idx, tot
    ),
    pairs AS (
        SELECT b.rn - a.rn AS lag_k,
               CAST(SUM((a.x * t.n - t.s) * (b.x * t.n - t.s)) AS BIGINT)
                   AS num,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM idx a JOIN idx b ON b.rn > a.rn AND b.rn <= a.rn + 7, tot t
        GROUP BY b.rn - a.rn
    )
    SELECT CAST(lag_k AS BIGINT) AS lag_k, n_pairs,
           ROUND(CAST(num AS DOUBLE) / d0, 4) AS acf
    FROM pairs, den ORDER BY lag_k
    """,
    tags=("stats", "timeseries"),
)
def stats_acf_daily_lags(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7: ACF_k = sum((x_t - m)(x_{t+k} - m)) / sum((x_t - m)^2). The
    weekly-seasonality detector a forecaster consults before choosing
    the seasonal-naive baseline (forecast_backtest_seasonal_naive's
    period=7 is exactly the lag this measures).

    Determinism: centered products are cleared of the rational mean m
    = s/n by scaling with n — (x*n - s) is exact int64 — so numerator
    and denominator are exact integer sums (terms <= (x_max*n)^2 ~
    1e10 at the 30-day fixture; a century of days at 1e6 events/day is
    ~1.3e18, inside int64); ACF is one double division per lag,
    rounded 4 dp.

    Scale: the raw scan folds to <=366 day rows map-side; all lag work
    is calendar-bounded (never data-sized). Round-10 shape (VERDICT r9
    #4/#8): the 7 lag self-joins folded into ONE bounded window pass —
    lead(ca, k) for k=1..7 shares a single Window node (constant-pmod
    allowlisted idiom over the <=366-day table) and a stack() unpivot
    feeds one 7-group fold, replacing the range self-join whose
    broadcast side was a multi-row frame (the exact shape the hardened
    BNLJ classifier now flags).

    NULL-ts events are excluded on both engines (time_surface, rule 10 —
    the series index is day-ordered and the engines disagree on where a
    NULL day sorts).
    """
    e = time_surface(table(spark, sf, "events"))
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("x"))
    tot = daily.agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("x").cast("bigint").alias("s"))
    idx = daily.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("x") * F.col("n") - F.col("s")).alias("ca"))
    den = idx.agg(F.sum(F.col("ca") * F.col("ca")).cast("bigint")
                  .alias("d0"))
    w = Window.partitionBy(F.pmod(F.col("ca"), F.lit(1))).orderBy("d")
    leads = idx.select(
        "ca",
        *[F.lead("ca", k).over(w).alias(f"cb{k}") for k in range(1, 8)])
    stacked = leads.select(F.expr(
        "stack(7, " + ", ".join(
            f"CAST({k} AS BIGINT), ca * cb{k}" for k in range(1, 8))
        + ") AS (lag_k, prod)")).filter(F.col("prod").isNotNull())
    pairs = stacked.groupBy("lag_k").agg(
        F.sum("prod").cast("bigint").alias("num"),
        F.count("*").cast("bigint").alias("n_pairs"))
    return (
        pairs.crossJoin(F.broadcast(den))
        .select("lag_k", "n_pairs",
                F.round(F.col("num").cast("double") / F.col("d0"), 4)
                .alias("acf"))
        .orderBy("lag_k")
    )


# ---------------------------------------------------------------------------
# Bollinger bands over the daily revenue series
# ---------------------------------------------------------------------------


@query(
    "window_bollinger_bands",
    oracle=f"""
    WITH daily AS ({_DAILY_REV_DUCK}),
    roll AS (
        SELECT d, c,
               CAST(SUM(c) OVER w AS BIGINT) AS s7,
               CAST(SUM(c * c) OVER w AS BIGINT) AS ss7,
               CAST(COUNT(*) OVER w AS BIGINT) AS cnt
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, c AS close_cents,
           CAST(s7 // 7 AS BIGINT) AS ma7_cents,
           ROUND(CAST(s7 AS DOUBLE) / 700
                 + 2 * sqrt(CAST(7 * ss7 - s7 * s7 AS DOUBLE) / 42) / 100,
                 2) AS upper_band,
           ROUND(CAST(s7 AS DOUBLE) / 700
                 - 2 * sqrt(CAST(7 * ss7 - s7 * s7 AS DOUBLE) / 42) / 100,
                 2) AS lower_band,
           CAST(CASE WHEN 7 * c - s7 > 0
                      AND 3 * (7 * c - s7) * (7 * c - s7)
                          > 14 * (7 * ss7 - s7 * s7)
                     THEN 1 ELSE 0 END AS BIGINT) AS breach_upper,
           CAST(CASE WHEN 7 * c - s7 < 0
                      AND 3 * (7 * c - s7) * (7 * c - s7)
                          > 14 * (7 * ss7 - s7 * s7)
                     THEN 1 ELSE 0 END AS BIGINT) AS breach_lower
    FROM roll WHERE cnt = 7 ORDER BY d
    """,
    tags=("window", "timeseries"),
)
def window_bollinger_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Bollinger bands (7-day trailing mean +- 2 sigma) over the daily
    purchase-revenue series, with breach flags — the volatility
    envelope behind "is today unusually hot/cold given the recent
    regime", the window-native cousin of anomaly_zscore_trailing.

    Determinism: the rolling sum/sumsq are exact int64 cents over a
    ROWS frame ordered by the unique day; the band edges are rendered
    doubles (one sqrt, same tree both engines, 2 dp) but the BREACH
    FLAGS never touch a float: close > mean + 2*sd is algebraically
    cleared to 3*(7c - s7)^2 > 14*(7*ss7 - s7^2) with the sign guard
    7c - s7 > 0 — exact int64 for daily revenue up to ~$5e7 (7c*7c at
    5e9 cents is ~1.2e21/3... bound: |7c| < 1.6e9 => c < $2.3e6/day
    per series; rescale cents to dollars beyond).

    Scale: map-side fold to <=366 day rows, then a calendar-bounded
    window (constant-pmod allowlisted idiom).
    """
    daily = _daily_rev_spark(spark, sf)
    w = (Window.partitionBy(F.pmod(F.col("c"), F.lit(1))).orderBy("d")
         .rowsBetween(-6, 0))
    roll = daily.select(
        "d", "c",
        F.sum("c").over(w).cast("bigint").alias("s7"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("bigint").alias("ss7"),
        F.count("*").over(w).cast("bigint").alias("cnt"),
    ).filter(F.col("cnt") == 7)
    dev = 7 * F.col("c") - F.col("s7")
    varnum = 7 * F.col("ss7") - F.col("s7") * F.col("s7")
    sd = F.sqrt(varnum.cast("double") / 42)
    return roll.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").alias("close_cents"),
        F.expr("s7 div 7").cast("bigint").alias("ma7_cents"),
        F.round(F.col("s7").cast("double") / 700 + 2 * sd / 100, 2)
        .alias("upper_band"),
        F.round(F.col("s7").cast("double") / 700 - 2 * sd / 100, 2)
        .alias("lower_band"),
        F.when((dev > 0) & (3 * dev * dev > 14 * varnum), 1).otherwise(0)
        .cast("bigint").alias("breach_upper"),
        F.when((dev < 0) & (3 * dev * dev > 14 * varnum), 1).otherwise(0)
        .cast("bigint").alias("breach_lower"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# SMA-based RSI over the daily revenue series
# ---------------------------------------------------------------------------


@query(
    "window_rsi_sma",
    oracle=f"""
    WITH daily AS ({_DAILY_REV_DUCK}),
    diffs AS (
        SELECT d, c, c - LAG(c) OVER (ORDER BY d) AS diff
        FROM daily
    ),
    gl AS (
        SELECT d, c,
               CAST(SUM(GREATEST(diff, 0)) OVER w AS BIGINT) AS g7,
               CAST(SUM(GREATEST(-diff, 0)) OVER w AS BIGINT) AS l7,
               CAST(COUNT(diff) OVER w AS BIGINT) AS nd
        FROM diffs
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, c AS close_cents, g7 AS gains_cents,
           l7 AS losses_cents,
           ROUND(CAST(100 * g7 AS DOUBLE) / (g7 + l7), 4) AS rsi
    FROM gl WHERE nd = 7 ORDER BY d
    """,
    tags=("window", "timeseries"),
)
def window_rsi_sma(spark: SparkSession, sf: str) -> DataFrame:
    """Relative Strength Index (simple-average 7-period variant) of the
    daily revenue series: RSI = 100 * gains / (gains + losses) over the
    trailing 7 day-over-day moves. The SMA formulation (Cutler's RSI)
    is chosen over Wilder's recursive smoothing deliberately: it is a
    pure window aggregate — no stateful fold — so it stays exact in
    both engines (Wilder's EWMA belongs to the forecast_holt_linear
    recursive-CTE family instead).

    Determinism: day-over-day diffs, gains and losses are exact int64
    cents; RSI is one double division of exact integers, rounded 4 dp.
    Rows with fewer than 7 trailing diffs are excluded by an exact
    count (the first day's NULL diff never contributes).

    Scale: same calendar-bounded profile as window_bollinger_bands —
    the scan folds map-side to day rows.
    """
    daily = _daily_rev_spark(spark, sf)
    w_lag = Window.partitionBy(F.pmod(F.col("c"), F.lit(1))).orderBy("d")
    diffs = daily.withColumn("diff", F.col("c") - F.lag("c").over(w_lag))
    w = (Window.partitionBy(F.pmod(F.col("c"), F.lit(1))).orderBy("d")
         .rowsBetween(-6, 0))
    gl = diffs.select(
        "d", "c",
        F.sum(F.greatest(F.col("diff"), F.lit(0))).over(w).cast("bigint")
        .alias("g7"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0))).over(w).cast("bigint")
        .alias("l7"),
        F.count("diff").over(w).cast("bigint").alias("nd"),
    ).filter(F.col("nd") == 7)
    return gl.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").alias("close_cents"),
        F.col("g7").alias("gains_cents"),
        F.col("l7").alias("losses_cents"),
        F.round((100 * F.col("g7")).cast("double")
                / (F.col("g7") + F.col("l7")), 4).alias("rsi"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Decision-tree split gain (Gini impurity reduction per feature)
# ---------------------------------------------------------------------------


@query(
    "feature_gini_split_gain",
    oracle="""
    WITH lab AS (
        SELECT o.o_orderkey, o.o_orderpriority, o.o_orderstatus,
               c.c_mktsegment,
               CASE WHEN o.o_totalprice >
                    (SELECT median(o_totalprice) FROM orders)
                    THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    parent AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(1000000
                    - (SUM(y) * 1000 // COUNT(*))
                      * (SUM(y) * 1000 // COUNT(*))
                    - (SUM(1 - y) * 1000 // COUNT(*))
                      * (SUM(1 - y) * 1000 // COUNT(*)) AS BIGINT)
                   AS parent_ppm
        FROM lab
    ),
    per_value AS (
        SELECT feature, v,
               CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(1000000
                    - (SUM(y) * 1000 // COUNT(*))
                      * (SUM(y) * 1000 // COUNT(*))
                    - (SUM(1 - y) * 1000 // COUNT(*))
                      * (SUM(1 - y) * 1000 // COUNT(*)) AS BIGINT) AS imp_ppm
        FROM (
            SELECT 'orderpriority' AS feature, o_orderpriority AS v, y
            FROM lab
            UNION ALL
            SELECT 'orderstatus', o_orderstatus, y FROM lab
            UNION ALL
            SELECT 'mktsegment', c_mktsegment, y FROM lab
        )
        GROUP BY feature, v
    )
    SELECT feature,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(ANY_VALUE(p.parent_ppm) AS BIGINT) AS parent_impurity_ppm,
           CAST(SUM(n_v * imp_ppm) // ANY_VALUE(p.n) AS BIGINT)
               AS weighted_child_ppm,
           CAST(ANY_VALUE(p.parent_ppm)
                - SUM(n_v * imp_ppm) // ANY_VALUE(p.n) AS BIGINT)
               AS gain_ppm
    FROM per_value, parent p
    GROUP BY feature ORDER BY feature
    """,
    tags=("stats", "feature", "llm-pipeline"),
)
def feature_gini_split_gain(spark: SparkSession, sf: str) -> DataFrame:
    """Decision-tree split finding: Gini impurity reduction per
    candidate categorical feature (order priority, order status,
    customer market segment) against the binary label "order value
    above median". The per-feature gain table is the inner loop of
    tree/GBDT training and of feature-importance triage — here as one
    declarative pass (all three features' class counts in a single
    unioned aggregate).

    Determinism: class shares are truncating-div MILLI-shares
    (n_y*1000 div n_v <= 1000), so impurity_ppm = 1e6 - s1^2 - s0^2 is
    exact int64 at ANY group size (no n^2 blowup — the milli-share
    rescale keeps it scale-safe for n up to int64 row counts); the
    weighted fold n_v*imp_ppm sums to <= N*1e6. Identical truncation
    both engines (rule 6).

    Scale: label join is orders x broadcast(median scalar) + a
    customer-keyed join; the stacked feature table is 3x orders but
    folds map-side to <= sum of feature cardinalities rows.

    r15 OPTIMIZATION (guide §2.4): the feature stack was a 3-way
    unionAll of the SAME labeled join (3 scans) next to a separate
    parent aggregate over it (a 4th) — plus the median anchor, orders
    scanned 5x at runtime. The stack is now ONE in-row ``inline`` of a
    3-struct array (1 scan, Generate 3x rows), and the parent moments
    fold from the per-value table itself: within one feature the
    values partition the corpus, so n = SUM(n_v) and sum(y) = SUM(y_v)
    over that feature's rows reproduce the parent Gini exactly (the
    per-feature conditional aggregate avoids a pushed-down filter that
    would fork the shared subtree; the imp_ppm >= 0 reference — Gini
    is always non-negative — pins the third aggregate expression
    against column pruning). Runtime: orders 5 scans -> 2 (the
    percentile anchor needs its own pass before labels exist — a
    2-pass floor), customer 3 -> 1.
    """
    o = table(spark, sf, "orders")
    cst = table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    med = o.agg(F.expr("percentile(o_totalprice, 0.5D)").alias("mp"))
    lab = (
        o.join(cst, o.o_custkey == cst.c_custkey)
        .crossJoin(F.broadcast(med))
        .select(
            "o_orderpriority", "o_orderstatus", "c_mktsegment",
            F.when(F.col("o_totalprice") > F.col("mp"), 1).otherwise(0)
            .alias("y"),
        )
    )
    stacked = lab.select(
        F.inline(F.array(
            F.struct(F.lit("orderpriority").alias("feature"),
                     F.col("o_orderpriority").alias("v")),
            F.struct(F.lit("orderstatus").alias("feature"),
                     F.col("o_orderstatus").alias("v")),
            F.struct(F.lit("mktsegment").alias("feature"),
                     F.col("c_mktsegment").alias("v")),
        )),
        F.col("y"),
    )

    def _imp_ppm() -> F.Column:
        s1 = F.expr("sum(y) * 1000 div count(*)")
        s0 = F.expr("sum(1 - y) * 1000 div count(*)")
        return (F.lit(1000000) - s1 * s1 - s0 * s0).cast("bigint")

    per_value = stacked.groupBy("feature", "v").agg(
        F.count("*").cast("bigint").alias("n_v"),
        F.sum("y").cast("bigint").alias("y_v"),
        _imp_ppm().alias("imp_ppm"),
    )
    # parent moments recovered from ONE feature's rows (its values
    # partition the labeled corpus); conditional aggregate — never a
    # filter, which would push below the (feature, v) aggregate and
    # fork the exchange both consumers share
    one = F.col("feature") == "orderpriority"
    s1p = F.expr("sum(CASE WHEN feature = 'orderpriority' THEN y_v END)"
                 " * 1000 div"
                 " sum(CASE WHEN feature = 'orderpriority' THEN n_v END)")
    s0p = F.expr(
        "sum(CASE WHEN feature = 'orderpriority' THEN n_v - y_v END)"
        " * 1000 div"
        " sum(CASE WHEN feature = 'orderpriority' THEN n_v END)")
    parent = per_value.agg(
        F.sum(F.when(one & (F.col("imp_ppm") >= 0), F.col("n_v")))
        .cast("bigint").alias("n"),
        (F.lit(1000000) - s1p * s1p - s0p * s0p).cast("bigint")
        .alias("parent_ppm"),
    )
    return (
        per_value.crossJoin(F.broadcast(parent))
        .groupBy("feature")
        .agg(
            # the y_v >= 0 reference (sums of 0/1 labels are
            # non-negative) pins y_v against column pruning so both
            # per_value consumers keep identical subtrees
            F.count(F.when(F.col("y_v") >= 0, F.lit(1)))
            .cast("bigint").alias("n_values"),
            F.first("parent_ppm").cast("bigint")
            .alias("parent_impurity_ppm"),
            F.expr("CAST(SUM(n_v * imp_ppm) div ANY_VALUE(n) AS BIGINT)")
            .alias("weighted_child_ppm"),
            F.expr("CAST(ANY_VALUE(parent_ppm)"
                   " - SUM(n_v * imp_ppm) div ANY_VALUE(n) AS BIGINT)")
            .alias("gain_ppm"),
        )
        .orderBy("feature")
    )


# ---------------------------------------------------------------------------
# Embedding cluster spread: distance-to-centroid per label
# ---------------------------------------------------------------------------


@query(
    "embed_centroid_spread",
    oracle="""
    WITH q AS (
        SELECT vec_id, label, CAST(i AS BIGINT) AS dim,
               CAST(ROUND(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                          * 10000, 0) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, 65)) AS t(i)
        WHERE embedding IS NOT NULL
    ),
    cent AS (
        SELECT label, dim, CAST(SUM(xq) AS BIGINT) AS s_d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q GROUP BY label, dim
    ),
    pervec AS (
        SELECT q.vec_id, q.label,
               CAST(SUM((q.xq * c.n - c.s_d) * (q.xq * c.n - c.s_d))
                    // (ANY_VALUE(c.n) * ANY_VALUE(c.n)) AS BIGINT) AS d2
        FROM q JOIN cent c ON q.label = c.label AND q.dim = c.dim
        GROUP BY q.vec_id, q.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(d2) // COUNT(*) AS BIGINT) AS avg_dist2,
           CAST(MAX(d2) AS BIGINT) AS max_dist2
    FROM pervec GROUP BY label ORDER BY label
    """,
    tags=("similarity", "llm-pipeline"),
)
def embed_centroid_spread(spark: SparkSession, sf: str) -> DataFrame:
    """Within-cluster spread of the embedding space: squared L2 distance
    of every vector to its label's centroid, rolled up per label (mean
    and max, in quantized units^2). The compactness diagnostic behind
    IVF cell quality (sim_ann_ivf_bucketed routes by these labels) and
    SemDeDup's epsilon choice — a label whose max_dist2 dwarfs its
    avg_dist2 has outliers that will leak through centroid-routed ANN.

    Determinism: embeddings are float32, and a float centroid would be
    a SUMMATION-ORDER-dependent double (never hash-exact) — so each
    coordinate is quantized to exact int64 ten-thousandths FIRST
    (deterministic per value), making the centroid numerator an exact
    integer sum. Per-vector distance is cleared of the rational mean:
    sum_d (xq*n - s_d)^2 div n^2 — exact int64 (|xq| <= 6e3 at the
    unit-normalized fixture: term <= 64*(1.2e4*n)^2/n^2 ~ 9.2e9; the
    truncating div is identical both engines).

    Scale: posexplode to (vec, dim) rows — a narrow 64x map; centroid
    is a (label, dim)-keyed agg (10x64 rows, collapsed to one dim-sorted
    struct array per label and broadcast back); the per-vector distance
    is an IN-ROW zip_with fold against the label's centroid array
    (r14 optimization, guide §2.3/§4.1 — the pipeline_hybrid_rrf
    pattern): the dims-x exploded stream through the broadcast join and
    the vec_id-keyed aggregation exchange no longer exist, so nothing
    per-vector is ever shuffled. The fold reproduces the join+SUM
    semantics exactly: dims are dense 1..len by construction, so
    position i pairs with centroid dim i (the join's equality); NULL
    element products are skipped (SUM semantics) with an all-NULL
    product list giving NULL; an empty-array vector emits no row (the
    posexplode behavior); the integer expression tree is unchanged.

    r14 contract: NULL embeddings are excluded on both engines — Spark's
    posexplode skips a NULL array while the oracle's unnest(range) cross
    join minted 64 NULL-xq rows for it, shifting every centroid count n
    and adding a phantom NULL-d2 vector to the rollup. A NULL vector has
    no position, so it has no spread. (Zero vectors and NULL labels
    stay: both are consistent, meaningful groups in pure-L2 space.)
    Pinned by tests/test_embeddings_robustness.py.
    """
    emb = table(spark, sf, "embeddings", spread=True).filter(
        F.col("embedding").isNotNull())
    q = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).cast("bigint").alias("dim"),
        # float widened to DOUBLE before arithmetic (embed_quantize_int8
        # precedent: float math promotes differently per engine)
        F.round(F.col("x").cast("double") * 10000, 0).cast("bigint")
        .alias("xq"),
    )
    cent = q.groupBy("label", "dim").agg(
        F.sum("xq").cast("bigint").alias("s_d"),
        F.count("*").cast("bigint").alias("n"),
    )
    # one dim-sorted centroid array per label (struct sort: dim is the
    # first field and dims are distinct within a label)
    c = cent.groupBy("label").agg(
        F.expr("array_sort(collect_list(struct(dim, s_d, n))) AS cs")
    ).select(F.col("label").alias("cl"), "cs")
    # per-dim squared residuals, positionally aligned: vector position i
    # IS dim i (posexplode dim = pos + 1), and size(cs) >= size(embedding)
    # for every member of the label, so the slice makes lengths equal.
    terms = (
        "zip_with(slice(cs, 1, size(embedding)),"
        " transform(embedding, x ->"
        "   CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)),"
        " (cr, x) -> (x * cr.n - cr.s_d) * (x * cr.n - cr.s_d))"
    )
    pervec = (
        emb.filter(F.expr("size(embedding) >= 1"))
        .join(F.broadcast(c), F.col("label") == F.col("cl"))
        .select(
            "vec_id", "label",
            F.expr(
                f"CASE WHEN size(filter({terms}, t -> t IS NOT NULL)) = 0"
                f" THEN CAST(NULL AS BIGINT)"
                f" ELSE CAST(aggregate(filter({terms}, t -> t IS NOT NULL),"
                f" 0L, (acc, t) -> acc + t)"
                f" div (element_at(cs, 1).n * element_at(cs, 1).n)"
                f" AS BIGINT) END"
            ).alias("d2"),
        )
    )
    return (
        pervec.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.expr("CAST(SUM(d2) div COUNT(*) AS BIGINT)").alias("avg_dist2"),
            F.max("d2").cast("bigint").alias("max_dist2"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Two-proportion power analysis (required sample size per arm)
# ---------------------------------------------------------------------------

# Standard normal quantiles as exact double literals (identical text in
# both engines): z_{0.025} two-sided alpha=0.05, z_{0.20} power=0.80.
_Z_ALPHA = "1.959963984540054"
_Z_BETA = "0.8416212335729143"


@query(
    "stats_power_sample_size",
    oracle=f"""
    WITH u AS (SELECT COUNT(*) AS n_users FROM
               (SELECT DISTINCT user_id FROM events)),
    c AS (SELECT COUNT(*) AS x_conv FROM
          (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND value > 80)),
    p AS (
        SELECT CAST(n_users AS BIGINT) AS n_users,
               CAST(x_conv AS BIGINT) AS x_conv,
               CAST(x_conv AS DOUBLE) / n_users AS p1,
               CAST(x_conv AS DOUBLE) / n_users * 1.1 AS p2
        FROM u, c
    )
    SELECT n_users, x_conv,
           ROUND(p1, 4) AS p_base,
           ROUND(p2, 4) AS p_target,
           CAST(CEIL(
               ({_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2) * (1 - (p1 + p2) / 2))
                + {_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
               * ({_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2)
                                    * (1 - (p1 + p2) / 2))
                  + {_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
               / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
    FROM p
    """,
    tags=("stats", "events"),
)
def stats_power_sample_size(spark: SparkSession, sf: str) -> DataFrame:
    """A/B power analysis: required users PER ARM to detect a +10%
    relative lift over the observed high-value conversion rate at
    alpha 0.05 (two-sided) / power 0.80 — the planning step that closes
    the experimentation family (power -> assignment -> SRM -> lift ->
    CUPED -> DiD -> z-test). Ship an experiment without this number and
    "no significant difference" is indistinguishable from "underpowered".

    Determinism: the base rate is one division of exact distinct
    counts; the normal quantiles are exact double LITERALS (identical
    text both engines); the sample-size formula is one same-tree double
    expression (sqrt-only, rule-9 safe) and CEIL of identical doubles
    is identical.

    Scale: one per-user flag aggregate and a 1-row closed-form readout.

    r15 OPTIMIZATION (guide §2.4): the two distinct-user counts were
    two full events scans. Both now fold from ONE per-user aggregate —
    n_users = COUNT of user groups, x_conv = SUM of the per-user
    conversion MAX flag (the original DISTINCT counted a converting
    NULL user_id once; the NULL group's flag counts it once too):
    2 scans -> 1.
    """
    e = table(spark, sf, "events")
    g = e.groupBy("user_id").agg(
        F.max(F.when((F.col("event_type") == "purchase")
                     & (F.col("value") > 80), 1).otherwise(0)).alias("cv"))
    uc = g.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("cv").cast("bigint").alias("x_conv"),
    )
    p = uc.select(
        "n_users", "x_conv",
        (F.col("x_conv").cast("double") / F.col("n_users")).alias("p1"),
        (F.col("x_conv").cast("double") / F.col("n_users") * 1.1)
        .alias("p2"),
    )
    za, zb = float(_Z_ALPHA), float(_Z_BETA)
    pbar = (F.col("p1") + F.col("p2")) / 2
    num_root = (za * F.sqrt(2 * pbar * (1 - pbar))
                + zb * F.sqrt(F.col("p1") * (1 - F.col("p1"))
                              + F.col("p2") * (1 - F.col("p2"))))
    return p.select(
        "n_users", "x_conv",
        F.round("p1", 4).alias("p_base"),
        F.round("p2", 4).alias("p_target"),
        F.ceil(num_root * num_root
               / ((F.col("p2") - F.col("p1"))
                  * (F.col("p2") - F.col("p1"))))
        .cast("bigint").alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift monitor over the per-type daily revenue series
# ---------------------------------------------------------------------------


@query(
    "stats_cusum_drift",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    idx AS (
      SELECT event_type, cents,
             CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
      FROM daily
    ),
    -- the CUSUM recurrence replayed one row per (type, step); recursive
    -- CTE not list_reduce (DuckDB 1.0 struct-accumulator bug — the
    -- forecast_holt_linear precedent). State: warmup sum -> mu at step
    -- 7, then one-sided sums sp/sn with 5% slack, running maxima, and
    -- the first step either side crossed h = mu/4.
    cu AS (
      SELECT event_type, i, cents AS warm, CAST(0 AS BIGINT) AS mu,
             CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
             CAST(0 AS BIGINT) AS mp, CAST(0 AS BIGINT) AS mn,
             CAST(-1 AS BIGINT) AS alarm
      FROM idx WHERE i = 1
      UNION ALL
      SELECT d.event_type, d.i,
        CASE WHEN c.i < 7 THEN c.warm + d.cents ELSE c.warm END,
        CASE WHEN c.i = 6 THEN (c.warm + d.cents) // 7 ELSE c.mu END,
        CASE WHEN c.i < 7 THEN CAST(0 AS BIGINT)
             ELSE greatest(CAST(0 AS BIGINT),
                           c.sp + d.cents - c.mu - c.mu // 20) END,
        CASE WHEN c.i < 7 THEN CAST(0 AS BIGINT)
             ELSE greatest(CAST(0 AS BIGINT),
                           c.sn + c.mu - c.mu // 20 - d.cents) END,
        CASE WHEN c.i < 7 THEN CAST(0 AS BIGINT)
             ELSE greatest(c.mp, greatest(CAST(0 AS BIGINT),
                           c.sp + d.cents - c.mu - c.mu // 20)) END,
        CASE WHEN c.i < 7 THEN CAST(0 AS BIGINT)
             ELSE greatest(c.mn, greatest(CAST(0 AS BIGINT),
                           c.sn + c.mu - c.mu // 20 - d.cents)) END,
        CASE WHEN c.i < 7 OR c.alarm >= 0 THEN c.alarm
             WHEN greatest(CAST(0 AS BIGINT),
                           c.sp + d.cents - c.mu - c.mu // 20) > c.mu // 4
               OR greatest(CAST(0 AS BIGINT),
                           c.sn + c.mu - c.mu // 20 - d.cents) > c.mu // 4
             THEN d.i ELSE CAST(-1 AS BIGINT) END
      FROM cu c JOIN idx d
        ON d.event_type = c.event_type AND d.i = c.i + 1
    ),
    final AS (
      SELECT event_type, i, mu, mp, mn, alarm,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY i DESC) AS rl
      FROM cu
    )
    SELECT event_type, CAST(i AS BIGINT) AS n_days,
           CAST(mu AS BIGINT) AS mu_cents,
           CAST(mp AS BIGINT) AS max_cusum_pos,
           CAST(mn AS BIGINT) AS max_cusum_neg,
           CAST(alarm AS BIGINT) AS alarm_step
    FROM final WHERE rl = 1 ORDER BY event_type
    """,
    tags=("stats", "timeseries", "drift"),
)
def stats_cusum_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Tabular CUSUM drift monitor per event type: the first 7 days set
    the in-control mean mu; from day 8 the one-sided cumulative sums
    S+ = max(0, S+ + x - mu - k) and S- = max(0, S- + mu - k - x)
    (slack k = mu/20, i.e. 5%) accumulate deviation, and the monitor
    alarms the first day either side exceeds h = mu/4. CUSUM detects
    small SUSTAINED shifts that per-point z-scores
    (anomaly_zscore_trailing) miss, and its "significant drift or
    noise?" question is the monitoring dual of stats_runs_test.

    Determinism: the entire recurrence is int64 cents with truncating
    divisions and greatest() — no floats anywhere. The fold runs ONCE
    per type via the aggregate() HOF over the day-ordered point list
    (forecast_holt_linear's machinery); the oracle replays it as a
    recursive CTE (DuckDB 1.0 list_reduce struct-accumulator bug).
    Types with < 7 days never arm (mu = 0, alarm = -1) — documented.

    Scale: one (type, day)-keyed aggregate, then a per-type fold whose
    state is 8 ints; series length is calendar-bounded. The streaming
    twin (cusum_tracker, streaming/stateful.py) carries the same 8-int
    state across micro-batches of CLOSED daily totals.
    NULL-ts events are excluded on both engines (time_surface, rule 10),
    and so are NULL event_types: a per-type monitor needs a type key —
    the oracle's recursive fold cannot follow a NULL join key (its seed
    state never advances), while Spark's aggregate() HOF folds the NULL
    group, so the engines silently diverge from day 2 of a NULL series.
    """
    e = time_surface(table(spark, sf, "events")).filter(
        F.col("event_type").isNotNull())
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("cents"))
    )
    series = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sort_array(F.collect_list(F.struct("d", "cents"))).alias("pts"),
    )
    folded = series.withColumn(
        "st",
        F.expr(
            """
            aggregate(
              pts,
              named_struct('n', 0L, 'warm', 0L, 'mu', 0L, 'sp', 0L,
                           'sn', 0L, 'mp', 0L, 'mn', 0L, 'alarm', -1L),
              (acc, x) -> CASE
                WHEN acc.n < 6L THEN named_struct(
                  'n', acc.n + 1L, 'warm', acc.warm + x.cents, 'mu', 0L,
                  'sp', 0L, 'sn', 0L, 'mp', 0L, 'mn', 0L, 'alarm', -1L)
                WHEN acc.n = 6L THEN named_struct(
                  'n', 7L, 'warm', acc.warm + x.cents,
                  'mu', (acc.warm + x.cents) div 7L,
                  'sp', 0L, 'sn', 0L, 'mp', 0L, 'mn', 0L, 'alarm', -1L)
                ELSE named_struct(
                  'n', acc.n + 1L, 'warm', acc.warm, 'mu', acc.mu,
                  'sp', greatest(0L,
                        acc.sp + x.cents - acc.mu - acc.mu div 20L),
                  'sn', greatest(0L,
                        acc.sn + acc.mu - acc.mu div 20L - x.cents),
                  'mp', greatest(acc.mp, greatest(0L,
                        acc.sp + x.cents - acc.mu - acc.mu div 20L)),
                  'mn', greatest(acc.mn, greatest(0L,
                        acc.sn + acc.mu - acc.mu div 20L - x.cents)),
                  'alarm', CASE WHEN acc.alarm >= 0L THEN acc.alarm
                    WHEN greatest(0L,
                         acc.sp + x.cents - acc.mu - acc.mu div 20L)
                         > acc.mu div 4L
                      OR greatest(0L,
                         acc.sn + acc.mu - acc.mu div 20L - x.cents)
                         > acc.mu div 4L
                    THEN acc.n + 1L ELSE -1L END)
              END)
            """
        ),
    )
    return folded.select(
        "event_type", "n_days",
        F.col("st.mu").cast("bigint").alias("mu_cents"),
        F.col("st.mp").cast("bigint").alias("max_cusum_pos"),
        F.col("st.mn").cast("bigint").alias("max_cusum_neg"),
        F.col("st.alarm").cast("bigint").alias("alarm_step"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# MACD over the daily revenue series (integer EMA halvings)
# ---------------------------------------------------------------------------


@query(
    "window_macd_ema",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_REV_DUCK}),
    idx AS (
      SELECT d, c,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM daily
    ),
    ema AS (
      SELECT d, i, c, c AS f, c AS s, CAST(0 AS BIGINT) AS g
      FROM idx WHERE i = 1
      UNION ALL
      SELECT x.d, x.i, x.c,
             (x.c + e.f) // 2 AS f,
             (x.c + 3 * e.s) // 4 AS s,
             CASE WHEN e.i = 1
                  THEN ((x.c + e.f) // 2) - ((x.c + 3 * e.s) // 4)
                  ELSE ((((x.c + e.f) // 2) - ((x.c + 3 * e.s) // 4))
                        + e.g) // 2 END AS g
      FROM ema e JOIN idx x ON x.i = e.i + 1
    ),
    macd AS (
      SELECT d, i, c, f, s, f - s AS m, g,
             (f - s) - g AS hist,
             LAG((f - s) - g) OVER (ORDER BY i) AS prev_hist
      FROM ema
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(c AS BIGINT) AS close_cents,
           CAST(f AS BIGINT) AS ema_fast_cents,
           CAST(s AS BIGINT) AS ema_slow_cents,
           CAST(m AS BIGINT) AS macd_cents,
           CAST(g AS BIGINT) AS signal_cents,
           CAST(hist AS BIGINT) AS hist_cents,
           CAST(CASE WHEN prev_hist IS NOT NULL
                      AND hist > 0 AND prev_hist <= 0
                     THEN 1 ELSE 0 END AS BIGINT) AS cross_up,
           CAST(CASE WHEN prev_hist IS NOT NULL
                      AND hist < 0 AND prev_hist >= 0
                     THEN 1 ELSE 0 END AS BIGINT) AS cross_down
    FROM macd WHERE i > 1 ORDER BY day
    """,
    tags=("window", "timeseries"),
)
def window_macd_ema(spark: SparkSession, sf: str) -> DataFrame:
    """MACD of the daily revenue series with INTEGER exponential
    smoothing: fast EMA alpha=1/2 (halving), slow EMA alpha=1/4
    (quartering), signal = EMA(1/2) of the MACD line, histogram and
    signal-cross flags. alpha restricted to dyadic rationals is the
    price of exactness — every smoothing step is a truncating integer
    division identical in Spark (`div`), DuckDB (`//`), and the
    recursive-CTE oracle, so a float-free MACD that hash-matches
    bit-for-bit (the forecast_holt_linear alpha=1/2 precedent; Wilder's
    alpha=1/14 would force float state). Completes the TA family:
    OHLC bars -> drawdown -> Bollinger -> RSI -> MACD.

    Per-day output from a single fold: the aggregate() HOF carries
    (f, s, g) AND appends each day's state to an array, which
    posexplodes into the day table — one pass, no per-lag self-joins.
    The signal line seeds at the first MACD value (i = 2; day 1 has no
    meaningful MACD and is excluded, documented).

    Scale: calendar-bounded like the other daily-series queries (the
    accumulated array is <= 366 elements/yr); the raw scan folds
    map-side.
    """
    daily = _daily_rev_spark(spark, sf)
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("pts"))
    folded = series.withColumn(
        "rows",
        F.expr(
            """
            aggregate(
              pts,
              named_struct(
                'f', 0L, 's', 0L, 'g', 0L, 'n', 0L,
                'rows', CAST(array() AS
                  array<struct<d: date, c: bigint, f: bigint,
                               s: bigint, g: bigint>>)),
              (acc, x) -> CASE WHEN acc.n = 0L THEN named_struct(
                  'f', x.c, 's', x.c, 'g', 0L, 'n', 1L,
                  'rows', array(named_struct('d', x.d, 'c', x.c,
                                             'f', x.c, 's', x.c,
                                             'g', 0L)))
                ELSE named_struct(
                  'f', (x.c + acc.f) div 2L,
                  's', (x.c + 3L * acc.s) div 4L,
                  'g', CASE WHEN acc.n = 1L
                       THEN ((x.c + acc.f) div 2L)
                            - ((x.c + 3L * acc.s) div 4L)
                       ELSE ((((x.c + acc.f) div 2L)
                              - ((x.c + 3L * acc.s) div 4L))
                             + acc.g) div 2L END,
                  'n', acc.n + 1L,
                  'rows', concat(acc.rows, array(named_struct(
                    'd', x.d, 'c', x.c,
                    'f', (x.c + acc.f) div 2L,
                    's', (x.c + 3L * acc.s) div 4L,
                    'g', CASE WHEN acc.n = 1L
                         THEN ((x.c + acc.f) div 2L)
                              - ((x.c + 3L * acc.s) div 4L)
                         ELSE ((((x.c + acc.f) div 2L)
                                - ((x.c + 3L * acc.s) div 4L))
                               + acc.g) div 2L END))))
              END).rows
            """
        ),
    )
    days = folded.select(
        F.posexplode("rows").alias("idx", "r")
    ).select(
        (F.col("idx") + 1).alias("i"),
        F.col("r.d").alias("d"), F.col("r.c").alias("c"),
        F.col("r.f").alias("f"), F.col("r.s").alias("s"),
        F.col("r.g").alias("g"),
        (F.col("r.f") - F.col("r.s")).alias("m"),
        (F.col("r.f") - F.col("r.s") - F.col("r.g")).alias("hist"),
    )
    w = Window.partitionBy(F.pmod(F.col("c"), F.lit(1))).orderBy("i")
    out = days.withColumn("prev_hist", F.lag("hist").over(w))
    return (
        out.filter(F.col("i") > 1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("close_cents"),
            F.col("f").cast("bigint").alias("ema_fast_cents"),
            F.col("s").cast("bigint").alias("ema_slow_cents"),
            F.col("m").cast("bigint").alias("macd_cents"),
            F.col("g").cast("bigint").alias("signal_cents"),
            F.col("hist").cast("bigint").alias("hist_cents"),
            F.when(F.col("prev_hist").isNotNull()
                   & (F.col("hist") > 0) & (F.col("prev_hist") <= 0), 1)
            .otherwise(0).cast("bigint").alias("cross_up"),
            F.when(F.col("prev_hist").isNotNull()
                   & (F.col("hist") < 0) & (F.col("prev_hist") >= 0), 1)
            .otherwise(0).cast("bigint").alias("cross_down"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Schnabel multi-occasion capture-recapture
# ---------------------------------------------------------------------------


@query(
    "stats_schnabel_recapture",
    oracle="""
    WITH pd AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (
        SELECT user_id, MIN(d) AS fd FROM pd GROUP BY user_id
    ),
    per_day AS (
        SELECT pd.d,
               CAST(COUNT(*) AS BIGINT) AS c_t,
               CAST(SUM(CASE WHEN pd.d > f.fd THEN 1 ELSE 0 END) AS BIGINT)
                   AS r_t,
               CAST(SUM(CASE WHEN pd.d = f.fd THEN 1 ELSE 0 END) AS BIGINT)
                   AS new_marks
        FROM pd JOIN firsts f ON pd.user_id = f.user_id
        GROUP BY pd.d
    ),
    with_m AS (
        SELECT d, c_t, r_t,
               CAST(COALESCE(SUM(new_marks) OVER (
                   ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS m_t
        FROM per_day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_occasions,
           CAST(SUM(c_t * m_t) AS BIGINT) AS sum_cm,
           CAST(SUM(r_t) AS BIGINT) AS sum_recaptures,
           CAST(SUM(c_t * m_t) // (SUM(r_t) + 1) AS BIGINT) AS n_schnabel,
           CAST((SELECT COUNT(*) FROM firsts) AS BIGINT) AS n_observed
    FROM with_m
    """,
    tags=("stats", "events"),
)
def stats_schnabel_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """Schnabel multi-occasion capture-recapture: every purchase day is
    a capture occasion, a user's first day marks them, later days
    recapture them; the population estimate pools all occasions —
    N = sum(C_t * M_t) / (sum(R_t) + 1) (Chapman-adjusted Schnabel, the
    +1 also guards the all-new first occasion). Generalizes the
    two-occasion stats_capture_recapture: one estimate from the whole
    month instead of one day pair, which is what you actually run over
    a crawl's daily host samples.

    Determinism: pure integer counts; M_t (marked before day t) is an
    exclusive-prefix cumulative sum over the calendar-bounded day table
    (constant-pmod window, allowlisted); the estimator is one
    truncating integer division (rule 6). c_t * m_t <= users^2 caps
    the user dimension at ~3e9 before int64 overflow — rescale beyond.

    Scale: (user, day) distinct pairs fold map-side; firsts is one
    user-keyed min; everything after is day-keyed (<= 366 rows).
    """
    e = table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    pd_ = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    firsts = pd_.groupBy("user_id").agg(F.min("d").alias("fd"))
    per_day = (
        pd_.join(firsts, "user_id")
        .groupBy("d")
        .agg(
            F.count("*").cast("bigint").alias("c_t"),
            F.sum(F.when(F.col("d") > F.col("fd"), 1).otherwise(0))
            .cast("bigint").alias("r_t"),
            F.sum(F.when(F.col("d") == F.col("fd"), 1).otherwise(0))
            .cast("bigint").alias("new_marks"),
        )
    )
    w = (Window.partitionBy(F.pmod(F.col("c_t"), F.lit(1))).orderBy("d")
         .rowsBetween(Window.unboundedPreceding, -1))
    with_m = per_day.withColumn(
        "m_t",
        F.coalesce(F.sum("new_marks").over(w), F.lit(0)).cast("bigint"))
    n_obs = firsts.agg(F.count("*").cast("bigint").alias("n_observed"))
    return (
        with_m.agg(
            F.count("*").cast("bigint").alias("n_occasions"),
            F.sum(F.col("c_t") * F.col("m_t")).cast("bigint")
            .alias("sum_cm"),
            F.sum("r_t").cast("bigint").alias("sum_recaptures"),
            F.expr("CAST(SUM(c_t * m_t) div (SUM(r_t) + 1) AS BIGINT)")
            .alias("n_schnabel"),
        )
        .crossJoin(F.broadcast(n_obs))
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-centered Levene) variance homogeneity test
# ---------------------------------------------------------------------------


@query(
    "stats_levene_brown_forsythe",
    oracle="""
    WITH med AS (
        SELECT source, CAST(2 * median(n_chars) AS BIGINT) AS m2
        FROM documents GROUP BY source
    ),
    z AS (
        SELECT d.source, abs(2 * d.n_chars - m.m2) AS z
        FROM documents d JOIN med m ON d.source = m.source
    ),
    g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(z) AS BIGINT) AS s_j,
               CAST(SUM(z * z) AS BIGINT) AS ss_j
        FROM z GROUP BY source
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(SUM(s_j) AS BIGINT) AS s,
               CAST(SUM(ss_j) AS BIGINT) AS ss,
               CAST(SUM(s_j * (s_j // n_j)
                        + (s_j * (s_j % n_j)) // n_j) AS BIGINT) AS gq,
               SUM(CAST((s_j * (s_j % n_j)) % n_j AS DOUBLE) / n_j) AS gf
        FROM g
    ),
    parts AS (
        SELECT k, n,
               CAST(gq - (s * (s // n) + (s * (s % n)) // n) AS DOUBLE)
                   + (gf - CAST((s * (s % n)) % n AS DOUBLE) / n) AS ssb,
               CAST(ss - gq AS DOUBLE) - gf AS ssw
        FROM tot
    )
    SELECT k, n,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 4) AS w_stat
    FROM parts
    """,
    tags=("stats",),
)
def stats_levene_brown_forsythe(spark: SparkSession, sf: str) -> DataFrame:
    """Brown-Forsythe test (median-centered Levene) for variance
    homogeneity across document sources: a one-way ANOVA on the
    absolute deviations from each group's MEDIAN. The companion to
    stats_anova_oneway — ANOVA's pooled-variance F assumes equal group
    variances, and this is the test of that assumption (median
    centering keeps it robust where classic Levene's mean centering is
    itself skew-sensitive).

    Exactness trick: |x - median| is a DOUBLE (medians interpolate to
    .5), which would make the group moments order-dependent float sums
    — so the deviations are computed at TWICE the scale:
    z = |2x - 2m| where 2*median of integers is itself an exact
    integer (a + b of the two middle values). All moments are then
    exact int64 (z <= 2*max_chars ~ 2e3, ss_j fits for ~10^12 docs per
    source) and the W statistic reuses stats_anova_oneway's EXACT
    divmod decomposition of the between-group term (integer quotient
    sum + sub-unit fractional remainders), so the bounded k=20-term
    double sum carries no rounding-grid risk. The doubled scale
    cancels from W exactly (numerator and denominator both scale
    by 4). Like ANOVA (ADVICE r9), neither the grand total s nor any
    s_j is ever squared raw: x*x div m is split as x*(x div m) +
    (x*(x mod m)) div m, putting the int64 bound at mean_z * n^2 <
    9.2e18 (~1e8 docs at z~600) instead of s < 3e9.

    Scale: one groupBy(source) median + a broadcast join back + one
    moment rollup — two scans, map-combinable.
    """
    d = table(spark, sf, "documents")
    med = d.groupBy("source").agg(
        F.expr("CAST(2 * percentile(n_chars, 0.5D) AS BIGINT)").alias("m2"))
    z = (
        d.join(F.broadcast(med), "source")
        .select("source",
                F.abs(2 * F.col("n_chars") - F.col("m2")).alias("z"))
    )
    g = z.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_j"),
        F.sum("z").cast("bigint").alias("s_j"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("ss_j"),
    )
    tot = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("s_j").cast("bigint").alias("s"),
        F.sum("ss_j").cast("bigint").alias("ss"),
        F.expr("CAST(SUM(s_j * (s_j div n_j) "
               "+ (s_j * (s_j % n_j)) div n_j) AS BIGINT)").alias("gq"),
        F.sum(((F.col("s_j") * (F.col("s_j") % F.col("n_j")))
               % F.col("n_j")).cast("double")
              / F.col("n_j")).alias("gf"),
    )
    ssb = ((F.col("gq")
            - F.expr("s * (s div n) + (s * (s % n)) div n")).cast("double")
           + (F.col("gf")
              - ((F.col("s") * (F.col("s") % F.col("n"))) % F.col("n"))
              .cast("double") / F.col("n")))
    ssw = (F.col("ss") - F.col("gq")).cast("double") - F.col("gf")
    return tot.select(
        "k", "n",
        F.round((ssb / (F.col("k") - 1))
                / (ssw / (F.col("n") - F.col("k"))), 4).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b between daily event volume and daily revenue (week-blocked)
# ---------------------------------------------------------------------------

_DAILY_XY_DUCK = """
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100, 0) AS BIGINT) END), 0)
                    AS BIGINT) AS y
        FROM events GROUP BY CAST(ts AS DATE)
"""


def _daily_xy_spark(spark: SparkSession, sf: str) -> DataFrame:
    """Per-day (total event count, purchase revenue cents) — the bivariate
    daily series shared by the Kendall and Granger queries. Days without
    purchases keep x and get y=0 (COALESCE in both engines)."""
    e = table(spark, sf, "events")
    return e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase",
                         cents(F.col("value")))),
            F.lit(0),
        ).cast("bigint").alias("y"),
    )


@query(
    "stats_kendall_tau_weekly",
    oracle=f"""
    WITH daily AS ({_DAILY_XY_DUCK}),
    wk AS (
        SELECT d, x, y,
               CAST(CAST(d - DATE '2024-01-01' AS BIGINT) // 7 AS BIGINT)
                   AS w
        FROM daily
    ),
    p AS (
        SELECT CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc,
               CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS ties_x,
               CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT)
                   AS ties_y,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM wk a JOIN wk b ON a.w = b.w AND b.d > a.d
    )
    SELECT n_pairs, conc, disc, ties_x, ties_y,
           ROUND(CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST((n_pairs - ties_x) * (n_pairs - ties_y)
                             AS DOUBLE)), 4) AS tau_b
    FROM p
    """,
    tags=("stats", "timeseries"),
)
def stats_kendall_tau_weekly(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily event volume and
    daily purchase revenue, over a WEEK-BLOCKED pair space: concordant /
    discordant pairs are counted only within the same 7-day block
    (anchored at 2024-01-01), the standard guard against secular trend
    confounding both series — and, at scale, the device that keeps the
    pair space linear in days (<= C(7,2) pairs per calendar week)
    instead of quadratic.

    Determinism: everything up to tau is exact int64 (sign tests on
    integer products; daily cents deltas < 2e9 so (b.x-a.x)*(b.y-a.y)
    fits); tau-b's sqrt is IEEE-correctly-rounded in both engines over
    the same int64->double cast, rounded 4 dp (rule 2; the sqrt-only
    tree is the stats_ks_two_sample precedent).

    Scale: the raw scan folds map-side to <=366 day rows; the pair join
    is an EQUI-join on the week block (never a nested loop) over the
    bounded day table.
    """
    daily = _daily_xy_spark(spark, sf)
    wk = daily.select(
        "d", "x", "y",
        F.expr("CAST(datediff(d, DATE '2024-01-01') div 7 AS BIGINT)")
        .alias("w"),
    )
    a, b = wk.alias("a"), wk.alias("b")
    prod = (F.col("b.x") - F.col("a.x")) * (F.col("b.y") - F.col("a.y"))
    p = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("b.d") > F.col("a.d")))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint")
            .alias("conc"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint")
            .alias("disc"),
            F.sum(F.when(F.col("b.x") == F.col("a.x"), 1).otherwise(0))
            .cast("bigint").alias("ties_x"),
            F.sum(F.when(F.col("b.y") == F.col("a.y"), 1).otherwise(0))
            .cast("bigint").alias("ties_y"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
    )
    return p.select(
        "n_pairs", "conc", "disc", "ties_x", "ties_y",
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / F.sqrt(((F.col("n_pairs") - F.col("ties_x"))
                      * (F.col("n_pairs") - F.col("ties_y")))
                     .cast("double")),
            4,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Granger-lite lagged regression: does yesterday's volume predict revenue?
# ---------------------------------------------------------------------------


@query(
    "stats_granger_lagged_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_XY_DUCK}),
    lagged AS (
        SELECT y AS yt,
               lag(y) OVER (ORDER BY d) AS u,
               lag(x) OVER (ORDER BY d) AS v
        FROM daily WHERE d IS NOT NULL
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(u) AS BIGINT) AS su,
               CAST(SUM(v) AS BIGINT) AS sv,
               CAST(SUM(yt) AS BIGINT) AS sy,
               CAST(SUM(u * u) AS BIGINT) AS suu,
               CAST(SUM(v * v) AS BIGINT) AS svv,
               CAST(SUM(yt * yt) AS BIGINT) AS syy,
               CAST(SUM(u * v) AS BIGINT) AS suv,
               CAST(SUM(u * yt) AS BIGINT) AS suy,
               CAST(SUM(v * yt) AS BIGINT) AS svy
        FROM lagged WHERE u IS NOT NULL
    ),
    cm AS (
        SELECT m,
               CAST(CAST(m * suu - su * su AS BIGINT) AS DOUBLE) AS muu,
               CAST(CAST(m * svv - sv * sv AS BIGINT) AS DOUBLE) AS mvv,
               CAST(CAST(m * syy - sy * sy AS BIGINT) AS DOUBLE) AS myy,
               CAST(CAST(m * suv - su * sv AS BIGINT) AS DOUBLE) AS muv,
               CAST(CAST(m * suy - su * sy AS BIGINT) AS DOUBLE) AS muy,
               CAST(CAST(m * svy - sv * sy AS BIGINT) AS DOUBLE) AS mvy
        FROM mom
    ),
    fit AS (
        SELECT m, myy,
               muu * mvv - muv * muv AS det,
               myy - ((muy * mvv - mvy * muv) * muy
                      + (mvy * muu - muy * muv) * mvy)
                     / (muu * mvv - muv * muv) AS sse_full,
               myy - muy * muy / muu AS sse_rest,
               (mvy * muu - muy * muv) / (muu * mvv - muv * muv) AS b2
        FROM cm
    )
    SELECT m AS n_obs,
           ROUND(b2, 6) AS b_lag_count,
           ROUND((sse_rest - sse_full)
                 / (sse_full / CAST(m - 3 AS DOUBLE)), 4) AS f_stat,
           ROUND(sse_full / sse_rest, 4) AS sse_ratio
    FROM fit
    """,
    tags=("stats", "timeseries"),
)
def stats_granger_lagged_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Granger-lite causality screen on the daily series: does
    yesterday's EVENT VOLUME explain today's REVENUE beyond what
    yesterday's revenue already does? Ordinary least squares of y_t on
    (1, y_{t-1}) [restricted] vs (1, y_{t-1}, x_{t-1}) [full], reported
    as the incremental-F of the volume lag, its coefficient, and the
    SSE ratio — the one-lag, two-series core of the Granger test, in
    closed form from exact integer cross-moments.

    Determinism: all ten raw moments are exact int64 over the lag-paired
    day table; the n-scaled centered moments M_ab = m*S_ab - S_a*S_b are
    computed IN INT64 (exact) in both engines, and only then cast to
    double for the 2x2 normal-equation solve — every double after that
    point is the product/difference/quotient of IDENTICAL doubles
    through an identical expression tree (rule 2), so f_stat/b2/ratio
    agree bit-for-bit before the output rounding. int64 bound: the
    binding term is Sy^2 ~ (days * daily_cents)^2 < 9.2e18, i.e. daily
    revenue < ~8e6 cents (~$82k/day) on a full-year series — rescale
    cents to dollars beyond (the series shape, not the unit, is what
    Granger sees).

    Scale: one map-combinable fold to <=366 day rows, one bounded
    window lag (constant-pmod allowlisted idiom), one scalar moment
    row; cost is the scan.

    r14 contract: the NULL day (NULL-ts events) is dropped from the
    lag ordering on both engines (rule 10 — the shared daily helper
    keeps it for the week-blocked rank queries, where both engines
    already agree; here the `ORDER BY d` lag pairing diverges on NULL
    placement).
    """
    daily = _daily_xy_spark(spark, sf).filter(F.col("d").isNotNull())
    w = Window.partitionBy(F.pmod(F.col("x"), F.lit(1))).orderBy("d")
    lagged = daily.select(
        F.col("y").alias("yt"),
        F.lag("y").over(w).alias("u"),
        F.lag("x").over(w).alias("v"),
    ).filter(F.col("u").isNotNull())
    mom = lagged.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum("yt").cast("bigint").alias("sy"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("suu"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
        F.sum(F.col("yt") * F.col("yt")).cast("bigint").alias("syy"),
        F.sum(F.col("u") * F.col("v")).cast("bigint").alias("suv"),
        F.sum(F.col("u") * F.col("yt")).cast("bigint").alias("suy"),
        F.sum(F.col("v") * F.col("yt")).cast("bigint").alias("svy"),
    )
    cm = mom.select(
        "m",
        (F.col("m") * F.col("suu") - F.col("su") * F.col("su"))
        .cast("bigint").cast("double").alias("muu"),
        (F.col("m") * F.col("svv") - F.col("sv") * F.col("sv"))
        .cast("bigint").cast("double").alias("mvv"),
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("bigint").cast("double").alias("myy"),
        (F.col("m") * F.col("suv") - F.col("su") * F.col("sv"))
        .cast("bigint").cast("double").alias("muv"),
        (F.col("m") * F.col("suy") - F.col("su") * F.col("sy"))
        .cast("bigint").cast("double").alias("muy"),
        (F.col("m") * F.col("svy") - F.col("sv") * F.col("sy"))
        .cast("bigint").cast("double").alias("mvy"),
    )
    det = F.col("muu") * F.col("mvv") - F.col("muv") * F.col("muv")
    b2 = (F.col("mvy") * F.col("muu")
          - F.col("muy") * F.col("muv")) / det
    sse_full = (F.col("myy")
                - ((F.col("muy") * F.col("mvv")
                    - F.col("mvy") * F.col("muv")) * F.col("muy")
                   + (F.col("mvy") * F.col("muu")
                      - F.col("muy") * F.col("muv")) * F.col("mvy"))
                / det)
    sse_rest = F.col("myy") - F.col("muy") * F.col("muy") / F.col("muu")
    return cm.select(
        F.col("m").alias("n_obs"),
        F.round(b2, 6).alias("b_lag_count"),
        F.round((sse_rest - sse_full)
                / (sse_full / (F.col("m") - 3).cast("double")), 4)
        .alias("f_stat"),
        F.round(sse_full / sse_rest, 4).alias("sse_ratio"),
    )


# ---------------------------------------------------------------------------
# Cramér's V: strength of the source <-> language association
# ---------------------------------------------------------------------------


@query(
    "stats_cramers_v_source_lang",
    oracle="""
    WITH obs AS (
        SELECT source AS r, lang AS c, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY source, lang
    ),
    margins AS (
        SELECT r, c, o,
               CAST(SUM(o) OVER (PARTITION BY r) AS BIGINT) AS row_n,
               CAST(SUM(o) OVER (PARTITION BY c) AS BIGINT) AS col_n,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM obs
    ),
    agg AS (
        SELECT CAST(MIN(n) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cols,
               SUM((CAST(o AS DOUBLE)
                    - CAST(row_n AS DOUBLE) * col_n / n)
                   * (CAST(o AS DOUBLE)
                      - CAST(row_n AS DOUBLE) * col_n / n)
                   / (CAST(row_n AS DOUBLE) * col_n / n)) AS chi2
        FROM margins
    )
    SELECT n, n_rows, n_cols, ROUND(chi2, 4) AS chi2,
           ROUND(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * (CASE WHEN n_rows < n_cols THEN n_rows
                         ELSE n_cols END - 1))), 4) AS cramers_v
    FROM agg
    """,
    tags=("stats", "text", "llm-pipeline"),
)
def stats_cramers_v_source_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Cramér's V for the source x language contingency table — the
    normalized [0, 1] effect size that answers the curation question the
    raw chi-square can't: HOW confounded is language mix with source?
    (A corpus where one source supplies all the German makes
    per-language quality conclusions unattributable.) The fixture
    carries real association (V ~ 0.19, probed in DuckDB before
    implementing — the uniform event-type pairings measured V < 0.02
    and were rejected as degenerate).

    Determinism: exact integer contingency cells + margins via
    bounded-domain windows (<= sources x langs = 100 cells; the
    stats_chi_square_independence machinery verbatim); chi2 sums one
    shared IEEE tree over the single-partition cell table; V adds one
    sqrt of identical doubles (rule 2), both rounded 4 dp.

    Scale: corpus-sized work is ONE map-combinable count to r*k cells;
    everything downstream is constant-size.
    """
    d = table(spark, sf, "documents")
    obs = (
        d.select(F.col("source").alias("r"), F.col("lang").alias("c"))
        .groupBy("r", "c")
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    w_r = Window.partitionBy("r")
    w_c = Window.partitionBy("c")
    w_n = Window.partitionBy(F.pmod(F.col("o"), F.lit(1)))
    m = obs.select(
        "r", "c", "o",
        F.sum("o").over(w_r).cast("bigint").alias("row_n"),
        F.sum("o").over(w_c).cast("bigint").alias("col_n"),
        F.sum("o").over(w_n).cast("bigint").alias("n"),
    )
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    agg = m.agg(
        F.min("n").cast("bigint").alias("n"),
        F.countDistinct("r").cast("bigint").alias("n_rows"),
        F.countDistinct("c").cast("bigint").alias("n_cols"),
        F.sum((F.col("o").cast("double") - expected)
              * (F.col("o").cast("double") - expected) / expected)
        .alias("chi2"),
    )
    return agg.select(
        "n", "n_rows", "n_cols",
        F.round(F.col("chi2"), 4).alias("chi2"),
        F.round(F.sqrt(F.col("chi2")
                       / (F.col("n").cast("double")
                          * (F.when(F.col("n_rows") < F.col("n_cols"),
                                    F.col("n_rows"))
                             .otherwise(F.col("n_cols")) - 1))), 4)
        .alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Weekday-effect ANOVA: how much daily-volume variance is day-of-week?
# ---------------------------------------------------------------------------


@query(
    "stats_weekday_effect_anova",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    g AS (
        SELECT CAST(dayofweek(d) AS BIGINT) AS wd,
               CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(x) AS BIGINT) AS s_j,
               CAST(SUM(x * x) AS BIGINT) AS ss_j
        FROM daily GROUP BY dayofweek(d)
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(SUM(s_j) AS BIGINT) AS s,
               CAST(SUM(ss_j) AS BIGINT) AS ss,
               CAST(SUM(s_j * (s_j // n_j)
                        + (s_j * (s_j % n_j)) // n_j) AS BIGINT) AS gq,
               SUM(CAST((s_j * (s_j % n_j)) % n_j AS DOUBLE) / n_j) AS gf
        FROM g
    ),
    parts AS (
        SELECT k, n,
               CAST(gq - (s * (s // n) + (s * (s % n)) // n) AS DOUBLE)
                   + (gf - CAST((s * (s % n)) % n AS DOUBLE) / n) AS ssb,
               CAST(ss - gq AS DOUBLE) - gf AS ssw
        FROM tot
    )
    SELECT k, n,
           ROUND(ssb, 4) AS ss_between,
           ROUND(ssw, 4) AS ss_within,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat,
           ROUND(ssb / (ssb + ssw), 4) AS eta_squared
    FROM parts
    """,
    tags=("stats", "timeseries"),
)
def stats_weekday_effect_anova(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week effect on daily event volume: one-way ANOVA of the
    daily counts grouped by weekday, with eta-squared — the SHARE of
    daily-volume variance explained by the weekly cycle. Completes the
    seasonality triple: stats_acf_daily_lags DETECTS the period,
    forecast_backtest_seasonal_naive EXPLOITS it, this QUANTIFIES how
    much of the variance it actually owns (fixture probed
    non-degenerate: F=1.81, eta2=0.32).

    Determinism: daily counts are exact int64; the weekday key maps
    Spark `dayofweek(d) - 1` == DuckDB `dayofweek(d)` (both Sunday=0,
    verified on known dates); the between-group term reuses
    stats_anova_oneway's exact divmod decomposition (nothing ever
    squares a raw sum), so SSB/SSW render from an exact integer part
    plus a <k-magnitude fractional sum; eta2 = ssb/(ssb+ssw) is one
    extra division of identical doubles (rule 2).

    Scale: one map-combinable fold to <=366 day rows, a 7-group fold,
    and a scalar; cost is the scan.
    """
    e = table(spark, sf, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("x"))
    g = daily.groupBy(
        (F.dayofweek("d") - 1).cast("bigint").alias("wd")
    ).agg(
        F.count("*").cast("bigint").alias("n_j"),
        F.sum("x").cast("bigint").alias("s_j"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss_j"),
    )
    tot = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("s_j").cast("bigint").alias("s"),
        F.sum("ss_j").cast("bigint").alias("ss"),
        F.expr("CAST(SUM(s_j * (s_j div n_j) "
               "+ (s_j * (s_j % n_j)) div n_j) AS BIGINT)").alias("gq"),
        F.sum(((F.col("s_j") * (F.col("s_j") % F.col("n_j")))
               % F.col("n_j")).cast("double")
              / F.col("n_j")).alias("gf"),
    )
    ssb = ((F.col("gq")
            - F.expr("s * (s div n) + (s * (s % n)) div n")).cast("double")
           + (F.col("gf")
              - ((F.col("s") * (F.col("s") % F.col("n"))) % F.col("n"))
              .cast("double") / F.col("n")))
    ssw = (F.col("ss") - F.col("gq")).cast("double") - F.col("gf")
    return tot.select(
        "k", "n",
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round((ssb / (F.col("k") - 1))
                / (ssw / (F.col("n") - F.col("k"))), 4).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 4).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (week-blocked) on daily revenue
# ---------------------------------------------------------------------------


@query(
    "stats_theil_sen_weekly",
    oracle=f"""
    WITH daily AS ({_DAILY_XY_DUCK}),
    wk AS (
        SELECT d, y,
               CAST(CAST(d - DATE '2024-01-01' AS BIGINT) // 7 AS BIGINT)
                   AS w
        FROM daily
    ),
    slopes AS (
        SELECT CAST(b.y - a.y AS DOUBLE)
               / CAST(b.d - a.d AS BIGINT) AS slope
        FROM wk a JOIN wk b ON a.w = b.w AND b.d > a.d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_slopes,
           ROUND(median(slope), 4) AS median_slope,
           median(slope) < 0 AS is_downtrend
    FROM slopes
    """,
    tags=("stats", "timeseries"),
)
def stats_theil_sen_weekly(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend estimate of daily revenue, week-blocked:
    the median of pairwise difference quotients (y_b - y_a)/(d_b - d_a)
    over within-week day pairs — the outlier-immune complement to
    stats_granger_lagged_daily's OLS (one flash-sale day drags a
    least-squares slope; the slope MEDIAN shrugs it off). Blocking by
    calendar week is the same device as stats_kendall_tau_weekly: it
    de-confounds the secular level AND keeps the pair space linear in
    days (<= C(7,2) slopes per week) instead of quadratic.

    Determinism: every slope is one division of exact int64 deltas
    (identical IEEE doubles in both engines — Spark datediff == DuckDB
    date subtraction, verified by the shared week key); the median
    interpolates identically over identical sorted doubles
    (lower + (upper-lower)*frac in both engines); the trend flag
    compares the same exact double to zero, so it cannot diverge.
    Rendered at 4 dp (fixture probed non-degenerate: 85 slopes,
    median -6806.5 cents/day).

    Scale: daily fold map-side; the pair join is an EQUI-join on the
    week block over the <=366-row day table.
    """
    daily = _daily_xy_spark(spark, sf)
    wk = daily.select(
        "d", "y",
        F.expr("CAST(datediff(d, DATE '2024-01-01') div 7 AS BIGINT)")
        .alias("w"),
    )
    a, b = wk.alias("a"), wk.alias("b")
    slopes = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("b.d") > F.col("a.d")))
        .select(
            ((F.col("b.y") - F.col("a.y")).cast("double")
             / F.datediff(F.col("b.d"), F.col("a.d")).cast("bigint"))
            .alias("slope"))
    )
    return slopes.agg(
        F.count("*").cast("bigint").alias("n_slopes"),
        F.round(F.expr("percentile(slope, 0.5D)"), 4)
        .alias("median_slope"),
        (F.expr("percentile(slope, 0.5D)") < 0).alias("is_downtrend"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (week-blocked) on daily revenue
# ---------------------------------------------------------------------------


@query(
    "stats_mann_kendall_weekly",
    oracle=f"""
    WITH daily AS ({_DAILY_XY_DUCK}),
    wk AS (
        SELECT d, y,
               CAST(CAST(d - DATE '2024-01-01' AS BIGINT) // 7 AS BIGINT)
                   AS w
        FROM daily
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM wk a JOIN wk b ON a.w = b.w AND b.d > a.d
    ),
    blocks AS (
        SELECT CAST(SUM(n_w * (n_w - 1) * (2 * n_w + 5)) AS BIGINT) AS t1
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_w FROM wk GROUP BY w)
    ),
    ties AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS t2
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
              FROM wk GROUP BY w, y)
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM wk),
    fin AS (
        SELECT n_days, s_stat, t1 - t2 AS var_num,
               CASE WHEN s_stat > 0 THEN
                        CAST(s_stat - 1 AS DOUBLE)
                        / sqrt(CAST(t1 - t2 AS DOUBLE) / 18)
                    WHEN s_stat < 0 THEN
                        CAST(s_stat + 1 AS DOUBLE)
                        / sqrt(CAST(t1 - t2 AS DOUBLE) / 18)
                    ELSE 0.0 END AS z
        FROM s, blocks, ties, nd
    )
    SELECT n_days, s_stat, var_num, ROUND(z, 4) AS z,
           abs(z) > 1.96 AS is_significant
    FROM fin
    """,
    tags=("stats", "timeseries"),
)
def stats_mann_kendall_weekly(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Kendall trend TEST on daily revenue, week-blocked — the
    classic nonparametric companion to stats_theil_sen_weekly's trend
    ESTIMATE (MK + Sen's slope is the standard monitoring duo:
    MK answers "is there a monotone trend at all", Sen answers "how
    steep"). S sums pairwise signs within calendar-week blocks;
    independent blocks make Var(S) the SUM of per-block variances
    n(n-1)(2n+5)/18 with the standard tie correction, and the
    continuity-corrected z = (S -/+ 1)/sqrt(Var) (probed
    non-degenerate: S=-13, z=-0.899, agreeing in sign with Theil-Sen's
    negative median slope).

    Determinism: S, the variance numerator (t1 - t2, kept at 18x scale
    as an exact int64), and all tie counts are pure integers; z divides
    int64-derived doubles through one sqrt (identical tree both
    engines, rule-9-safe sqrt-only flag at |z| > 1.96), rendered 4 dp.

    Scale: the pair space is week-blocked (linear in days); the
    variance terms are two map-combinable grouped counts over the
    <=366-row day table; three scalar frames combine by broadcast.
    """
    daily = _daily_xy_spark(spark, sf)
    wk = daily.select(
        "d", "y",
        F.expr("CAST(datediff(d, DATE '2024-01-01') div 7 AS BIGINT)")
        .alias("w"),
    )
    a, b = wk.alias("a"), wk.alias("b")
    s = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("b.d") > F.col("a.d")))
        .agg(F.sum(
            F.when(F.col("b.y") > F.col("a.y"), 1)
            .when(F.col("b.y") < F.col("a.y"), -1).otherwise(0))
            .cast("bigint").alias("s_stat"))
    )
    blocks = (
        wk.groupBy("w").agg(F.count("*").cast("bigint").alias("n_w"))
        .agg(F.sum(F.col("n_w") * (F.col("n_w") - 1)
                   * (2 * F.col("n_w") + 5)).cast("bigint").alias("t1"))
    )
    ties = (
        wk.groupBy("w", "y").agg(F.count("*").cast("bigint").alias("t"))
        .agg(F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
            F.lit(0)).cast("bigint").alias("t2"))
    )
    nd = wk.agg(F.count("*").cast("bigint").alias("n_days"))
    fin = (
        s.crossJoin(F.broadcast(blocks))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(nd))
    )
    var_num = F.col("t1") - F.col("t2")
    sd = F.sqrt(var_num.cast("double") / 18)
    z = (F.when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1).cast("double") / sd)
         .when(F.col("s_stat") < 0,
               (F.col("s_stat") + 1).cast("double") / sd)
         .otherwise(F.lit(0.0)))
    return fin.select(
        "n_days", "s_stat",
        var_num.cast("bigint").alias("var_num"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("is_significant"),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift monitor over the per-type daily revenue series
# ---------------------------------------------------------------------------

# The recurrence, written once per engine with the SAME integer tree
# (rule 6: Spark `div` <-> DuckDB `//`, both truncate toward zero).
# State per type: running count n, running sum s, the two one-sided
# Page-Hinkley sums mup/mdn, their running extrema mnm/mxm, and the
# first alarm step per side. mean_t = s_t div t is the RUNNING mean —
# the defining difference from CUSUM's frozen warm-up mu.
_PH_SPARK_MEAN = "((acc.s + x.cents) div (acc.n + 1L))"
_PH_SPARK_MUP = (f"(acc.mup + x.cents - {_PH_SPARK_MEAN}"
                 f" - ({_PH_SPARK_MEAN} div 100L))")
_PH_SPARK_MDN = (f"(acc.mdn + x.cents - {_PH_SPARK_MEAN}"
                 f" + ({_PH_SPARK_MEAN} div 100L))")
_PH_DUCK_MEAN = "((c.s + d.cents) // d.i)"
_PH_DUCK_MUP = (f"(c.mup + d.cents - {_PH_DUCK_MEAN}"
                f" - ({_PH_DUCK_MEAN} // 100))")
_PH_DUCK_MDN = (f"(c.mdn + d.cents - {_PH_DUCK_MEAN}"
                f" + ({_PH_DUCK_MEAN} // 100))")


@query(
    "stats_page_hinkley_drift",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    idx AS (
      SELECT event_type, cents,
             CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
      FROM daily
    ),
    -- Page-Hinkley replayed one row per (type, step); recursive CTE not
    -- list_reduce (DuckDB 1.0 struct-accumulator bug, rule 7). The seed
    -- row is the n=0 state; every observation, INCLUDING the first, goes
    -- through the same recurrence arm.
    seed AS (
      SELECT DISTINCT event_type, CAST(0 AS BIGINT) AS i,
             CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS mup,
             CAST(0 AS BIGINT) AS mnm, CAST(0 AS BIGINT) AS mdn,
             CAST(0 AS BIGINT) AS mxm, CAST(-1 AS BIGINT) AS aup,
             CAST(-1 AS BIGINT) AS adn
      FROM idx
    ),
    ph AS (
      SELECT * FROM seed
      UNION ALL
      SELECT d.event_type, d.i, c.s + d.cents,
        {_PH_DUCK_MUP},
        least(c.mnm, {_PH_DUCK_MUP}),
        {_PH_DUCK_MDN},
        greatest(c.mxm, {_PH_DUCK_MDN}),
        CASE WHEN c.aup >= 0 THEN c.aup
             WHEN {_PH_DUCK_MUP} - least(c.mnm, {_PH_DUCK_MUP})
                  > {_PH_DUCK_MEAN} // 4
             THEN d.i ELSE CAST(-1 AS BIGINT) END,
        CASE WHEN c.adn >= 0 THEN c.adn
             WHEN greatest(c.mxm, {_PH_DUCK_MDN}) - {_PH_DUCK_MDN}
                  > {_PH_DUCK_MEAN} // 4
             THEN d.i ELSE CAST(-1 AS BIGINT) END
      FROM ph c JOIN idx d
        ON d.event_type = c.event_type AND d.i = c.i + 1
    ),
    final AS (
      SELECT event_type, i, mup - mnm AS ph_up, mxm - mdn AS ph_down,
             aup, adn,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY i DESC) AS rl
      FROM ph
    )
    SELECT event_type, CAST(i AS BIGINT) AS n_days,
           CAST(ph_up AS BIGINT) AS ph_up,
           CAST(ph_down AS BIGINT) AS ph_down,
           CAST(aup AS BIGINT) AS alarm_up_step,
           CAST(adn AS BIGINT) AS alarm_down_step
    FROM final WHERE rl = 1 ORDER BY event_type
    """,
    tags=("stats", "timeseries", "drift"),
)
def stats_page_hinkley_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Page-Hinkley drift monitor per event type: m_t accumulates
    x_t - mean_t - delta against the RUNNING mean (mean_t = s_t div t,
    delta = 1% slack), the monitor tracks M_t = min(m) (resp. max for
    the downward side), and alarms the first step the excursion
    m_t - M_t exceeds lambda = mean_t div 4. The running-mean
    adaptation is what distinguishes Page-Hinkley from the tabular
    CUSUM (stats_cusum_drift): CUSUM freezes mu after a 7-day warm-up
    and clamps its sums at zero, so it answers "did the level leave the
    calibration window?", while Page-Hinkley's mean keeps absorbing
    slow drift and its unclamped sum answers "was there a sustained
    run away from everything seen so far?". Degeneracy-probed before
    building: on the sf0.01 fixture the two monitors alarm on
    DIFFERENT days with different orderings across the five event
    types (PH up-alarms 6/10/13/16/23 vs CUSUM 9/9/10/14/15), so the
    pair is non-redundant.

    Determinism: the entire recurrence is int64 cents with truncating
    `div` (DuckDB `//`, rule 6) — no floats anywhere, so the output is
    hash-exact by construction. The fold runs ONCE per type via the
    aggregate() HOF over the day-ordered point list; the oracle replays
    it as a recursive CTE seeded with the n=0 state (rule 7).

    Scale: one map-combinable (type, day) aggregate, then a per-type
    fold whose state is 8 ints; series length is calendar-bounded, and
    the per-type lists never co-shuffle with raw events.
    NULL-ts events are excluded on both engines (time_surface, rule 10),
    and so are NULL event_types: a per-type monitor needs a type key —
    the oracle's recursive fold cannot follow a NULL join key (its seed
    state never advances), while Spark's aggregate() HOF folds the NULL
    group, so the engines silently diverge from day 2 of a NULL series.
    """
    e = time_surface(table(spark, sf, "events")).filter(
        F.col("event_type").isNotNull())
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("cents"))
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "cents"))).alias("pts"),
    )
    folded = series.withColumn(
        "st",
        F.expr(f"""
            aggregate(
              pts,
              named_struct('n', 0L, 's', 0L, 'mup', 0L, 'mnm', 0L,
                           'mdn', 0L, 'mxm', 0L, 'aup', -1L, 'adn', -1L),
              (acc, x) -> named_struct(
                'n', acc.n + 1L,
                's', acc.s + x.cents,
                'mup', {_PH_SPARK_MUP},
                'mnm', least(acc.mnm, {_PH_SPARK_MUP}),
                'mdn', {_PH_SPARK_MDN},
                'mxm', greatest(acc.mxm, {_PH_SPARK_MDN}),
                'aup', CASE WHEN acc.aup >= 0L THEN acc.aup
                       WHEN {_PH_SPARK_MUP}
                            - least(acc.mnm, {_PH_SPARK_MUP})
                            > {_PH_SPARK_MEAN} div 4L
                       THEN acc.n + 1L ELSE -1L END,
                'adn', CASE WHEN acc.adn >= 0L THEN acc.adn
                       WHEN greatest(acc.mxm, {_PH_SPARK_MDN})
                            - {_PH_SPARK_MDN}
                            > {_PH_SPARK_MEAN} div 4L
                       THEN acc.n + 1L ELSE -1L END))
        """),
    )
    return folded.select(
        "event_type",
        F.col("st.n").alias("n_days"),
        (F.col("st.mup") - F.col("st.mnm")).cast("bigint").alias("ph_up"),
        (F.col("st.mxm") - F.col("st.mdn")).cast("bigint").alias("ph_down"),
        F.col("st.aup").alias("alarm_up_step"),
        F.col("st.adn").alias("alarm_down_step"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# EWMA control chart over the per-type daily revenue series
# ---------------------------------------------------------------------------

# The recurrence, written once per engine with the SAME integer tree
# (rule 6: Spark `div` <-> DuckDB `//`, both truncate toward zero).
# alpha = 1/4 via the exact update z' = (3z + x) div 4; the control
# limit is the frozen warm-up center's mu div 8. State per type, 6 ints:
# day counter, warm-up sum, frozen mu, smoothed z, max |excursion|,
# first alarm.
_EW_SPARK_Z = "((3L * acc.z + x.cents) div 4L)"
_EW_SPARK_EXC = f"abs({_EW_SPARK_Z} - acc.mu)"
_EW_DUCK_Z = "((3 * c.z + d.cents) // 4)"
_EW_DUCK_EXC = f"abs({_EW_DUCK_Z} - c.mu)"


@query(
    "stats_ewma_control_chart",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    idx AS (
      SELECT event_type, cents,
             CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
      FROM daily
    ),
    -- EWMA chart replayed one row per (type, step); recursive CTE not
    -- list_reduce (DuckDB 1.0 struct-accumulator bug, rule 7). Seed is
    -- the n=0 state; warm-up rows only accumulate, the 7th observation
    -- freezes mu and seeds z, monitoring starts at the 8th.
    seed AS (
      SELECT DISTINCT event_type, CAST(0 AS BIGINT) AS i,
             CAST(0 AS BIGINT) AS warm, CAST(0 AS BIGINT) AS mu,
             CAST(0 AS BIGINT) AS z, CAST(0 AS BIGINT) AS mx,
             CAST(-1 AS BIGINT) AS alarm
      FROM idx
    ),
    ch AS (
      SELECT * FROM seed
      UNION ALL
      SELECT d.event_type, d.i,
        CASE WHEN c.i < 7 THEN c.warm + d.cents ELSE c.warm END,
        CASE WHEN c.i < 6 THEN CAST(0 AS BIGINT)
             WHEN c.i = 6 THEN (c.warm + d.cents) // 7
             ELSE c.mu END,
        CASE WHEN c.i < 6 THEN CAST(0 AS BIGINT)
             WHEN c.i = 6 THEN (c.warm + d.cents) // 7
             ELSE {_EW_DUCK_Z} END,
        CASE WHEN c.i < 7 THEN CAST(0 AS BIGINT)
             ELSE greatest(c.mx, {_EW_DUCK_EXC}) END,
        CASE WHEN c.i < 7 THEN CAST(-1 AS BIGINT)
             WHEN c.alarm >= 0 THEN c.alarm
             WHEN {_EW_DUCK_EXC} > c.mu // 8 THEN d.i
             ELSE CAST(-1 AS BIGINT) END
      FROM ch c JOIN idx d
        ON d.event_type = c.event_type AND d.i = c.i + 1
    ),
    final AS (
      SELECT event_type, i, mu, z, mx, alarm,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY i DESC) AS rl
      FROM ch
    )
    SELECT event_type, CAST(i AS BIGINT) AS n_days,
           CAST(mu AS BIGINT) AS mu_cents,
           CAST(z AS BIGINT) AS ewma_cents,
           CAST(mx AS BIGINT) AS max_excursion,
           CAST(alarm AS BIGINT) AS alarm_step
    FROM final WHERE rl = 1 ORDER BY event_type
    """,
    tags=("stats", "timeseries", "drift"),
)
def stats_ewma_control_chart(spark: SparkSession, sf: str) -> DataFrame:
    """EWMA control chart per event type: a 7-day warm-up freezes the
    center line mu (CUSUM's calibration device), the smoothed statistic
    z seeds at mu and updates z' = (3z + x) div 4 (alpha = 1/4, exact
    in int64), and the chart alarms the first day |z - mu| exceeds
    mu div 8. Third member of the drift family, probed NON-REDUNDANT
    before building (pytest-pinned): on the sf0.01 fixture its alarm
    vector is [-1, 18, 17, 14, 14] (alphabetical types) vs CUSUM's
    [9, 9, 10, 14, 15] and Page-Hinkley's up-side [6, 10, 13, 16, 23] —
    the exponential memory tolerates the click-series transient that
    trips BOTH cousins (no alarm at all), while confirming the
    sustained purchase/view shifts a week earlier than PH. The three
    monitors answer different questions: CUSUM "did the level leave the
    calibration window?", PH "was there a sustained run away from
    everything seen so far?", EWMA "is the smoothed level currently
    outside the band?".

    Determinism: the entire recurrence is int64 cents with truncating
    `div` (DuckDB `//`, rule 6) — alpha = 1/4 makes the EWMA update a
    single exact integer expression, so the output is hash-exact by
    construction (the same power-of-two-weights device as window_ewma).
    The fold runs ONCE per type via the aggregate() HOF over the
    day-ordered point list; the oracle replays it as a recursive CTE
    seeded with the n=0 state (rule 7).

    Scale: one map-combinable (type, day) aggregate, then a per-type
    fold whose state is 6 ints; series length is calendar-bounded, and
    the per-type lists never co-shuffle with raw events.
    NULL-ts events are excluded on both engines (time_surface, rule 10),
    and so are NULL event_types: a per-type monitor needs a type key —
    the oracle's recursive fold cannot follow a NULL join key (its seed
    state never advances), while Spark's aggregate() HOF folds the NULL
    group, so the engines silently diverge from day 2 of a NULL series.
    """
    e = time_surface(table(spark, sf, "events")).filter(
        F.col("event_type").isNotNull())
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("cents"))
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "cents"))).alias("pts"),
    )
    folded = series.withColumn(
        "st",
        F.expr(f"""
            aggregate(
              pts,
              named_struct('n', 0L, 'warm', 0L, 'mu', 0L, 'z', 0L,
                           'mx', 0L, 'alarm', -1L),
              (acc, x) -> CASE
                WHEN acc.n < 6L THEN named_struct(
                  'n', acc.n + 1L, 'warm', acc.warm + x.cents,
                  'mu', 0L, 'z', 0L, 'mx', 0L, 'alarm', -1L)
                WHEN acc.n = 6L THEN named_struct(
                  'n', 7L, 'warm', acc.warm + x.cents,
                  'mu', (acc.warm + x.cents) div 7L,
                  'z', (acc.warm + x.cents) div 7L,
                  'mx', 0L, 'alarm', -1L)
                ELSE named_struct(
                  'n', acc.n + 1L, 'warm', acc.warm, 'mu', acc.mu,
                  'z', {_EW_SPARK_Z},
                  'mx', greatest(acc.mx, {_EW_SPARK_EXC}),
                  'alarm', CASE WHEN acc.alarm >= 0L THEN acc.alarm
                           WHEN {_EW_SPARK_EXC} > acc.mu div 8L
                           THEN acc.n + 1L ELSE -1L END)
              END)
        """),
    )
    return folded.select(
        "event_type",
        F.col("st.n").alias("n_days"),
        F.col("st.mu").alias("mu_cents"),
        F.col("st.z").alias("ewma_cents"),
        F.col("st.mx").alias("max_excursion"),
        F.col("st.alarm").alias("alarm_step"),
    ).orderBy("event_type")
