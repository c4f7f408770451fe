"""Text-analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These are the text half of the training-data-pipeline surface (BASELINE.json
north_star). Everything is built-in JVM expressions (regexp_* / aggregate /
transform) — no Python UDFs — so they vectorize inside whole-stage codegen
and scale linearly with no shuffle except the final aggregations.

Cross-engine note: Spark regexps are java.util.regex, DuckDB's are RE2; the
patterns used here (character classes, alternation, word boundaries,
case-insensitive flags) behave identically in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.ckpt import checkpoint as _lineage_checkpoint
from wireduck_spark.registry import query, table

# Stopword alternations per language for the lang-ID heuristic.
_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|pas)\b",
    "es": r"\b(el|los|las|es|no|por)\b",
}


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS word_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
               AS BIGINT) AS bpe_ish_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           n_chars
    FROM documents
    """,
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace-word and BPE-ish (letters-run | digit | symbol) token
    counts per document."""
    d = table(spark, sf, "documents", spread=True)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+"), 0))
        .cast("bigint")
        .alias("word_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0)
        )
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        "n_chars",
    )


@query(
    "text_quality_score",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
           ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                 / greatest(length(text), 1), 4) AS punct_ratio,
           ROUND(CAST(len(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                      AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1), 4)
               AS stopword_ratio,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1), 4)
               AS avg_word_len
    FROM documents
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality signals: length, punctuation ratio, stopword ratio, average
    word length — the standard cheap pre-filters for LLM corpus cleaning."""
    d = table(spark, sf, "documents", spread=True)
    n_words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+"), 0))
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_m"),
        n_words.cast("bigint").alias("n_words"),
        F.round(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9 ]"), 0)).cast(
                "double"
            )
            / F.greatest(F.length("text"), F.lit(1)),
            4,
        ).alias("punct_ratio"),
        F.round(
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(r"\b(the|and|of|to|in|a)\b"), 0)
            ).cast("double")
            / F.greatest(n_words, F.lit(1)),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.greatest(n_words, F.lit(1)),
            4,
        ).alias("avg_word_len"),
    )


def _langid_scores_sql() -> str:
    scores = ",\n           ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
        for lang, pat in _LANG_PATTERNS.items()
    )
    return f"""
    WITH scored AS (
        SELECT doc_id, lang,
           {scores}
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
           CAST(s_fr AS BIGINT) AS s_fr, CAST(s_es AS BIGINT) AS s_es,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM scored
    """


@query("text_langid", oracle=_langid_scores_sql(), tags=("text",))
def text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: score each language by
    stopword hits, argmax with a fixed priority tiebreak (en>de>fr>es)."""
    d = table(spark, sf, "documents", spread=True)
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat)))
            .cast("bigint")
            .alias(f"s_{lang}")
            for lang, pat in _LANG_PATTERNS.items()
        ],
    )
    return scored.withColumn(
        "predicted_lang",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               substring(lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')),
                         1, 64) AS n64,
               lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS nfull
        FROM documents
    )
    SELECT doc_id,
           md5(nfull) AS norm_md5,
           CASE WHEN n64 IS NULL THEN NULL
                ELSE CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(n64) + 1),
                       i -> CAST(ascii(substring(n64, CAST(i AS INTEGER), 1))
                                 AS BIGINT))),
               (a, x) -> (a * 31 + x) % 1000000007) AS BIGINT) END
               AS poly_hash
    FROM norm
    """,
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text + a 64-char
    polynomial rolling hash (mod 1e9+7), computed as an identical
    left-fold over character codes in Spark (aggregate) and DuckDB
    (list_reduce).

    NULL text fingerprints as NULL in BOTH columns (SQL convention,
    matching md5's NULL propagation): Spark's sequence/aggregate chain
    propagates the NULL naturally, while DuckDB's range(1, NULL) is an
    EMPTY list whose fold is 0 — the r13 adversarial-corpus probe
    caught the unguarded oracle colliding NULL text with empty text
    (whose hash is legitimately 0 on both engines), hence the explicit
    CASE. Empty text hashes to 0 on both: Spark's descending
    sequence(1, 0) feeds ascii('') = 0 twice (0*31+0 folds stay 0),
    DuckDB folds the bare seed."""
    d = table(spark, sf, "documents", spread=True)
    norm = F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", ""))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.expr(
            "CAST(aggregate("
            "  transform(sequence(1, length(substring(lower(regexp_replace(text,"
            "    '[^A-Za-z0-9 ]', '')), 1, 64))),"
            "    i -> ascii(substring(substring(lower(regexp_replace(text,"
            "      '[^A-Za-z0-9 ]', '')), 1, 64), i, 1))),"
            "  0L, (a, x) -> (a * 31 + x) % 1000000007) AS BIGINT)"
        ).alias("poly_hash"),
    )


@query(
    "sampling_stable_split",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
                   % 100 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM tagged
    GROUP BY 1
    """,
    tags=("sampling", "split"),
)
def sampling_stable_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id) bucket —
    the reproducible-sampling practice for training pipelines (`sample()`
    gives different rows per engine/partition layout; a content hash gives
    the SAME split everywhere, forever, including on re-runs over grown
    corpora). Uses the repo's portable 60-bit md5 prefix (functions/dedup
    docstring) so the oracle agrees bucket-for-bucket.
    """
    d = table(spark, sf, "documents", spread=True)
    bucket = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        )
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )


@query(
    "pipeline_corpus_clean",
    oracle=r"""
    WITH quality AS (
        SELECT doc_id, lang, source, text,
               len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_words,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                   / greatest(length(text), 1) AS punct_ratio
        FROM documents
    ),
    filtered AS (
        SELECT * FROM quality
        WHERE n_words >= 5 AND punct_ratio <= 0.25
    ),
    deduped AS (
        SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM filtered GROUP BY md5(text)
    )
    SELECT f.lang, f.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(f.n_words AS BIGINT)) AS BIGINT) AS total_words
    FROM deduped d JOIN filtered f ON f.doc_id = d.keep_id
    GROUP BY f.lang, f.source
    """,
    tags=("text", "pipeline"),
)
def pipeline_corpus_clean(spark: SparkSession, sf: str) -> DataFrame:
    """The composed corpus-cleaning pipeline: quality filter (min words,
    max punctuation) -> exact dedup (md5, keep lowest doc_id) -> per
    lang/source inventory. Each stage exists standalone in this module /
    functions/dedup.py; this query proves they COMPOSE as one Catalyst
    plan (filter pushes into the scan, dedup is one hash shuffle, the
    inventory agg is map-combinable) — the shape of a real preprocessing
    job, not an operator demo.
    """
    d = table(spark, sf, "documents", spread=True)
    n_words = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+"), 0)
    )
    punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9 ]"), 0)
    ).cast("double") / F.greatest(F.length("text"), F.lit(1))
    filtered = (
        d.withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct)
        .filter((F.col("n_words") >= 5) & (F.col("punct_ratio") <= 0.25))
    )
    keep = filtered.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    return (
        filtered.join(keep, filtered.doc_id == keep.keep_id)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_words").cast("bigint")).alias("total_words"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing and corpus heavy hitters (round 3)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[A-Za-z0-9./_-]+"

# The synthetic docs contain no PII, so both engines first inject
# deterministic email/URL spans keyed on doc_id — the scrub then has
# real positives to find, and a silently broken regex can't pass.
_INJECT_SQL = (
    "text || CASE"
    " WHEN doc_id % 7 = 0 THEN ' contact a' || CAST(doc_id AS {str_t})"
    " || '@mail-' || CAST(doc_id AS {str_t}) || '.example.com now'"
    " WHEN doc_id % 11 = 3 THEN ' see https://host-'"
    " || CAST(doc_id AS {str_t}) || '.example/path/x_1 ok'"
    " ELSE '' END"
)


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             {_INJECT_SQL.format(str_t="VARCHAR")} AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS BIGINT) AS n_urls,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_URL_RE}', '<URL>', 'g')) AS clean_fp
    FROM aug
    ORDER BY doc_id
    """,
    tags=("text", "llm-pipeline"),
)
def text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Detect and redact email/URL spans (the minimal PII scrub every
    crawl pipeline runs before training).

    Pure JVM regexps — narrow map stage, no shuffle, scales linearly.
    Cross-engine regex care: the patterns use only syntax shared by
    java.util.regex (Spark) and RE2 (DuckDB) — char classes, {2,}
    bounds, no backslash-classes like \\S whose semantics differ; DuckDB
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all default. clean_fp hashes the redacted text so the oracle
    proves byte-identical output without shipping it.
    """
    d = table(spark, sf, "documents", spread=True)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr(
                "CASE"
                " WHEN doc_id % 7 = 0 THEN ' contact a' || CAST(doc_id AS STRING)"
                " || '@mail-' || CAST(doc_id AS STRING) || '.example.com now'"
                " WHEN doc_id % 11 = 3 THEN ' see https://host-'"
                " || CAST(doc_id AS STRING) || '.example/path/x_1 ok'"
                " ELSE '' END"
            ),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_URL_RE),
        F.lit("<URL>"),
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_URL_RE), 0))
        .cast("bigint")
        .alias("n_urls"),
        F.md5(clean.cast("binary")).alias("clean_fp"),
    ).orderBy("doc_id")


@query(
    "text_heavy_hitters",
    oracle="""
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
          FROM documents)
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("text", "llm-pipeline"),
)
def text_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-20 most frequent words across the corpus (vocabulary
    skew check before tokenizer training).

    explode -> groupBy is the exact heavy-hitters plan: the explode is a
    narrow generate, the count has map-side partial aggregation (word
    cardinality << token count, so the shuffle moves the vocabulary,
    not the corpus), and the top-k is TakeOrderedAndProject — each task
    keeps 20 rows, the driver merges 20·tasks rows. At 100 TB the same
    plan holds; if the vocabulary itself outgrew memory, the
    sketch-based variant (sketch_* family) is the fallback.
    Deterministic tie-break: (n DESC, word).
    """
    d = table(spark, sf, "documents", spread=True)
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), 0)
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "text_commonness_score",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ),
    vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM words GROUP BY w)
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(v.freq) AS BIGINT) AS sum_freq,
           ROUND(SUM(v.freq) * 1.0 / COUNT(*), 4) AS commonness
    FROM words d JOIN vocab v ON d.w = v.w
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
    tags=("text", "llm-pipeline"),
)
def text_commonness_score(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram commonness score per document — the self-corpus LM-quality
    proxy: gibberish and boilerplate sit at the distribution's tails
    (rare-word soup scores low, repeated-template text scores high), so
    this is the cheap pre-filter before any model-based quality pass.

    Two-pass self-join plan: vocabulary (word → corpus frequency) is an
    explode + map-combinable count whose shuffle moves the vocabulary,
    not the corpus; the score join is keyed on word and the per-doc
    aggregate on doc_id. At 100 TB the vocabulary (~millions of rows
    after the count) broadcasts or hash-joins cheaply — the corpus-sized
    explode stays narrow on both passes. Exact integer numerators
    (sum_freq, n_words) with ONE final rounded ratio (registry rule 2).
    """
    d = table(spark, sf, "documents", spread=True)
    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), 0)
        ).alias("w"),
    )
    vocab = words.groupBy("w").agg(F.count("*").cast("bigint").alias("freq"))
    return (
        words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("freq").cast("bigint").alias("sum_freq"),
            F.round(F.sum("freq") * 1.0 / F.count("*"), 4).alias("commonness"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_tfidf_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score
      FROM tf JOIN df USING (token)
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rnk
      FROM scored
    )
    SELECT doc_id, token, tf, df, score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    tags=("text", "keywords"),
)
def text_tfidf_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document keyword extraction, TF-IDF style: the top-3 tokens by
    term frequency weighted by corpus rarity. The weight is the
    integer-exact variant  score = tf * 1e6 div df  (rarity = inverse
    document frequency without the log): float ln() differs in the last
    ulp across engines and a last-ulp flip near a rank boundary would
    break the top-k hash — integer scoring removes the whole class.

    Scale: tf is one (doc_id, token) keyed aggregate; df aggregates the
    ALREADY-COLLAPSED tf table (vocabulary-sized, zipf-bounded) and joins
    back by token — Spark broadcasts it when small, hash-joins when not;
    the final top-3 is a per-doc partitioned window (WindowGroupLimit
    pushes the limit before the sort materializes).
    """
    d = table(spark, sf, "documents", spread=True)
    # tf feeds BOTH the df aggregate and the score join; cache it so the
    # corpus is scanned + exploded once, not twice (a 100-TB pipeline
    # persists this doc-term table — same idea, different medium).
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    ).cache()
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_tbl, "token").select(
        "doc_id", "token",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.expr("tf * 1000000 div df").cast("bigint").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


# URL shape shared by both engines' extractors: scheme + host + optional
# path/query. Only Java/RE2-common syntax (char classes, optional group).
_URL_FULL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_?&=-]*)?"


@query(
    "text_url_extract_normalize",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || CASE
                 WHEN doc_id % 5 = 0 THEN ' see https://WWW.Site-'
                      || CAST(doc_id % 7 AS VARCHAR)
                      || '.Example.COM/Path/a?utm_source=feed&x=1 ok'
                 WHEN doc_id % 5 = 2 THEN ' ref https://site-'
                      || CAST(doc_id % 7 AS VARCHAR)
                      || '.example.com/path/b ok'
                 WHEN doc_id % 5 = 3
                      THEN ' link https://cdn.example.net/lib.js end'
                 ELSE '' END AS t
        FROM documents
    ), urls AS (
        SELECT doc_id, UNNEST(regexp_extract_all(t, '{_URL_FULL_RE}')) AS url
        FROM aug
    ), norm AS (
        SELECT doc_id,
               regexp_replace(
                   lower(regexp_extract(url, 'https?://([^/?]+)', 1)),
                   '^www\\.', '') AS host,
               CASE WHEN strpos(url, 'utm_') > 0 THEN 1 ELSE 0 END AS trk
        FROM urls
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(trk) AS BIGINT) AS n_with_tracking
    FROM norm GROUP BY host
    """,
    tags=("text", "curation"),
)
def text_url_extract_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """URL extraction + host normalization — the provenance rollup every
    web-corpus pipeline needs (per-domain doc counts drive source
    weighting, blocklists, and robots compliance audits).

    The synthetic docs carry no URLs, so both engines inject the same
    deterministic spans keyed on doc_id (mixed-case hosts, www prefixes,
    utm_ tracking params) — the normalizer then has real work to do and
    a broken regex can't silently pass. Normalization = lowercase host,
    strip leading www., flag tracking params.

    Scale: extract + normalize are narrow regexp maps; the only shuffle
    is the host-keyed aggregate (vocabulary-sized: hosts, not docs).
    """
    d = table(spark, sf, "documents", spread=True)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr(
                "CASE"
                " WHEN doc_id % 5 = 0 THEN ' see https://WWW.Site-'"
                " || CAST(doc_id % 7 AS STRING)"
                " || '.Example.COM/Path/a?utm_source=feed&x=1 ok'"
                " WHEN doc_id % 5 = 2 THEN ' ref https://site-'"
                " || CAST(doc_id % 7 AS STRING) || '.example.com/path/b ok'"
                " WHEN doc_id % 5 = 3"
                " THEN ' link https://cdn.example.net/lib.js end'"
                " ELSE '' END"
            ),
        ).alias("t"),
    )
    urls = aug.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("t"), F.lit(_URL_FULL_RE), 0)
        ).alias("url"),
    )
    norm = urls.select(
        "doc_id",
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("url"), r"https?://([^/?]+)", 1)),
            r"^www\.", "",
        ).alias("host"),
        F.when(F.instr(F.col("url"), "utm_") > 0, 1).otherwise(0)
        .alias("trk"),
    )
    return norm.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("trk").cast("bigint").alias("n_with_tracking"),
    )


@query(
    "text_collocations_pmi",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents
    ), uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(n_w) AS BIGINT) AS n_tokens FROM uni
    ), big AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM (SELECT unnest(list_transform(range(1, len(t)),
                     i -> t[CAST(i AS INTEGER)] || ' '
                       || t[CAST(i + 1 AS INTEGER)])) AS b
              FROM toks WHERE len(t) >= 2)
        GROUP BY b
    ), scored AS (
        SELECT big.b AS bigram, big.n_xy, u1.n_w AS n_x, u2.n_w AS n_y,
               CAST((1000000 * big.n_xy * tot.n_tokens)
                    // (u1.n_w * u2.n_w) AS BIGINT) AS pmi_ratio_ppm
        FROM big, tot
        JOIN uni u1 ON u1.w = split_part(big.b, ' ', 1)
        JOIN uni u2 ON u2.w = split_part(big.b, ' ', 2)
        WHERE big.n_xy >= 5
    )
    SELECT bigram, n_xy, n_x, n_y, pmi_ratio_ppm
    FROM scored
    ORDER BY pmi_ratio_ppm DESC, bigram ASC
    LIMIT 20
    """,
    tags=("text", "nlp"),
)
def text_collocations_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise-mutual-information
    ratio P(xy)/(P(x)P(y)) — the standard phrase detector (word2vec's
    phrase pass, Gensim Phrases) that finds multiword units worth
    treating as single tokens.

    Integer-exact ranking: the PMI *ratio* n_xy*N/(n_x*n_y) is computed
    as scaled BIGINT division (ppm), skipping the float log that would
    shift ranks across engines at the last ulp.

    Scale: bigrams are built with an array higher-order function inside
    the narrow token map (no posexplode self-join); both count tables
    shuffle vocabulary-sized keys; the unigram sides of the scoring
    joins are vocabulary tables (broadcastable); final top-20 is a
    TakeOrderedAndProject with a deterministic (score, bigram) tiebreak.
    """
    toks = table(spark, sf, "documents", spread=True).select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        .alias("t"),
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count("*").cast("bigint").alias("n_w"))
    )
    tot = uni.agg(F.sum("n_w").cast("bigint").alias("n_tokens"))
    big = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("t"), i),
                        F.lit(" "),
                        F.element_at(F.col("t"), i + 1),
                    ),
                )
            ).alias("b")
        )
        .groupBy("b").agg(F.count("*").cast("bigint").alias("n_xy"))
        .filter(F.col("n_xy") >= 5)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))
    scored = (
        big.withColumn("w1", F.split_part(F.col("b"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("b"), F.lit(" "), F.lit(2)))
        .join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("b").alias("bigram"), "n_xy", "n_x", "n_y",
            F.expr("(1000000 * n_xy * n_tokens) div (n_x * n_y)")
            .cast("bigint").alias("pmi_ratio_ppm"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio_ppm").desc(), F.col("bigram").asc()
    ).limit(20)


@query(
    "text_inverted_index",
    bench=True,
    oracle="""
    WITH posting AS (
        SELECT w, doc_id, doc_id // 4096 AS sid
        FROM (SELECT doc_id,
                     unnest(list_distinct(
                         regexp_extract_all(lower(text), '[a-z0-9]+'))) AS w
              FROM documents)
    ), shards AS (
        SELECT w, sid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(doc_id) AS BIGINT) AS lo,
               CAST(MAX(doc_id) AS BIGINT) AS hi,
               md5(string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id)) AS shard_fp
        FROM posting GROUP BY w, sid
    ), lists AS (
        SELECT w,
               CAST(SUM(n) AS BIGINT) AS df,
               CAST(MIN(lo) AS BIGINT) AS first_doc,
               CAST(MAX(hi) AS BIGINT) AS last_doc,
               md5(string_agg(shard_fp, '' ORDER BY sid)) AS posting_fp
        FROM shards GROUP BY w
    )
    SELECT * FROM lists WHERE df >= 50
    """,
    tags=("text", "search"),
)
def text_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index construction (term -> document-frequency + a
    fingerprint of the ordered posting list) — the build step of every
    full-text search system, restricted to terms with df >= 50 so the
    result stays summary-sized while the fingerprint still pins the
    EXACT posting list contents and order cross-engine.

    Scale: distinct terms per doc are computed inside the narrow token
    map (array_distinct before explode — posting entries, not token
    occurrences, hit the wire). Posting lists are fingerprinted
    HIERARCHICALLY: doc-ids first aggregate per (term, 4096-doc shard)
    — bounded groups, so a stop-word's corpus-wide posting list never
    lands on one reducer — then per-term over the ordered shard
    fingerprints (one short row per shard). The naive single-level
    ordered string_agg went 19x at an 8x inflation (hot-term skew);
    this two-level shape restored ~linear scaling with identical
    df/first/last outputs.
    """
    d = table(spark, sf, "documents", spread=True)
    posting = d.select(
        "doc_id",
        F.expr("doc_id div 4096").cast("bigint").alias("sid"),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
            )
        ).alias("w"),
    )
    shards = posting.groupBy("w", "sid").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("doc_id").cast("bigint").alias("lo"),
        F.max("doc_id").cast("bigint").alias("hi"),
        F.md5(
            F.array_join(
                F.array_sort(F.collect_list(F.col("doc_id"))), ",")
        ).alias("shard_fp"),
    )
    return (
        shards.groupBy("w")
        .agg(
            F.sum("n").cast("bigint").alias("df"),
            F.min("lo").cast("bigint").alias("first_doc"),
            F.max("hi").cast("bigint").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("sid", "shard_fp"))),
                        lambda s: s.getField("shard_fp"),
                    ),
                    "",
                )
            ).alias("posting_fp"),
        )
        .filter(F.col("df") >= 50)
    )


@query(
    "text_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT lower(w) AS word
      FROM documents,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(w)
      WHERE length(w) >= 2
    ), wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM words GROUP BY word
    ), pairs AS (
      SELECT substring(word, CAST(i AS INT), 2) AS pair, n
      FROM wc, unnest(generate_series(1, length(word) - 1)) AS g(i)
    )
    SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20
    """,
    tags=("text", "llm-pipeline"),
)
def text_bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-trainer merge step: the top-20 adjacent character pairs by
    corpus frequency — the statistic a byte-pair-encoding tokenizer
    trainer computes once per merge round (Sennrich et al. 2016).

    The scale trick is the same one every real BPE trainer uses: pair
    counting runs over the DISTINCT-word frequency table, not the raw
    corpus. The word-count aggregate collapses 100 TB of text to
    O(|vocab|) rows first (Heaps' law: ~millions, not billions), and
    only then does the narrow pair-expansion run — transform(sequence)
    over ≤ word-length positions, a JVM higher-order function with no
    Python and no extra shuffle. Final count is a pair-keyed aggregate
    on ~1e3 distinct bigrams with map-side combine; top-20 is
    TakeOrderedAndProject, not a global sort.
    """
    d = table(spark, sf, "documents", spread=True)
    words = (
        d.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
        )
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1),"
                   " i -> substring(word, i, 2))")
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS ({_langid_scores_sql()})
    SELECT labeled_lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN labeled_lang = predicted_lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
    FROM pred
    GROUP BY labeled_lang, predicted_lang
    ORDER BY labeled_lang, predicted_lang
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def text_lang_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Language-label audit as a confusion matrix: the declared `lang`
    column crossed with the stopword-heuristic detector's prediction
    (text_langid re-used verbatim — one detector, two consumers). The
    off-diagonal cells are the mislabeled-language candidates a corpus
    curator quarantines before language-stratified sampling
    (sampling_temperature_mix) trusts the labels.

    Scale: the detector is 4 regexp counts in a narrow map; the matrix
    is a <=16-group aggregate — the audit costs one scan regardless of
    corpus size.
    """
    scored = text_langid(spark, sf)
    return (
        scored.groupBy("labeled_lang", "predicted_lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("labeled_lang") == F.col("predicted_lang"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_agree"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


_BM25_TERMS = ("scan", "join", "filter")


def _bm25_oracle() -> str:
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{t}"
        for t in _BM25_TERMS
    )
    contrib = " + ".join(
        f"(ln(1 + (CAST(n_docs AS DOUBLE) - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * 2.2)"
        f" / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl)))"
        for t in _BM25_TERMS
    )
    return f"""
    WITH tok AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    tf AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS dl,
               {tf_cols}
        FROM tok
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
               {df_cols}
        FROM tf
    )
    SELECT doc_id, ROUND({contrib}, 4) AS bm25
    FROM tf, corpus
    WHERE tf_scan + tf_join + tf_filter > 0
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """


def bm25_scored(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, bm25) for every document matching >=1 query term —
    the shared scorer behind text_bm25_score (top-20 readout) and
    pipeline_hybrid_rrf (lexical half of hybrid retrieval). bm25 is
    already rounded to 4 dp so every consumer orders by the same
    cross-engine-stable value."""
    d = table(spark, sf, "documents", spread=True)
    tok = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")),
                             F.lit("[a-z0-9]+"), 0).alias("toks"),
    )
    tf = tok.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.expr(f"size(filter(toks, x -> x = '{t}'))")
            .cast("bigint").alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    corpus = tf.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("bigint") / F.count("*").cast("double"))
        .alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("bigint").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = tf.crossJoin(F.broadcast(corpus))
    contrib = None
    for t in _BM25_TERMS:
        idf = F.log(
            F.lit(1)
            + (F.col("n_docs").cast("double") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
        )
        part = idf * (F.col(f"tf_{t}") * 2.2) / (
            F.col(f"tf_{t}")
            + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        )
        contrib = part if contrib is None else contrib + part
    match_any = None
    for t in _BM25_TERMS:
        cond = F.col(f"tf_{t}") > 0
        match_any = cond if match_any is None else (match_any | cond)
    return scored.filter(match_any).select(
        "doc_id", F.round(contrib, 4).alias("bm25")
    )


@query(
    "text_bm25_score",
    oracle=_bm25_oracle(),
    tags=("text", "search", "llm-pipeline"),
)
def text_bm25_score(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 relevance scoring (Robertson/Sparck Jones, k1=1.2 b=0.75)
    for the fixed query {scan, join, filter} — the ranking function
    behind every lexical retriever, and the lexical half of the hybrid
    RAG stack next to the embedding ANN queries. Complements
    text_tfidf_keywords (per-doc keyword extraction) with query-time
    document RANKING.

    Engine-exactness: tf/dl/df/N are exact integers; idf and the length
    normalization are a fixed-shape scalar IEEE tree over those
    integers, summed over the three terms in literal order — no float
    ever aggregates across rows — and the score is rounded to 4 dp on
    output (the scalar_math_funcs ln contract). Ordering is by the
    ROUNDED score with doc_id tiebreak, so near-ties cannot flap
    cross-engine.

    Scale: one narrow tokenize pass computes (dl, tf_t) per doc; the
    corpus stats (N, avgdl, df_t) are ONE 1-row aggregate broadcast
    back (the scalar-subquery pattern); scoring is a narrow map and
    top-20 is TakeOrderedAndProject. At 100 TB the tf table is the
    thing a search system materializes as its forward index — this
    query is that pipeline end-to-end.
    """
    return (
        bm25_scored(spark, sf)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@query(
    "text_readability_fk",
    oracle="""
    WITH counts AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                  AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syll
      FROM documents
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sents)
                 + 11.8 * (CAST(n_syll AS DOUBLE) / greatest(n_words, 1))
                 - 15.59, 4) AS fk_grade
    FROM counts
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def text_readability_fk(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch-Kincaid grade level per document — the readability filter
    corpus curators use next to the length/punctuation signals
    (text_quality_score): 0.39·(words/sentences) +
    11.8·(syllables/words) − 15.59, with syllables approximated by
    vowel-group runs (the standard regex proxy) and sentences by
    terminal-punctuation runs.

    Exactness: the three counts are exact integers from shared-regex
    extraction; the grade is one fixed scalar IEEE tree per row,
    rounded 4 dp. Scale: pure narrow map, no shuffle at all.
    """
    d = table(spark, sf, "documents", spread=True)
    n_words = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    ).cast("bigint")
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
        F.lit(1),
    ).cast("bigint")
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    ).cast("bigint")
    c = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    )
    return c.select(
        "doc_id", "n_words", "n_sents", "n_syll",
        F.round(
            0.39 * (F.col("n_words").cast("double") / F.col("n_sents"))
            + 11.8 * (F.col("n_syll").cast("double")
                      / F.greatest(F.col("n_words"), F.lit(1)))
            - 15.59,
            4,
        ).alias("fk_grade"),
    )


@query(
    "text_url_canonical_dedup",
    oracle="""
    WITH variants AS (
      SELECT doc_id,
             'https://CDN' || CAST(doc_id % 7 AS VARCHAR)
               || '.Example.COM/page/' || CAST(doc_id AS VARCHAR)
               || '/?utm_source=feed&utm_campaign=x&id='
               || CAST(doc_id AS VARCHAR) AS url
      FROM documents
      UNION ALL
      SELECT doc_id,
             'https://cdn' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/page/' || CAST(doc_id AS VARCHAR)
               || '?id=' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(url), 'utm_[a-z]+=[^&]*&?', '', 'g'),
                   '[?&]$', ''),
                 '/[?]', '?'),
               '/$', '') AS canonical_url
      FROM variants
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) >= 2
    ORDER BY canonical_url
    """,
    tags=("text", "dedup", "url", "llm-pipeline"),
)
def text_url_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-URL dedup — the crawl-frontier step that runs BEFORE
    any content dedup: tracking parameters stripped (utm_*), host
    lowercased, trailing slash dropped (lookahead-free rules — RE2 has
    no lookahead, the one regex-dialect trap this corpus hit), so the same page fetched
    through different campaign links collapses to one canonical key.
    The fixture generates two deterministic variants per document
    (tracking-tagged + mixed-case vs clean) and every pair must
    re-collapse (HAVING >= 2 catches a canonicalizer that misses any
    rule — a missed rule yields singleton groups and an empty diff
    against the oracle's full set).

    Scale: narrow canonicalization map + hash aggregate on the
    canonical key — exact dedup's plan (dedup_exact) with the key
    computed, not stored. At crawl scale the canonical key is THE
    dedup key for the frontier (content hashes come later, after
    fetch).
    """
    d = table(spark, sf, "documents")
    v1 = d.select(
        "doc_id",
        F.concat(
            F.lit("https://CDN"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".Example.COM/page/"), F.col("doc_id").cast("string"),
            F.lit("/?utm_source=feed&utm_campaign=x&id="),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    v2 = d.select(
        "doc_id",
        F.concat(
            F.lit("https://cdn"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/page/"), F.col("doc_id").cast("string"),
            F.lit("?id="), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    canon = v1.unionAll(v2).select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.lower(F.col("url")), r"utm_[a-z]+=[^&]*&?", ""
                    ),
                    r"[?&]$", "",
                ),
                r"/[?]", "?",
            ),
            r"/$", "",
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("keep_doc"),
        )
        .filter(F.col("n_variants") >= 2)
        .orderBy("canonical_url")
    )


@query(
    "text_perplexity_unigram",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, w
    ),
    vocab AS (
      SELECT w, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY w
    ),
    corpus AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM vocab
    ),
    q AS (
      SELECT w,
             CAST(ROUND(1000000 * ln(CAST(n_total AS DOUBLE) / c), 0)
                  AS BIGINT) AS q_micro
      FROM vocab, corpus
    )
    SELECT t.doc_id,
           CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(t.tf * q.q_micro) AS DOUBLE)
                 / 1000000 / SUM(t.tf), 4) AS mean_surprisal
    FROM tf t JOIN q ON t.w = q.w
    GROUP BY t.doc_id
    ORDER BY mean_surprisal DESC, t.doc_id
    LIMIT 20
    """,
    tags=("text", "quality", "llm-pipeline"),
    bench=True,
)
def text_perplexity_unigram(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM perplexity proxy: each document's mean per-token
    surprisal ln(N/c(w)) under the corpus's own unigram distribution —
    the CCNet/Gopher-style quality signal (high = rare-token gibberish
    or boilerplate-free novelty; low = stopword soup), here self-scored
    so no external LM ships with the engine. Top-20 most-surprising
    docs surface for review.

    Cross-engine determinism: per-token surprisal is quantized to an
    int64 of MICRO-nats per distinct word (one ln per vocab entry, then
    ROUND*1e6 — the BM25/ln precedent), so the per-doc accumulation is
    an exact integer dot product tf·q; only the final mean divides in
    IEEE doubles, rounded to 4 dp.

    Scale: tf is one (doc_id, word)-keyed aggregate of the exploded
    corpus (map-side combinable; shuffle moves the doc-vocabulary, not
    the token stream); vocab + the 1-row total are word-keyed rollups
    OF tf (vocab << corpus); surprisal joins back on the word key —
    every shuffle key is a word or doc id, and the result is a
    TakeOrderedAndProject. The unigram table is reusable: at 100 TB
    you'd materialize q once per corpus snapshot and score incoming
    shards against it with just the tf pass + broadcast-or-bucketed
    join.
    """
    d = table(spark, sf, "documents", spread=True)
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(r"[a-z0-9]+"), 0)
        ).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    vocab = tf.groupBy("w").agg(F.sum("tf").cast("bigint").alias("c"))
    corpus = vocab.agg(F.sum("c").cast("bigint").alias("n_total"))
    q = vocab.crossJoin(F.broadcast(corpus)).select(
        "w",
        F.round(
            F.lit(1000000)
            * F.log(F.col("n_total").cast("double") / F.col("c")),
            0,
        ).cast("bigint").alias("q_micro"),
    )
    return (
        tf.join(q, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.col("q_micro")).cast("double")
                / 1000000 / F.sum("tf"),
                4,
            ).alias("mean_surprisal"),
        )
        .orderBy(F.desc("mean_surprisal"), "doc_id")
        .limit(20)
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+'))
                AS w
            FROM documents)
      GROUP BY w
    ),
    top AS (
      SELECT w, n FROM counts ORDER BY n DESC, w LIMIT 100
    ),
    ranked AS (
      SELECT n,
             CAST(row_number() OVER (ORDER BY n DESC, w) AS BIGINT)
                 AS rnk
      FROM top
    ),
    pts AS (
      SELECT CAST(ROUND(1000000 * ln(CAST(rnk AS DOUBLE)), 0) AS BIGINT)
                 AS x,
             CAST(ROUND(1000000 * ln(CAST(n AS DOUBLE)), 0) AS BIGINT)
                 AS y
      FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT k AS n_terms,
           ROUND((CAST(k AS DOUBLE) * sxy
                  - CAST(sx AS DOUBLE) * sy)
                 / (CAST(k AS DOUBLE) * sxx
                    - CAST(sx AS DOUBLE) * sx), 4) AS zipf_slope,
           ROUND((CAST(sy AS DOUBLE)
                  - ((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(k AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx)) * sx)
                 / k / 1000000, 4) AS ln_c_intercept
    FROM m
    """,
    tags=("text", "stats", "quality"),
)
def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: OLS slope of
    ln(freq) on ln(rank) over the top-100 terms — natural text sits
    near slope -1; a corpus drifting toward 0 (flat: template spam) or
    below -1.5 (head-heavy: boilerplate dedup failure) fails the
    health check before tokenizer training.

    Determinism: ln(rank) and ln(freq) are quantized to int64
    micro-nats per term (ROUND*1e6, the corpus-wide ln precedent), the
    OLS moments are exact integer sums over 100 points (|x|,|y| <=
    2e7 -> sxy <= 4e16, inside int64), and the slope/intercept are one
    fixed IEEE expression over those integers, rounded to 4 dp.

    Scale: the only corpus-sized work is the word count (explode +
    map-side-combinable agg, vocabulary-sized shuffle); top-100 is
    TakeOrderedAndProject; the rank window runs on 100 rows partitioned
    by a column-derived constant (pmod(n,1) — survives constant
    folding, so the no-global-window invariant holds); the moment
    aggregate is 1 row.
    """
    d = table(spark, sf, "documents", spread=True)
    counts = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")),
                                     F.lit(r"[a-z0-9]+"), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "w").limit(100)
    w = Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
        F.desc("n"), "w"
    )
    ranked = top.select(
        "n", F.row_number().over(w).cast("bigint").alias("rnk")
    )
    pts = ranked.select(
        F.round(F.lit(1000000) * F.log(F.col("rnk").cast("double")), 0)
        .cast("bigint").alias("x"),
        F.round(F.lit(1000000) * F.log(F.col("n").cast("double")), 0)
        .cast("bigint").alias("y"),
    )
    m = pts.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    kd = F.col("k").cast("double")
    slope = (kd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        kd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        F.col("k").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / F.col("k") / 1000000,
            4,
        ).alias("ln_c_intercept"),
    )


@query(
    "text_entropy_source_mix",
    oracle="""
    WITH counts AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
    src_h AS (
      SELECT 'source' AS dimension,
             ROUND(-SUM((CAST(sn AS DOUBLE) / total)
                        * ln(CAST(sn AS DOUBLE) / total)), 4) AS entropy,
             CAST(COUNT(*) AS BIGINT) AS n_categories
      FROM (SELECT source, CAST(SUM(n) AS BIGINT) AS sn
            FROM counts GROUP BY source), tot
    ),
    lang_h AS (
      SELECT 'lang' AS dimension,
             ROUND(-SUM((CAST(ln_ AS DOUBLE) / total)
                        * ln(CAST(ln_ AS DOUBLE) / total)), 4) AS entropy,
             CAST(COUNT(*) AS BIGINT) AS n_categories
      FROM (SELECT lang, CAST(SUM(n) AS BIGINT) AS ln_
            FROM counts GROUP BY lang), tot
    )
    SELECT * FROM src_h UNION ALL SELECT * FROM lang_h
    ORDER BY dimension
    """,
    tags=("text", "stats", "quality", "llm-pipeline"),
)
def text_entropy_source_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy of the training-mix composition along source and
    language — the one-number diversity dial a curation team tracks
    across snapshots (entropy collapsing toward 0 = one domain is
    eating the mix; rising toward ln(k) = uniform). Pairs with
    dq_distribution_drift_psi: PSI alarms on CHANGE, entropy states the
    absolute concentration.

    Determinism: category counts are exact integers; each term divides
    two exact integers in IEEE doubles and the per-category ln rides
    the shared expression tree (few categories, summed after rounding
    guards at 4 dp — the BM25/ln convention).

    Scale: one combinable (source, lang) rollup, then category-sized
    work.
    """
    d = table(spark, sf, "documents", spread=True)
    counts = d.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n"))
    counts = counts.persist()
    try:
        tot = counts.agg(F.sum("n").cast("bigint").alias("total"))

        def h(dim):
            per = counts.groupBy(dim).agg(
                F.sum("n").cast("bigint").alias("cn"))
            p = F.col("cn").cast("double") / F.col("total")
            return (
                per.crossJoin(F.broadcast(tot))
                .agg(
                    F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
                    F.count("*").cast("bigint").alias("n_categories"),
                )
                .select(
                    F.lit(dim).alias("dimension"),
                    "entropy", "n_categories",
                )
            )

        out = h("source").unionAll(h("lang")).orderBy("dimension")
        out = out.localCheckpoint(eager=True)
    finally:
        counts.unpersist()
    return out


# --------------------------------------------------------------------------
# Jensen-Shannon divergence between the two dominant sources' language
# mixes (the symmetric, bounded drift measure)
# --------------------------------------------------------------------------


@query(
    "text_js_divergence_sources",
    oracle="""
    WITH sc AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    picked AS (
      SELECT source,
             CAST(row_number() OVER (ORDER BY n DESC, source) AS BIGINT)
                 AS rn
      FROM sc
    ),
    sl AS (
      SELECT d.lang,
             CAST(SUM(CASE WHEN p.rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS cp,
             CAST(SUM(CASE WHEN p.rn = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS cq
      FROM documents d JOIN picked p ON d.source = p.source
      WHERE p.rn <= 2
      GROUP BY d.lang
    ),
    tot AS (
      SELECT CAST(SUM(cp) AS BIGINT) AS na,
             CAST(SUM(cq) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM sl
    ),
    jsd AS (
      SELECT ROUND(SUM(
          CASE WHEN cp > 0 THEN
            0.5 * (CAST(cp AS DOUBLE) / na)
                * ln((CAST(cp AS DOUBLE) / na)
                     / (0.5 * (CAST(cp AS DOUBLE) / na)
                        + 0.5 * (CAST(cq AS DOUBLE) / nb)))
          ELSE 0 END
          + CASE WHEN cq > 0 THEN
            0.5 * (CAST(cq AS DOUBLE) / nb)
                * ln((CAST(cq AS DOUBLE) / nb)
                     / (0.5 * (CAST(cp AS DOUBLE) / na)
                        + 0.5 * (CAST(cq AS DOUBLE) / nb)))
          ELSE 0 END), 4) AS jsd_nats
      FROM sl, tot
    )
    SELECT (SELECT source FROM picked WHERE rn = 1) AS src_a,
           (SELECT source FROM picked WHERE rn = 2) AS src_b,
           na, nb, n_langs, jsd_nats
    FROM jsd, tot
    """,
    tags=("text", "stats", "quality", "llm-pipeline"),
)
def text_js_divergence_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Jensen-Shannon divergence (nats) between the language mixes of
    the two largest sources — the SYMMETRIC, always-finite drift
    measure (KL blows up on a zero cell; JSD is bounded by ln 2), the
    pairwise companion to text_entropy_source_mix's global
    concentration dial. In a training pipeline this is the
    "are these two feeds interchangeable?" number.

    Source selection is data-driven and total-ordered (count DESC,
    name ASC — rule 5), so the query is deterministic even when the
    mix is uniform. Zero-cell terms contribute exactly 0 (the p·ln(p/m)
    limit), handled by the explicit guard, never by NULL propagation.

    Determinism: category counts are exact integers; every ratio and
    ln rides one shared IEEE tree; the ≤|langs| term sum rounds at
    4 dp (the entropy convention). The rank window runs over the
    per-source aggregate (bounded by source cardinality — allowlisted
    constant-partition window).

    Scale: one (source) rollup + one (lang) rollup over the two picked
    sources are the only corpus shuffles; everything after is
    category-sized.
    """
    d = table(spark, sf, "documents", spread=True)
    sc_counts = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    wp = Window.partitionBy(
        F.pmod(F.coalesce(F.col("n"), F.lit(0)), F.lit(1))
    ).orderBy(F.desc("n"), "source")
    picked = sc_counts.select(
        "source", F.row_number().over(wp).cast("bigint").alias("rn")
    ).filter(F.col("rn") <= 2)
    sl = (
        d.join(F.broadcast(picked), "source")
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint")
            .alias("cp"),
            F.sum(F.when(F.col("rn") == 2, 1).otherwise(0)).cast("bigint")
            .alias("cq"),
        )
    )
    sl = sl.persist()
    try:
        tot = sl.agg(
            F.sum("cp").cast("bigint").alias("na"),
            F.sum("cq").cast("bigint").alias("nb"),
            F.count("*").cast("bigint").alias("n_langs"),
        )
        p = F.col("cp").cast("double") / F.col("na")
        q = F.col("cq").cast("double") / F.col("nb")
        m = 0.5 * p + 0.5 * q
        jsd = (
            sl.crossJoin(F.broadcast(tot))
            .agg(
                F.round(
                    F.sum(
                        F.when(F.col("cp") > 0, 0.5 * p * F.log(p / m))
                        .otherwise(F.lit(0.0))
                        + F.when(F.col("cq") > 0, 0.5 * q * F.log(q / m))
                        .otherwise(F.lit(0.0))
                    ),
                    4,
                ).alias("jsd_nats")
            )
        )
        names = picked.groupBy().agg(
            F.min(F.when(F.col("rn") == 1, F.col("source"))).alias("src_a"),
            F.min(F.when(F.col("rn") == 2, F.col("source"))).alias("src_b"),
        )
        out = (
            jsd.crossJoin(F.broadcast(names))
            .crossJoin(F.broadcast(tot))
            .select("src_a", "src_b", "na", "nb", "n_langs", "jsd_nats")
            .localCheckpoint(eager=True)
        )
    finally:
        sl.unpersist()
    return out


# --------------------------------------------------------------------------
# Tokenizer fertility per language (subtokens-per-word — the tokenizer
# cost dial for a multilingual mix)
# --------------------------------------------------------------------------


@query(
    "text_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
               AS BIGINT)) AS BIGINT) AS words_total,
           CAST(SUM(CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT)) AS BIGINT)
               AS subtoks_total,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           ROUND(CAST(SUM(CAST(len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT))
                     AS DOUBLE)
                 / SUM(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       AS BIGINT)), 4) AS fertility,
           ROUND(CAST(SUM(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                     AS BIGINT)) AS DOUBLE) * 100
                 / SUM(n_chars), 4) AS words_per_100_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "llm-pipeline", "quality"),
)
def text_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility per language: subtokens-per-word under the
    BPE-ish fallback segmentation (letter runs survive whole; digits
    and punctuation shatter) vs the whitespace word count — the
    standard multilingual-tokenizer cost metric (fertility ≈ 1 means
    the vocabulary covers the language; high fertility means the mix
    pays more sequence length for the same text). words_per_100_chars
    is the same dial denominated in raw bytes-ish units for
    cross-language compute budgeting.

    Uses the exact token regexes of text_token_count (the per-doc
    sibling), so per-doc and per-lang views reconcile by construction.

    Determinism: token counts and char sums are exact integers; the
    two ratios ride one shared IEEE tree each, rounded 4 dp.

    Scale: pure map + one lang-keyed combinable rollup — no joins, no
    windows; regexp counting is whole-stage-codegen JVM work.
    """
    d = table(spark, sf, "documents", spread=True)
    words = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+"), 0)
    ).cast("bigint")
    subtoks = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0
        )
    ).cast("bigint")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(words).cast("bigint").alias("words_total"),
            F.sum(subtoks).cast("bigint").alias("subtoks_total"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
        )
        .select(
            "lang", "n_docs", "words_total", "subtoks_total", "chars_total",
            F.round(
                F.col("subtoks_total").cast("double") / F.col("words_total"),
                4,
            ).alias("fertility"),
            F.round(
                F.col("words_total").cast("double") * 100
                / F.col("chars_total"),
                4,
            ).alias("words_per_100_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Term burstiness: variance-to-mean ratio + Church-Gale per-doc rate
# ---------------------------------------------------------------------------


@query(
    "text_burstiness_vmr",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    tc AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY doc_id, term
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    pt AS (
        SELECT term,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS ss,
               CAST(COUNT(*) AS BIGINT) AS df
        FROM tc GROUP BY term
    )
    SELECT term, df, s AS total_count,
           ROUND(CAST(ss AS DOUBLE) / CAST(s AS DOUBLE)
                 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS vmr,
           ROUND(CAST(s AS DOUBLE) / df, 4) AS burstiness
    FROM pt, nd
    WHERE s >= 20
    """,
    tags=("text", "llm-pipeline"),
)
def text_burstiness_vmr(spark: SparkSession, sf: str) -> DataFrame:
    """Term burstiness over the corpus: for every term with >= 20 total
    occurrences, (a) the variance-to-mean ratio of its per-document
    count INCLUDING zero-docs (Fano factor — 1.0 under a Poisson
    sprinkle, > 1 for topical/bursty terms) and (b) Church & Gale's
    burstiness E[count | count > 0] = total/df. The curation signal
    behind content-word vs function-word weighting: bursty terms carry
    topic, uniform terms carry grammar — and a dedup/contamination
    screen reads high-VMR terms as template/boilerplate markers.

    Determinism: per-(doc, term) counts, totals, sumsq, and df are all
    exact int64 (zero-docs enter via the algebraic identity
    (n*ss - s*s)/(n*s) = ss/s - s/n without materializing zeros); the
    rendered ratios divide identical int64-derived doubles, 4 dp.
    Overflow (ADVICE r10): the earlier n*ss - s*s form squared raw
    int64 sums — Spark (non-ANSI) wraps silently where DuckDB raises,
    so at scale the engines would silently diverge. The ss/s - s/n
    rewrite removes BOTH products: every operand is a plain int64 sum
    cast to double, so there is no overflow at any corpus size, and
    IEEE division + subtraction are identical trees in both engines.

    Scale: tokenize + explode is narrow (no shuffle); the (doc, term)
    fold and the per-term rollup are both map-combinable hash
    aggregates, output is vocabulary-sized; the doc-count scalar joins
    by broadcast. No per-row Python anywhere.
    """
    d = table(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tc = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("c"))
    nd = d.agg(F.count("*").cast("bigint").alias("n"))
    pt = tc.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        F.count("*").cast("bigint").alias("df"),
    ).filter(F.col("s") >= 20)
    return pt.crossJoin(F.broadcast(nd)).select(
        "term", "df", F.col("s").alias("total_count"),
        F.round(F.col("ss").cast("double") / F.col("s").cast("double")
                - F.col("s").cast("double") / F.col("n").cast("double"),
                4).alias("vmr"),
        F.round(F.col("s").cast("double") / F.col("df"), 4)
        .alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (iterative merges) — the full trainer, not just
# one round's pair statistic (that is text_bpe_pair_counts above).
# ---------------------------------------------------------------------------

_BPE_MERGES = 10

# The re-segmentation fold, written once per engine with the SAME
# left-to-right BPE convention: walk the symbol list, and whenever the
# accumulator's LAST token equals p1 and the next symbol is p2, replace
# them with the merged token. The '#' seed gives the first real token a
# leading space so the boundary check `right(acc, len(p1)+1) = ' '||p1`
# is exact for every position (a merged token can never re-match p1 in
# the same pass because it is strictly longer). Spark aggregate() seeds
# directly; DuckDB list_reduce is seedless, so the oracle prepends '#'.
_BPE_FOLD_SPARK = """
substr(aggregate(split(seg, ' '), '#',
  (acc, x) -> CASE WHEN right(acc, length(p1) + 1) = concat(' ', p1)
                    AND x = p2
              THEN concat(left(acc, length(acc) - length(p1) - 1),
                          ' ', p1, p2)
              ELSE concat(acc, ' ', x) END), 3)
"""


def _bpe_stages(n_merges: int) -> str:
    """Generate the UNROLLED n-stage WITH chain shared by the trainer
    and compression oracles: each stage computes the max-count pair
    (ties broken (p1, p2) ascending via a single scalar aggregate over
    the order-encoding key — zero-padded count then the order-INVERTED
    pair string, so max(key) == the (count DESC, p1 ASC, p2 ASC)
    tuple), then re-segments via the same fold. Unrolled rather than
    recursive: each stage needs a global argmax aggregate, which a
    recursive CTE cannot express. Every CTE is MATERIALIZED — DuckDB
    inlines plain CTEs, which re-expands the chain exponentially
    (measured as fd exhaustion at 3^10 parquet opens)."""
    parts = [r"""
WITH vocab AS MATERIALIZED (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(w)
  WHERE length(w) >= 2 GROUP BY w
),
seg0 AS MATERIALIZED (
  SELECT cnt, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seg
  FROM vocab
)"""]
    for i in range(1, n_merges + 1):
        parts.append(f""",
pairs{i} AS MATERIALIZED (
  SELECT u.p[1] AS p1, u.p[2] AS p2, CAST(SUM(cnt) AS BIGINT) AS c
  FROM (SELECT cnt, string_split(seg, ' ') AS l FROM seg{i - 1}) s,
       unnest(list_zip(l[1:length(l) - 1], l[2:length(l)])) AS u(p)
  GROUP BY 1, 2
),
best{i} AS MATERIALIZED (
  SELECT split_part(dec, ' ', 1) AS p1, split_part(dec, ' ', 2) AS p2,
         CAST(left(mx, 19) AS BIGINT) AS c
  FROM (SELECT mx,
          translate(left(substr(mx, 21), length(substr(mx, 21)) - 1),
                    'zyxwvutsrqponmlkjihgfedcba{{',
                    'abcdefghijklmnopqrstuvwxyz ') AS dec
        FROM (SELECT max(lpad(CAST(c AS VARCHAR), 19, '0') || '|' ||
                translate(p1 || ' ' || p2,
                          'abcdefghijklmnopqrstuvwxyz ',
                          'zyxwvutsrqponmlkjihgfedcba{{') || '~') AS mx
              FROM pairs{i}))
),
seg{i} AS MATERIALIZED (
  SELECT s.cnt,
         substr(list_reduce(list_prepend('#', string_split(s.seg, ' ')),
           (acc, x) -> CASE WHEN right(acc, length(b.p1) + 1) = ' ' || b.p1
                             AND x = b.p2
                       THEN left(acc, length(acc) - length(b.p1) - 1)
                            || ' ' || b.p1 || b.p2
                       ELSE acc || ' ' || x END), 3) AS seg
  FROM seg{i - 1} s, best{i} b
)""")
    return "".join(parts)


def _bpe_oracle(n_merges: int) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, p1 AS left_sym, p2 AS right_sym, "
        f"CAST(c AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1))
    return (_bpe_stages(n_merges)
            + f"\nSELECT * FROM (\n{unions}\n) ORDER BY step")


def _bpe_compression_oracle(n_merges: int) -> str:
    return _bpe_stages(n_merges) + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(cnt) AS BIGINT) AS words_total,
       CAST(SUM(cnt * length(replace(seg, ' ', ''))) AS BIGINT)
           AS chars_total,
       CAST(SUM(cnt * (length(seg) - length(replace(seg, ' ', '')) + 1))
           AS BIGINT) AS tokens_total,
       ROUND(CAST(SUM(cnt * length(replace(seg, ' ', ''))) AS DOUBLE)
             / CAST(SUM(cnt * (length(seg) - length(replace(seg, ' ', ''))
                               + 1)) AS DOUBLE), 4) AS chars_per_token
FROM seg{n_merges}"""


@query(
    "text_bpe_train_merges",
    oracle=_bpe_oracle(_BPE_MERGES),
    tags=("text", "tokenization"),
)
def text_bpe_train_merges(
    spark: SparkSession, sf: str, checkpoint_dir: str | None = None,
) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016): the first 10
    merge rounds learned from the corpus — each round counts adjacent
    symbol pairs over the current segmentation, picks the most frequent
    (ties broken (left, right) ascending, rule 5's unique-tiebreak
    discipline applied to the argmax), merges every left-to-right
    occurrence, and repeats. Returns the merge TABLE (step, left_sym,
    right_sym, pair_count) — the artifact a tokenizer ships. On this
    corpus the hierarchy appears by step 6 ('m'+'er' after 'e'+'r') and
    steps 9/10 exercise the tiebreak (equal counts 'a r' vs 'p ar').

    Spark-first shape: the per-round argmax is a SINGLE empty-grouping
    scalar aggregate over an order-encoding key (zero-padded count,
    then the order-inverted pair string — see the inline comment)
    broadcast into the next round's re-segmentation fold; no
    driver-side collect anywhere. The fold is a JVM
    aggregate() HOF with a '#' seed; the oracle replays it with
    DuckDB's seedless list_reduce + list_prepend (rule 7 applies to
    STRUCT accumulators; this accumulator is a plain VARCHAR, probed
    safe).

    Scale: the trick every real BPE trainer uses — ALL rounds run on
    the DISTINCT-word frequency table (Heaps' law: ~1e6-1e7 rows from
    100 TB of text), never the corpus; the corpus is touched exactly
    once by the word-count rollup. Each round is then two
    vocabulary-sized passes (pair explode + hash agg, fold projection)
    with scalar broadcasts between rounds; re-computation across the
    unrolled chain is O(rounds^2) vocabulary passes, still corpus-free.
    """
    merge_tables, _ = _bpe_train(spark, sf, checkpoint_dir=checkpoint_dir)
    out = merge_tables[0]
    for t in merge_tables[1:]:
        out = out.unionAll(t)
    return out.orderBy("step")


def _bpe_train(spark, sf, checkpoint_dir: str | None = None):
    """Shared trainer core: returns (per-step 1-row merge DataFrames,
    final segmentation DataFrame (cnt, seg)) after _BPE_MERGES rounds.
    See text_bpe_train_merges for the algorithm and scale notes.

    ``checkpoint_dir=None`` truncates each round's lineage with
    localCheckpoint (right for single-node runs); a path switches every
    round to reliable checkpoints into fault-tolerant storage — on a
    real cluster an executor loss mid-chain must not recompute from
    lineage that was deliberately truncated. Same seam as
    dedup_cluster_components(checkpoint_dir=) and the PageRank hops
    (wireduck_spark/ckpt.py)."""
    d = table(spark, sf, "documents", spread=True)
    vocab = (
        d.select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+"))
                 .alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # One corpus pass builds the vocab; every training round then runs
    # on this vocabulary-sized table. The eager checkpoint materializes
    # it (and each round's re-segmentation below) so the 10-round chain
    # stays 10 SMALL plans instead of one exponentially-nested lineage
    # (each round references its predecessor three times: pair count,
    # argmax join, fold) — the same lineage-truncation seam as the
    # PageRank hops; checkpoint_dir= selects the reliable variant.
    seg = _lineage_checkpoint(
        vocab.select(
            "cnt",
            F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seg"),
        ),
        checkpoint_dir,
    )
    merge_tables = []
    for step in range(1, _BPE_MERGES + 1):
        pairs = (
            seg.select(
                "cnt",
                F.expr("""
                  explode(arrays_zip(
                    slice(split(seg, ' '), 1, size(split(seg, ' ')) - 1),
                    slice(split(seg, ' '), 2, size(split(seg, ' ')) - 1)))
                """).alias("p"),
            )
            .select(F.col("p.0").alias("p1"), F.col("p.1").alias("p2"),
                    "cnt")
            .groupBy("p1", "p2")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        # Single-pass deterministic argmax: one scalar aggregate over an
        # order-encoding key — zero-padded count (numeric order ==
        # string order for non-negative int64) then the ORDER-INVERTED
        # pair string (chars a-z reversed, the space separator mapped to
        # '{' which sorts above 'z', a '~' terminator handling the
        # prefix case), so max(key) == (count DESC, p1 ASC, p2 ASC).
        # One reference to `pairs` keeps the no-checkpoint lineage at
        # branching factor 2 (the PageRank-hop bound the plan audit can
        # render); p1/p2/c are decoded back from the winning key.
        enc = F.concat(
            F.lpad(F.col("c").cast("string"), 19, "0"), F.lit("|"),
            F.translate(F.concat_ws(" ", "p1", "p2"),
                        "abcdefghijklmnopqrstuvwxyz ",
                        "zyxwvutsrqponmlkjihgfedcba{"), F.lit("~"))
        best = pairs.agg(F.max(enc).alias("mx")).select(
            F.expr("translate(left(substr(mx, 21), length(substr(mx, 21)) - 1), 'zyxwvutsrqponmlkjihgfedcba{', 'abcdefghijklmnopqrstuvwxyz ')").alias("dec"),
            F.expr("CAST(left(mx, 19) AS BIGINT)").alias("c"),
        ).select(
            F.expr("split_part(dec, ' ', 1)").alias("p1"),
            F.expr("split_part(dec, ' ', 2)").alias("p2"),
            "c",
        )
        merge_tables.append(
            best.select(
                F.lit(step).cast("bigint").alias("step"),
                F.col("p1").alias("left_sym"),
                F.col("p2").alias("right_sym"),
                F.col("c").alias("pair_count"),
            )
        )
        seg = _lineage_checkpoint(
            seg.crossJoin(F.broadcast(best)).select(
                "cnt", F.expr(_BPE_FOLD_SPARK).alias("seg"),
            ),
            checkpoint_dir,
        )
    return merge_tables, seg


@query(
    "text_bpe_segment_compression",
    oracle=_bpe_compression_oracle(_BPE_MERGES),
    tags=("text", "tokenization"),
)
def text_bpe_segment_compression(
    spark: SparkSession, sf: str, checkpoint_dir: str | None = None,
) -> DataFrame:
    """The APPLY side of the BPE trainer: segment the vocabulary with
    the 10 learned merges and report the compression the tokenizer
    buys — chars per token (1.0 = no merging helped; higher = fewer,
    longer tokens). This is the metric a pipeline tracks when choosing
    a merge budget, and at 100 TB it is the tokenize-everything path:
    the per-word segmentation computed here is exactly what the corpus
    tokenizer broadcasts (word -> token list) before the token-count /
    packing stages (text token counting and seq packing above consume
    it).

    Shares _bpe_train's plan (same vocab rollup, same per-round scalar
    broadcasts), then ONE vocabulary-sized aggregate over the final
    segmentation: token counts derive from the space count of the seg
    string (spaces + 1), characters from the space-stripped length —
    both exact int64; the one ratio uses the same IEEE division tree in
    both engines (rule 2), rounded 4 dp.
    """
    _, seg = _bpe_train(spark, sf, checkpoint_dir=checkpoint_dir)
    chars = F.length(F.regexp_replace("seg", " ", ""))
    tokens = F.length(F.col("seg")) - chars + F.lit(1)
    return seg.agg(
        F.count("*").cast("bigint").alias("n_distinct_words"),
        F.sum("cnt").cast("bigint").alias("words_total"),
        F.sum(F.col("cnt") * chars).cast("bigint").alias("chars_total"),
        F.sum(F.col("cnt") * tokens).cast("bigint").alias("tokens_total"),
        F.round(
            F.sum(F.col("cnt") * chars).cast("double")
            / F.sum(F.col("cnt") * tokens).cast("double"), 4)
        .alias("chars_per_token"),
    )
