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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    d = table(spark, sf, "documents")
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
    d = table(spark, sf, "documents")
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
    d = table(spark, sf, "documents")
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
           CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(n64) + 1),
                       i -> CAST(ascii(substring(n64, CAST(i AS INTEGER), 1))
                                 AS BIGINT))),
               (a, x) -> (a * 31 + x) % 1000000007) AS BIGINT) AS poly_hash
    FROM norm
    """,
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text + a 64-char
    polynomial rolling hash (mod 1e9+7), computed as an identical
    left-fold over character codes in Spark (aggregate) and DuckDB
    (list_reduce)."""
    d = table(spark, sf, "documents")
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
