"""Text analysis for training-data pipelines: token counting, quality
scoring, language identification.

Token/quality ops are pure column algebra with paired DuckDB oracles.
Language ID comes in two flavours:

- `langid_trigram`: the crawler's real trigram models (textkit) behind an
  Arrow-batched pandas UDF — not SQL-expressible, so its driver check is
  rows-only (the byte-level contract is covered by the crawl tests)
- the stopword-ratio quality signal is SQL-expressible and oracle-checked
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# a small static English function-word list, inlined identically in the
# oracle SQL (do NOT edit one side only)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "in", "on", "to", "is", "are",
    "was", "were", "by", "for", "with", "as", "at", "from",
)


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_counted, avg_token_len) — P12 token count
    generalised; whitespace tokenisation (config SPACE_SEP_TOKENS)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col("text")).cast("long").alias("n_chars_counted"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), r"\s+", "")) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


TOKEN_STATS_ORACLE = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars_counted,
       round(length(regexp_replace(text, '\s+', '', 'g'))
             / len(string_split_regex(trim(text), '\s+')), 4) AS avg_token_len
FROM documents
"""


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, stopword_ratio, quality_class) — jusText-style quality
    gates as a corpus-filter op (length + stopword density thresholds from
    config.py:317-331 of the reference, applied corpus-side)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sw_array = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw_array, t)))
    ratio = F.round(n_stop / F.size(toks), 4)
    return documents.select(
        "doc_id",
        ratio.alias("stopword_ratio"),
        F.when(F.length("text") < 50, F.lit("short"))
        .when(ratio >= 0.3, F.lit("good"))
        .when(ratio >= 0.2, F.lit("neargood"))
        .otherwise(F.lit("bad"))
        .alias("quality_class"),
    )


QUALITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars_q,
         len(string_split_regex(trim(text), '\s+')) AS n_tok,
         len(list_filter(string_split_regex(trim(text), '\s+'),
             x -> list_contains({stopwords}, x))) AS n_stop
  FROM documents
)
SELECT doc_id, round(n_stop / n_tok, 4) AS stopword_ratio,
       CASE WHEN n_chars_q < 50 THEN 'short'
            WHEN round(n_stop / n_tok, 4) >= 0.3 THEN 'good'
            WHEN round(n_stop / n_tok, 4) >= 0.2 THEN 'neargood'
            ELSE 'bad' END AS quality_class
FROM t
""".format(stopwords="[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]")


# BPE-ish subword tokenisation: a GPT-2-style pre-tokeniser regex
# (contraction suffixes | space+letters | space+digits | space+punct runs).
# The pattern is shared verbatim with the DuckDB oracle — it uses only
# constructs Java regex and RE2 treat identically (no backrefs/lookaround).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s]+"


def subword_token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_subwords, n_unique_subwords, subword_chars): token counts
    under the BPE-ish pre-tokeniser — the LLM-pipeline complement to the
    whitespace token_stats (both pure JVM column algebra)."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_subwords"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_subwords"),
        F.length(F.concat_ws("", toks)).cast("long").alias("subword_chars"),
    )


SUBWORD_STATS_ORACLE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s]+')) AS n_subwords,
       len(list_distinct(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s]+'))) AS n_unique_subwords,
       length(array_to_string(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s]+'), '')) AS subword_chars
FROM documents
"""


LANGID_SCHEMA = T.StructType(
    [
        T.StructField("best_lang", T.StringType()),
        T.StructField("lang_diff", T.DoubleType()),
    ]
)


@pandas_udf(LANGID_SCHEMA)
def _langid_udf(text: pd.Series) -> pd.DataFrame:
    from ..functions.textkit import get_lang_models
    from ..functions.trigram import TrigramModel

    models = get_lang_models()
    rows = []
    for t in text:
        if not t:
            rows.append((None, None))
            continue
        doc = TrigramModel(t)
        best, best_diff = None, 1.0
        for lang, model in models.items():
            d = model.diff(doc)
            if d < best_diff:
                best, best_diff = lang, d
        rows.append((best, round(best_diff, 6)))
    return pd.DataFrame(rows, columns=["best_lang", "lang_diff"])


def langid_trigram(documents: DataFrame) -> DataFrame:
    """(doc_id, best_lang, lang_diff) via the crawler's trigram models
    (U5/U9) — Arrow-batched; rows-only driver check (non-SQL)."""
    return documents.select(
        "doc_id", _langid_udf(F.col("text")).alias("lid")
    ).select("doc_id", F.col("lid.best_lang").alias("best_lang"),
             F.col("lid.lang_diff").alias("lang_diff"))
