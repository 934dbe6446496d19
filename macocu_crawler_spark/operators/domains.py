"""Domain state: yield rule, counter merge, robots arrival.

The reference Domain object (domain.py) becomes one row per (scheme, host);
state transitions are column expressions + joins (SURVEY.md §1.1):

- yield kill rule A2 (domain.py:228-244 / config.py:246-248): pure column
  algebra, no UDF
- counter merge A1 (scheduler.py:319-329): per-round groupBy + left join +
  coalesce-add (at scale: MERGE INTO on the bucketed domains table)
- robots arrival U10/F5 (domain.py:92-134): robots bodies parsed in a
  vectorized pandas UDF; path allowance evaluated by joining rule bodies to
  candidate paths by host and batching through the parser with a per-
  executor parse cache
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import config
from ..functions import robots as robotskit

# per-executor cache: robots body -> parsed rules
_RULES_CACHE: dict[str, robotskit.RobotsRules] = {}


def _rules_for(body: str) -> robotskit.RobotsRules:
    rules = _RULES_CACHE.get(body)
    if rules is None:
        rules = robotskit.parse(body)
        if len(_RULES_CACHE) > 4096:
            _RULES_CACHE.clear()
        _RULES_CACHE[body] = rules
    return rules


@pandas_udf(T.StringType())
def robots_state_udf(state: pd.Series, body: pd.Series) -> pd.Series:
    """(fetch state, body) -> robot_state (domain.py:92-121).

    FILE -> parse -> ready (parse failure -> fail); EMPTY/blank -> empty;
    FAIL/missing -> fail; INIT -> init (redirect being followed).
    """
    out = []
    for s, b in zip(state, body):
        if s == "INIT":
            out.append("init")
        elif s is None or s == "FAIL":
            out.append("fail")
        elif s == "EMPTY" or b is None or not b.strip():
            out.append("empty")
        else:
            try:
                _rules_for(b)
                out.append("ready")
            except Exception:
                out.append("fail")
    return pd.Series(out, dtype="object")


REDIR_TARGET_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
    ]
)


@pandas_udf(REDIR_TARGET_SCHEMA)
def parse_robots_redirect_udf(location: pd.Series) -> pd.DataFrame:
    """Split a robots-redirect Location into parts; nulls on failure
    (crawl.py:394-420 builds the follow-up UrlParts from the raw URL)."""
    from ..functions import urlkit

    rows = []
    for loc in location:
        try:
            scheme, host, path = urlkit.url_split(loc or "")
        except ValueError:
            scheme = None
        if scheme not in ("http", "https") or not host:
            rows.append((None, None, None))
        else:
            rows.append((scheme, host, path))
    return pd.DataFrame(rows, columns=["scheme", "host", "path"])


@pandas_udf(T.BooleanType())
def robots_allowed_udf(body: pd.Series, path: pd.Series) -> pd.Series:
    """Vectorized is_allowed for (robots body, path) pairs (F5)."""
    agent = config.AGENT
    out = []
    for b, p in zip(body, path):
        if b is None or not b.strip():
            out.append(True)
            continue
        try:
            out.append(bool(_rules_for(b).is_allowed(agent, p)))
        except Exception:
            out.append(config.IGNORE_ROBOTS_WHEN_FAILED)
    return pd.Series(out, dtype="bool")


def apply_yield_rule(domains: DataFrame, params) -> DataFrame:
    """Mark inefficient domains bad (domain.py:228-244).

    threshold = yield_coeff * (log10(count_downloaded) - 1); applies only
    once count/bytes minimums are reached.
    """
    past_min = (F.col("bytes_downloaded") >= params.min_bytes_downloaded) & (
        F.col("count_downloaded") >= params.min_docs_downloaded
    )
    threshold = F.lit(params.yield_coeff) * (F.log10(F.col("count_downloaded")) - 1)
    violates = past_min & (
        F.col("bytes_cleaned") / F.col("bytes_downloaded") < threshold
    )
    if getattr(params, "multilingual", False):
        # MULTILINGUAL primary-language ratio (domain.py:239-243,
        # config.py:254-256); bytes_cleaned > 0 guard mirrors the simulator
        p_threshold = F.lit(params.primary_coeff) * (
            F.log10(F.col("count_downloaded")) - 1
        )
        violates = violates | (
            past_min
            & (F.col("bytes_cleaned") > 0)
            & (F.col("bytes_cleaned_primary") / F.col("bytes_cleaned") < p_threshold)
        )
    max_docs_cleaned = getattr(params, "max_docs_cleaned", None)
    if max_docs_cleaned:
        # "domain is done" cap (scheduler.py:521)
        violates = violates | (F.col("count_cleaned") >= max_docs_cleaned)
    return domains.withColumn(
        "bad", F.col("bad") | F.coalesce(violates, F.lit(False))
    )


def merge_counters(domains: DataFrame, docs: DataFrame, params=None) -> DataFrame:
    """Add the round's per-domain download/clean counters (A1).

    Only pages with accepted text contribute (raw_len is the decoded-html
    length, 0 for rejected pages — process.py:608,641 / scheduler.py:319-329).
    With MULTILINGUAL params the primary-language clean bytes accumulate in
    bytes_cleaned_primary (domain.py:219-223, scheduler.py:326-327).
    """
    multilingual = params is not None and getattr(params, "multilingual", False)
    primary = tuple(getattr(params, "primary_languages", ())) if multilingual else ()
    aggs = [
        F.count("*").alias("d_count"),
        F.sum("raw_len").alias("d_bytes"),
        F.sum(F.when(F.col("txt_len") > 0, 1).otherwise(0)).alias("c_count"),
        F.sum("txt_len").alias("c_bytes"),
    ]
    if multilingual:
        if primary:
            is_primary = (F.col("txt_len") > 0) & F.col("lang").isin(*primary)
        else:
            is_primary = F.lit(False)
        aggs.append(
            F.sum(F.when(is_primary, F.col("txt_len")).otherwise(0)).alias("p_bytes")
        )
    per_dom = docs.filter(F.col("raw_len") > 0).groupBy("scheme", "host").agg(*aggs)
    merged = (
        domains.join(per_dom, ["scheme", "host"], "left")
        .withColumn(
            "count_downloaded", F.col("count_downloaded") + F.coalesce("d_count", F.lit(0))
        )
        .withColumn(
            "bytes_downloaded", F.col("bytes_downloaded") + F.coalesce("d_bytes", F.lit(0))
        )
        .withColumn(
            "count_cleaned", F.col("count_cleaned") + F.coalesce("c_count", F.lit(0))
        )
        .withColumn(
            "bytes_cleaned", F.col("bytes_cleaned") + F.coalesce("c_bytes", F.lit(0))
        )
        .drop("d_count", "d_bytes", "c_count", "c_bytes")
    )
    if multilingual:
        merged = merged.withColumn(
            "bytes_cleaned_primary",
            F.col("bytes_cleaned_primary") + F.coalesce("p_bytes", F.lit(0)),
        ).drop("p_bytes")
    return merged


def apply_robots_arrivals(domains: DataFrame, answers: DataFrame) -> DataFrame:
    """Update domains from this round's robots answers.

    answers: (scheme, host, state, body) where scheme/host identify the
    DOMAIN being updated (for a robots-redirect fetch that is the SOURCE
    domain, crawl.py:503-520) and state is FILE/EMPTY/FAIL/INIT.
    """
    arrivals = (
        answers
        .withColumn("new_state", robots_state_udf(F.col("state"), F.col("body")))
        .select(
            "scheme", "host", "new_state",
            F.when(F.col("new_state") == "ready", F.col("body"))
            .otherwise(F.lit(None))
            .alias("new_body"),
        )
    )
    updated = (
        domains.join(arrivals, ["scheme", "host"], "left")
        .withColumn("robot_state", F.coalesce("new_state", "robot_state"))
        .withColumn("robot_body", F.coalesce("new_body", "robot_body"))
        .withColumn(
            "bad",
            F.col("bad")
            | F.coalesce(  # left-joined new_state is NULL for other domains
                (F.col("new_state") == "fail")
                & F.lit(not config.IGNORE_ROBOTS_WHEN_FAILED),
                F.lit(False),
            ),
        )
        .drop("new_state", "new_body")
    )
    return updated
