"""Physical-plan inspection helpers.

Used by the plan-audit tests and by bench tooling to assert the properties
the 100 TB design depends on: filters reaching the scan, pruned read
schemas, broadcast joins for dimensions, bounded shuffle counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, executed: bool = True) -> str:
    qe = df._jdf.queryExecution()
    return (qe.executedPlan() if executed else qe.optimizedPlan()).toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the datasource scan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every scan (column-pruning audit)."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan_string(df))
    ]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (each Exchange = one full data movement)."""
    return len(re.findall(r"\bExchange\b", plan_string(df)))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def summarize(df: DataFrame) -> dict:
    return {
        "exchanges": count_exchanges(df),
        "broadcast_join": uses_broadcast_join(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
    }
