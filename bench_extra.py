#!/usr/bin/env python3
"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file exists so the optimization loop can time and inspect individual
queries without touching it).

Replicates bench.run_queries methodology exactly — same session factory
(session.get_spark with shuffle_partitions = core count), noop sink,
best-of-2, clearCache between entries — but:

  * SF dir / core count via the same env vars as bench.py
  * optional query-name filter:   python bench_extra.py dedup_onion ...
  * --plans DIR dumps .explain("formatted") per query to DIR/<name>.txt
  * --repeat N overrides best-of-N (default 2, same as bench.py)

Prints one JSON line {"queries": {name: sec}, "sf": ...} at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    repeat = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod

    from macocu_crawler_spark.session import get_spark

    spark = get_spark(
        app_name=f"macocu-bench-extra-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    timings = {}
    try:
        qs = entrymod.queries()
        oracle_names = set(entrymod.oracle_sql())
        for name, fn in qs.items():
            if name not in oracle_names or name == "crawl_rounds":
                continue
            if names and name not in names:
                continue
            if plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
                spark.catalog.clearCache()
            best = None
            for _ in range(repeat):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                best = wall if best is None else min(best, wall)
            timings[name] = round(best, 3)
            log(f"query {name}: {timings[name]}s")
            spark.catalog.clearCache()
    finally:
        spark.stop()
    print(json.dumps({"queries": timings, "sf": float(SF)}))


if __name__ == "__main__":
    main()
