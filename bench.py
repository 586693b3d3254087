"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization uses the no-op sink (df.write.format("noop")) so timing
covers the full distributed plan without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.session import get_spark

    spark = get_spark(app_name="imdbmapreduce_spark-bench")

    queries = registry.bench_queries()

    def materialize(name: str) -> None:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warmup pass: first execution of each plan shape pays JIT/codegen
    # compilation (measured 6-18s of one-off cost); steady-state is what a
    # long-running cluster job sees, so that's what we time. Best-of-2
    # timed passes because this VM shows multi-second scheduler jitter.
    for name in sorted(queries):
        materialize(name)

    timings: dict[str, float] = {}
    for _ in range(2):
        for name in sorted(queries):
            t0 = time.monotonic()
            materialize(name)
            dt = round(time.monotonic() - t0, 4)
            timings[name] = min(timings.get(name, dt), dt)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
