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
    # long-running cluster job sees, so that's what we time. Median-of-3
    # timed passes: this VM shows ±50% scheduler jitter, and the r1→r2
    # uniform ~1.4× drift on untouched plans proved best-of-2 numbers have
    # noise comparable to real per-query deltas — medians resist a single
    # slow (GC pause) or single lucky pass.
    for name in sorted(queries):
        materialize(name)

    runs: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(3):
        for name in sorted(queries):
            t0 = time.monotonic()
            materialize(name)
            runs[name].append(time.monotonic() - t0)
    timings = {name: round(sorted(ts)[len(ts) // 2], 4) for name, ts in runs.items()}

    # Key order matters: the driver's capture keeps only the TAIL of long
    # lines, and with 80+ queries the line exceeds that window. Putting
    # "queries" first and the summary scalars last guarantees the totals
    # survive truncation; the full record is also written to BENCH_LOCAL.json
    # (committed per round) so no per-query number is ever lost.
    out = {
        "queries": timings,
        "metric": "headline_queries_total",
        "unit": "sec",
        "sf": sf,
        "value": round(sum(timings.values()), 4),
    }
    print(json.dumps(out))
    try:
        local = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
        with open(local, "w") as f:
            json.dump(out, f, indent=1, sort_keys=False)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line is still authoritative
    # Sweep over: release the shared corpus artifacts (shingle sets,
    # quantized components) so a host embedding this harness reclaims
    # storage memory — the bounded-cache contract in cache.py.
    from imdbmapreduce_spark.cache import release_shared_caches

    release_shared_caches()
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
