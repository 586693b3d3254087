"""Dump EXPLAIN FORMATTED for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/explain_dump.py <tag> <suffix> name1 [name2 ...]
   e.g. python tools/explain_dump.py r12 before containment_prefix_join

Each query executes once via collect() (so the adaptive plan finalizes on
THIS DataFrame's QueryExecution — a noop write would run a separate one),
then its post-AQE formatted explain is written out. Default data dir is
$SPARK_GRAFT_SF_DIR or sf0.01 — big enough that AQE decisions (broadcast
thresholds, coalesced partition counts) resemble the bench's, small enough
that a multi-query dump stays fast.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    assert names, "pass at least one query name"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.session import get_spark

    spark = get_spark(app_name="explain-dump")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    queries = registry.all_queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"explain_dump: {name}")
        df = queries[name](spark, sf_dir)
        df.collect()
        formatted = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(formatted)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
