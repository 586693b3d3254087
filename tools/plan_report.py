"""Generate PLANS.md: a physical-plan census of every registered batch
query — scans, exchanges, join strategies, windows, Arrow lanes — so
plan quality is reviewable as one table instead of 100 .explain() calls.

Run: python tools/plan_report.py  (writes PLANS.md at the repo root)

Each query executes once via the no-op sink, then its EXPLAIN FORMATTED
node list (post-AQE) is counted. Cache-backed queries include their
shared index artifact's build lineage in the counts (the cached plan
body prints with the relation), so those rows are a conservative upper
bound — the build runs once per corpus, not per query; the
`cache reads` column shows how many cached artifacts the query consumes
instead of recomputing.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COLS = [
    ("scans", ("Scan",)),
    ("exchanges", ("Exchange",)),
    ("bcast exchanges", ("BroadcastExchange",)),
    ("broadcast joins", ("BroadcastHashJoin",)),
    ("sort-merge joins", ("SortMergeJoin",)),
    ("bnlj", ("BroadcastNestedLoopJoin",)),
    ("windows", ("Window", "WindowGroupLimit")),
    ("arrow lanes", ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")),
    ("cache reads", ("InMemoryTableScan", "InMemoryRelation", "TableCacheQueryStage")),
]


def census(formatted: str) -> Counter:
    """Count node names from the FINAL adaptive plan's tree section.

    After execution the formatted explain's tree shows the final plan
    followed by an "== Initial Plan ==" branch and then the node detail
    list (which covers BOTH plans) — so count tree lines of the final
    section only. Each InMemoryRelation reprints its cached BUILD
    lineage nested beneath it even though the build executes once per
    corpus — those subtrees are pruned and the relation itself counts
    as one cache read. Non-adaptive plans have a single tree; the
    splits are no-ops there."""
    tree = formatted.split("== Initial Plan ==")[0]
    tree = tree.split("\n\n")[0]  # stop at the node-detail list
    kept: list[str] = []
    skip_deeper_than: int | None = None
    for line in tree.splitlines():
        depth = re.match(r"^[\s:+\-]*", line).end()
        if skip_deeper_than is not None:
            if depth > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in line:
            skip_deeper_than = depth
        kept.append(line)
    names = re.findall(r"(?:\* )?([A-Za-z][A-Za-z ]*?) +\(\d+\)", "\n".join(kept))
    counts: Counter = Counter()
    for n in names:
        counts[n.split()[0]] += 1  # strip qualifiers: 'BroadcastHashJoin Inner BuildLeft' etc.
    return counts


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="plan-report")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    from imdbmapreduce_spark import cache, indexstore
    from imdbmapreduce_spark.operators.dedup import persist_text_index
    from imdbmapreduce_spark.operators.similarity import persist_vector_index

    # Persist both index groups first (cheap at sf0.001) so index-served
    # queries exercise their warm path — the lifecycle bench.py models.
    # Then drop the session caches: they were populated by the BUILD
    # path (no index existed yet), and the point of the census flag is
    # the cold-session-with-index resolution order (disk artifact →
    # cache), so consumers must re-resolve through the index.
    from imdbmapreduce_spark.operators.dedup import _text_params
    from imdbmapreduce_spark.operators.similarity import _vector_params

    if indexstore.group_manifest(sf_dir, "vector", _vector_params()) is None:
        persist_vector_index(spark, sf_dir)
    if indexstore.group_manifest(sf_dir, "text", _text_params()) is None:
        persist_text_index(spark, sf_dir)
    cache.release_shared_caches()

    iroot = os.path.abspath(indexstore.index_root())
    rows: list[tuple[str, dict]] = []
    for name, fn in registry.all_queries().items():
        if name.startswith("streaming_"):
            continue
        try:
            loads0, hits0 = indexstore.load_count, cache.index_hit_count
            df = fn(spark, sf_dir)
            # collect() executes THIS DataFrame's QueryExecution (a noop
            # write would run a separate one and leave df's adaptive plan
            # un-finalized), so the explain below shows the final
            # post-AQE stages; outputs are small at sf0.001.
            df.collect()
            formatted = df._jdf.queryExecution().explainString(mode)
            c = census(formatted)
        except Exception as e:  # surfaced, not swallowed — a broken plan is a finding
            rows.append((name, {"error": re.sub(r"\s+", " ", str(e))[:80]}))
            continue
        counts = {col: sum(c[m] for m in marks) for col, marks in _COLS}
        # cold-vs-warm flag: the query is served from prebuilt artifacts
        # (warm path) when its plan scans under the index dir, when it
        # loaded an artifact during construction, or when it touched a
        # shared-cache entry whose build read one (the InMemoryRelation
        # case the path grep can't see). One-time build cost is the
        # manifest's build_sec, surfaced by bench.py as index_build_total.
        counts["index-served"] = int(
            iroot in formatted
            or indexstore.load_count > loads0
            or cache.index_hit_count > hits0
        )
        rows.append((name, counts))
    spark.stop()

    out_cols = [col for col, _ in _COLS] + ["index-served"]
    header = " | ".join(out_cols)
    lines = [
        "# PLANS — physical-plan census (auto-generated by tools/plan_report.py)",
        "",
        "Executed (post-AQE) EXPLAIN FORMATTED node counts per registered "
        f"batch query at `{sf_dir}`. `arrow lanes` are Arrow-batched Python "
        "(row-at-a-time Python is forbidden repo-wide by "
        "tests/test_plan_lint.py). Cache-backed queries (nonzero "
        "`cache reads`) include their shared index artifact's ONE-TIME "
        "build lineage in the other columns — a conservative upper bound; "
        "the build runs once per corpus, not per query. Streaming queries "
        "are excluded (their plans are pinned in tests/test_streaming.py).",
        "",
        f"| query | {header} |",
        "|" + "---|" * (len(out_cols) + 1),
    ]
    for name, c in sorted(rows):
        if "error" in c:
            lines.append(f"| {name} | ERROR: {c['error']} |")
            continue
        lines.append(
            "| " + name + " | " + " | ".join(str(c[col]) for col in out_cols) + " |"
        )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"PLANS.md: {len(rows)} queries")


if __name__ == "__main__":
    main()
