"""Persistent index artifacts — build once, reopen in a later session.

Query families here derive expensive per-corpus artifacts: the vector
family's IVF codebook + inverted lists and PQ codebook + codes, and the
text-dedup family's capped shingle rows, hashed shingles, Jaccard pair
set and SimHash fingerprints. Within one session they live in the
bounded shared cache; this module adds the real index lifecycle on top —
write them as parquet under the warehouse dir so a LATER session answers
queries from the prebuilt index instead of re-running the clustering/
encoding/shingling jobs.

Generalizes the reference's own table persistence: the ETS tables it
builds from the CSV are saved with ``ets:tab2file`` and restored on
restart (/root/reference/Code/csv_to_ets.erl:63-74 — SURVEY.md §2 S5);
here the "table file" is a parquet directory per artifact plus a JSON
manifest per (corpus, group).

Correctness hazards handled:

- **Staleness**: the manifest records a stamp of the group's source
  parquet (size + mtime). Loaders refuse a manifest whose stamp no
  longer matches — a rebuilt corpus can never be served from an old
  index.
- **Parameter drift**: the manifest records the build parameters
  (quantization scale, cell/code counts, shingle k, df cap, ...).
  Loaders pass the CURRENT module constants; any mismatch refuses the
  index — editing a tuning constant can never silently serve artifacts
  built under the old one.
- **Partial writes**: the manifest is written LAST, only after every
  artifact committed; a crashed ``persist_group`` leaves no manifest
  and the loader falls back to building.

Scale: these artifacts are exactly what production systems persist
(FAISS's IVFPQ file is the vector group's four structures; a dedup
service's shingle/fingerprint tables are the text group's). Codebooks
are constant-sized; lists/codes/shingle rows are o(corpus) slim rows —
partitioned parquet, readable with pruning by any number of executors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# group -> (source parquet file used for the staleness stamp)
GROUPS = {
    "vector": "embeddings.parquet",
    "text": "documents.parquet",
    # the ER family's MDM artifacts (round 12): the deletion-blocked
    # match table + the standing base entity assignment
    "er": "customer.parquet",
}

# Monotone count of successful artifact loads this process — tooling
# (tools/plan_report.py) snapshots it around a query to attribute
# index-served status even when the scan hides behind a shared-cache
# InMemoryRelation. A counter, not a log: zero growth.
load_count = 0
# the vector group's artifact set (fixed — persist_group checks it)
INDEX_ARTIFACTS = (
    "ivf_codebook",
    "ivf_lists",
    "pq_codebook",
    "pq_codes",
    "dedup_codebook",
    "dedup_cells",
)
_MANIFEST = "_INDEX_MANIFEST.json"


def index_root() -> str:
    """Warehouse location for persisted indexes; override with
    ``SPARK_GRAFT_INDEX_DIR`` (tests point it at a tmp dir)."""
    env = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, "spark-warehouse", "vector_index")


def _group_dir(sf_dir: str, group: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(index_root(), base, group)


def _source_stamp(sf_dir: str, group: str) -> dict:
    p = os.path.join(sf_dir, GROUPS[group])
    st = os.stat(p)
    return {"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def group_manifest(sf_dir: str, group: str, params: dict | None = None) -> dict | None:
    """The on-disk manifest for (corpus, group) if present, still
    matching the source corpus, and (when ``params`` is given) built
    under the same parameters — else None."""
    try:
        with open(
            os.path.join(_group_dir(sf_dir, group), _MANIFEST), encoding="utf-8"
        ) as f:
            m = json.load(f)
    except (OSError, ValueError):
        return None
    try:
        if m.get("source") != _source_stamp(sf_dir, group):
            return None  # corpus changed since the index was built
    except OSError:
        return None
    if params is not None and m.get("params") != params:
        return None  # tuning constants changed — refuse the stale build
    return m


def load_group_artifact(
    spark: SparkSession,
    sf_dir: str,
    group: str,
    name: str,
    params: dict | None = None,
) -> DataFrame | None:
    """Open one persisted artifact, or None when no valid index exists.

    The read is a plain parquet scan — lazy, column-pruned, and (for the
    per-row artifacts) split across executors like any table.
    """
    m = group_manifest(sf_dir, group, params)
    if m is None or name not in m.get("artifacts", []):
        return None
    global load_count
    load_count += 1
    return spark.read.parquet(os.path.join(_group_dir(sf_dir, group), name))


def persist_group(
    spark: SparkSession,
    sf_dir: str,
    group: str,
    artifacts: dict[str, DataFrame],
    params: dict | None = None,
    build_t0: float | None = None,
) -> str:
    """Write a group's artifacts as parquet + manifest; returns the
    group dir. Overwrites any previous index for this (corpus, group);
    the manifest lands last so readers never see a torn index.

    ``build_t0``: monotonic timestamp at which the CALLER started
    building the artifact frames. Artifact builds can run real jobs
    before this function is entered (shared-cache materializations,
    closure checkpoints), so the manifest's ``build_sec`` must cover
    them — a persist-window-only number understates the true build cost
    (the r12 verdict measured the ER build ~20-40 s at sf0.1 against a
    recorded 0.9 s). Callers that construct artifacts lazily may omit
    it; the timer then starts here, as before.
    """
    import shutil
    import time

    if group not in GROUPS:
        raise ValueError(f"unknown artifact group {group!r}")
    if not artifacts:
        raise ValueError("no artifacts to persist")
    # Stamp the source BEFORE materializing anything: the artifacts are
    # about to be computed from the corpus as it exists NOW, so this is
    # the stamp the manifest must carry. Re-stat after the writes and
    # refuse to commit on mismatch — a corpus rebuilt mid-persist would
    # otherwise get the NEW stamp glued onto artifacts of the OLD data,
    # silently defeating the staleness guard.
    src = _source_stamp(sf_dir, group)
    t0 = time.monotonic() if build_t0 is None else build_t0
    d = _group_dir(sf_dir, group)
    os.makedirs(d, exist_ok=True)
    # STAGE-THEN-SWAP: when a re-persist's artifacts were themselves
    # LOADED from this very index (the cached DataFrames are lazy parquet
    # scans of <d>/<name>), a direct overwrite would delete the files
    # before the read executes — destroying the index mid-job. Writing to
    # a staging subdir first reads the old files intact; the swap is then
    # pure driver-side directory renames with the manifest removed for
    # its duration, so readers never see a torn index.
    stage = os.path.join(d, ".stage")
    shutil.rmtree(stage, ignore_errors=True)
    for name in sorted(artifacts):
        artifacts[name].write.mode("overwrite").parquet(os.path.join(stage, name))
    mpath = os.path.join(d, _MANIFEST)
    if os.path.exists(mpath):
        os.remove(mpath)  # invalidate readers before touching data
    for name in sorted(artifacts):
        final = os.path.join(d, name)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(os.path.join(stage, name), final)
    shutil.rmtree(stage, ignore_errors=True)
    build_sec = time.monotonic() - t0
    if _source_stamp(sf_dir, group) != src:
        # Corpus changed while we were building — the artifacts on disk
        # derive from the old corpus. Leave no manifest (readers fall
        # back to building) rather than commit a lie.
        raise RuntimeError(
            f"source {GROUPS[group]} changed during persist_group({group!r}); "
            "index not committed"
        )
    with open(mpath, "w", encoding="utf-8") as f:
        json.dump(
            {
                "source": src,
                "artifacts": sorted(artifacts),
                "params": params or {},
                "build_sec": round(build_sec, 3),
            },
            f,
            indent=1,
        )
    return d


def drop_group(sf_dir: str, group: str) -> None:
    """Remove a persisted group (idempotent)."""
    import shutil

    shutil.rmtree(_group_dir(sf_dir, group), ignore_errors=True)


# --- vector-group compatibility surface (operators.similarity) ------------


def manifest(sf_dir: str) -> dict | None:
    """The vector group's manifest (back-compat name)."""
    m = group_manifest(sf_dir, "vector")
    if m is not None and set(m.get("artifacts", [])) != set(INDEX_ARTIFACTS):
        return None
    return m


def load_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame | None:
    if name not in INDEX_ARTIFACTS or manifest(sf_dir) is None:
        return None
    return spark.read.parquet(os.path.join(_group_dir(sf_dir, "vector"), name))


def drop(sf_dir: str) -> None:
    drop_group(sf_dir, "vector")
