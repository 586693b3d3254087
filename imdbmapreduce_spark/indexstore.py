"""Persistent vector-index artifacts (IVF/PQ) — build once, reopen later.

The ANN plans in ``operators.similarity`` derive four per-corpus index
tables: the IVF codebook + inverted lists and the PQ codebook + codes.
Within one session they live in the bounded shared cache; this module
adds the real index lifecycle on top — write them as parquet under the
warehouse dir so a LATER session answers queries from the prebuilt index
instead of re-running the clustering/encoding jobs.

Generalizes the reference's own table persistence: the ETS tables it
builds from the CSV are saved with ``ets:tab2file`` and restored on
restart (/root/reference/Code/csv_to_ets.erl:63-74 — SURVEY.md §2 S5);
here the "table file" is a parquet directory per artifact plus a JSON
manifest.

Correctness hazards handled:

- **Staleness**: the manifest records a stamp of the source
  ``embeddings.parquet`` (size + mtime). ``load_artifact`` refuses a
  manifest whose stamp no longer matches — a rebuilt corpus can never be
  served from an old index.
- **Partial writes**: the manifest is written LAST, only after every
  artifact committed; a crashed ``persist`` leaves no manifest and the
  loader falls back to building.

Scale: these artifacts are exactly what a production vector store
persists (FAISS's IVFPQ file is the same four structures). Codebooks are
cells×dims / subspaces×codes×dims constants; lists and codes are one
small row per corpus vector — o(corpus), partitioned parquet, readable
with partition pruning by any number of executors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

INDEX_ARTIFACTS = ("ivf_codebook", "ivf_lists", "pq_codebook", "pq_codes")
_MANIFEST = "_INDEX_MANIFEST.json"


def index_root() -> str:
    """Warehouse location for persisted indexes; override with
    ``SPARK_GRAFT_INDEX_DIR`` (tests point it at a tmp dir)."""
    env = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, "spark-warehouse", "vector_index")


def _index_dir(sf_dir: str) -> str:
    return os.path.join(index_root(), os.path.basename(os.path.normpath(sf_dir)))


def _source_stamp(sf_dir: str) -> dict:
    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    return {"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def manifest(sf_dir: str) -> dict | None:
    """The on-disk manifest if present AND still matching the source
    corpus, else None."""
    try:
        with open(os.path.join(_index_dir(sf_dir), _MANIFEST), encoding="utf-8") as f:
            m = json.load(f)
    except (OSError, ValueError):
        return None
    try:
        if m.get("source") != _source_stamp(sf_dir):
            return None  # corpus changed since the index was built
    except OSError:
        return None
    if set(m.get("artifacts", [])) != set(INDEX_ARTIFACTS):
        return None
    return m


def load_artifact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame | None:
    """Open one persisted artifact, or None when no valid index exists.

    The read is a plain parquet scan — lazy, column-pruned, and (for the
    per-vector lists/codes) split across executors like any table.
    """
    if name not in INDEX_ARTIFACTS or manifest(sf_dir) is None:
        return None
    return spark.read.parquet(os.path.join(_index_dir(sf_dir), name))


def persist(spark: SparkSession, sf_dir: str, artifacts: dict[str, DataFrame]) -> str:
    """Write all four artifacts as parquet + manifest; returns the index
    dir. ``artifacts`` maps each INDEX_ARTIFACTS name to its DataFrame
    (built by operators.similarity). Overwrites any previous index for
    this corpus; the manifest lands last so readers never see a torn
    index.
    """
    missing = set(INDEX_ARTIFACTS) - set(artifacts)
    if missing:
        raise ValueError(f"missing index artifacts: {sorted(missing)}")
    d = _index_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    mpath = os.path.join(d, _MANIFEST)
    if os.path.exists(mpath):
        os.remove(mpath)  # invalidate readers before touching data
    for name in INDEX_ARTIFACTS:
        artifacts[name].write.mode("overwrite").parquet(os.path.join(d, name))
    with open(mpath, "w", encoding="utf-8") as f:
        json.dump(
            {"source": _source_stamp(sf_dir), "artifacts": list(INDEX_ARTIFACTS)},
            f,
            indent=1,
        )
    return d


def drop(sf_dir: str) -> None:
    """Remove a persisted index (idempotent)."""
    import shutil

    shutil.rmtree(_index_dir(sf_dir), ignore_errors=True)
