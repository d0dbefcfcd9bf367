"""Checkpoint manifest + resumable partitioned output (SURVEY.md §4.3.4).

The reference's only persistence is whole-filter Serialize/Deserialize
(src/cuckoofilter.h:104-119, exercised by example/test1.cc:63-72).  The
engine's unit of persistence is the **filter-shard Parquet partition** plus a
manifest of completed partitions:

    root/
      manifest.json                 {partition → {rows, num_items, lineage…}}
      part=<group>/part-*.parquet   one directory per group/shard

Resume = read manifest, skip completed partitions, rebuild only the missing
ones (anti-join of the plan against the manifest).  Writes are atomic:
partition data lands under a temp name and the manifest is rewritten last.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

MANIFEST = "manifest.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def read_manifest(root: str) -> dict:
    path = _manifest_path(root)
    if not os.path.exists(path):
        return {"partitions": {}, "config": {}}
    with open(path) as f:
        return json.load(f)


def _write_manifest(root: str, manifest: dict) -> None:
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))


def completed_partitions(root: str) -> set[str]:
    return set(read_manifest(root)["partitions"])


def write_filter_shards(filters_ds: "ray.data.Dataset", root: str,
                        group_col: str = "group_key",
                        config: Optional[dict] = None,
                        lineage: Optional[dict] = None) -> dict:
    """Write a filter-shard Dataset as one Parquet dir per group + manifest.

    Filter tables are small (bytes-per-key ≪ input), so collecting shard rows
    per group on the driver is fine; the INPUT never materializes.  Each
    partition write is atomic (tmp file + rename); the manifest lands last.
    """
    os.makedirs(root, exist_ok=True)
    manifest = read_manifest(root)
    manifest["config"] = config or manifest.get("config", {})
    for batch in filters_ds.iter_batches(batch_size=64, batch_format="pyarrow"):
        groups = batch.column(group_col).to_pylist()
        for i, gk in enumerate(groups):
            part = f"{group_col}={gk}"
            pdir = os.path.join(root, part)
            os.makedirs(pdir, exist_ok=True)
            row = batch.slice(i, 1)
            tmp = os.path.join(pdir, ".part-0.parquet.tmp")
            pq.write_table(row, tmp)
            os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
            entry = {"rows": 1, "written_at": time.time()}
            if "num_items" in batch.column_names:
                entry["num_items"] = batch.column("num_items")[i].as_py()
            if lineage:
                entry["lineage"] = lineage.get(str(gk), [])
            manifest["partitions"][part] = entry
    _write_manifest(root, manifest)
    return manifest


def read_filter_shards(root: str) -> "ray.data.Dataset":
    """Read back all completed shard partitions as one Dataset."""
    manifest = read_manifest(root)
    files = [os.path.join(root, part, "part-0.parquet")
             for part in sorted(manifest["partitions"])]
    return ray.data.read_parquet(files)


def missing_groups(root: str, planned_groups: Iterable[str],
                   group_col: str = "group_key") -> list[str]:
    """The resume anti-join: planned groups not yet in the manifest."""
    done = completed_partitions(root)
    return [g for g in planned_groups if f"{group_col}={g}" not in done]


def resumable_write_partitioned(ds: "ray.data.Dataset", root: str,
                                partition_col: str) -> dict:
    """General resumable sink: one Parquet partition dir per distinct
    ``partition_col`` value, written atomically BY THE WORKERS (one
    ``map_groups`` task per partition — the driver only updates the
    manifest), with completed partitions skipped on re-run.

    This is the prompt's "resumable output" contract for arbitrary result
    datasets (dedup winners, probe outputs): a failed run re-executes only
    missing partitions; never one giant file.
    """
    import numpy as np

    os.makedirs(root, exist_ok=True)
    manifest = read_manifest(root)
    done_vals = {p.split("=", 1)[1] for p in manifest["partitions"]}

    def keep_missing(t: pa.Table) -> pa.Table:
        vals = np.array([str(v) for v in t.column(partition_col).to_pylist()])
        return t.filter(pa.array(~np.isin(vals, np.array(sorted(done_vals))
                                          if done_vals else np.array([], str))))

    todo = ds.map_batches(keep_missing, batch_format="pyarrow",
                          batch_size=None)

    def write_group(group: pa.Table) -> pa.Table:
        gv = str(group.column(partition_col)[0].as_py())
        pdir = os.path.join(root, f"{partition_col}={gv}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        return pa.table({partition_col: pa.array([gv]),
                         "rows": pa.array([len(group)], pa.int64())})

    written = todo.groupby(partition_col).map_groups(write_group,
                                                     batch_format="pyarrow")
    for r in written.take_all():
        manifest["partitions"][f"{partition_col}={r[partition_col]}"] = {
            "rows": int(r["rows"]), "written_at": time.time()}
    _write_manifest(root, manifest)
    return manifest


def resumable_build(ds: "ray.data.Dataset", root: str, group_key: str,
                    build_fn, config: Optional[dict] = None) -> "ray.data.Dataset":
    """Build filters only for groups missing from the checkpoint, merge with
    the completed shards, update the manifest, return the full shard set.

    ``build_fn(sub_ds, group_key) -> filters_ds`` is any build pipeline from
    ``pipelines.build``.  Config mismatches (seed/bits/capacity) fail loudly —
    resuming with different hash parameters would corrupt merges.
    """
    manifest = read_manifest(root)
    if manifest["partitions"] and config and manifest.get("config") and \
            manifest["config"] != config:
        raise ValueError(
            f"checkpoint config mismatch: {manifest['config']} != {config}")
    planned = sorted(str(g) for g in ds.unique(group_key))
    todo = missing_groups(root, planned)
    if todo:
        todo_set = set(todo)

        def keep_todo(t: pa.Table) -> pa.Table:
            vals = t.column(group_key).to_pylist()
            import numpy as np
            return t.filter(pa.array(np.array([str(v) in todo_set for v in vals])))

        sub = ds.map_batches(keep_todo, batch_format="pyarrow")
        built = build_fn(sub, group_key)
        write_filter_shards(built.map_batches(
            lambda t: t.append_column("group_key", t.column(group_key))
            if "group_key" not in t.column_names else t,
            batch_format="pyarrow"), root, config=config)
    return read_filter_shards(root)
