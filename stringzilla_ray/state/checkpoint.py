"""Stage checkpointing: manifest-gated Parquet boundaries with lineage.

Every wide-stage boundary of the flagship pipeline can persist its
output as partitioned Parquet plus a ``_MANIFEST.json`` recording the
stage name, the config hash, row count, file list and per-file row
counts (the per-partition lineage + metrics the north rule asks for).
A rerun with the same config hash skips the stage and streams the
checkpoint back; any config change invalidates downstream manifests
automatically because the hash differs (resume-from-any-stage,
SURVEY.md §4.2 "checkpoint/resume").
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

import pyarrow.parquet as pq

import ray.data

MANIFEST_NAME = "_MANIFEST.json"


def _collect_lineage(data_dir: Path) -> tuple[int, list[dict]]:
    files = sorted(p for p in data_dir.glob("*.parquet"))
    lineage = []
    total = 0
    for f in files:
        meta = pq.read_metadata(f)
        lineage.append({"file": f.name, "rows": meta.num_rows})
        total += meta.num_rows
    return total, lineage


def input_token_for_path(path: str | os.PathLike) -> str:
    """Cheap input fingerprint for manifest gating: source path + total
    byte size + max mtime. Rerunning the same config over CHANGED input
    then invalidates the checkpoint instead of silently resuming from
    stale Parquet (ADVICE r1)."""
    p = Path(path)
    files = sorted(p.rglob("*")) if p.is_dir() else [p]
    size = sum(f.stat().st_size for f in files if f.is_file())
    mtime = max((f.stat().st_mtime_ns for f in files if f.is_file()), default=0)
    return f"{p}:{size}:{mtime}"


def checkpointed(
    name: str,
    checkpoint_dir: str | os.PathLike | None,
    params_hash: str,
    builder,
    metrics: dict | None = None,
    input_token: str | None = None,
):
    """Run ``builder() -> Dataset`` through a manifest-gated checkpoint.

    With ``checkpoint_dir=None`` the builder's lazy Dataset is returned
    untouched (no materialization). Otherwise: if a valid manifest for
    ``params_hash`` (and ``input_token``, when given) exists the stage
    is skipped and the Parquet checkpoint is read back; else the
    builder runs, writes Parquet to a temp dir, atomically renames it
    into place, and records lineage. Callers without an input token
    must clear ``checkpoint_dir`` themselves when inputs change.
    """
    if checkpoint_dir is None:
        return builder()

    stage_dir = Path(checkpoint_dir) / name
    manifest_path = stage_dir / MANIFEST_NAME
    data_dir = stage_dir / "data"

    if manifest_path.exists():
        try:
            manifest = json.loads(manifest_path.read_text())
        except json.JSONDecodeError:
            manifest = None
        if (
            manifest
            and manifest.get("params_hash") == params_hash
            and manifest.get("input_token") == input_token
            and data_dir.exists()
        ):
            return ray.data.read_parquet(str(data_dir))

    # (Re)build: clear any stale output, write atomically.
    if stage_dir.exists():
        shutil.rmtree(stage_dir)
    tmp_dir = stage_dir / "data.tmp"
    tmp_dir.mkdir(parents=True, exist_ok=True)
    ds = builder()
    ds.write_parquet(str(tmp_dir))
    os.rename(tmp_dir, data_dir)

    rows, lineage = _collect_lineage(data_dir)
    manifest = {
        "stage": name,
        "params_hash": params_hash,
        "input_token": input_token,
        "rows": rows,
        "files": lineage,
        "written_at": time.time(),
    }
    if metrics:
        manifest["metrics"] = metrics
    manifest_path.write_text(json.dumps(manifest, indent=2))
    return ray.data.read_parquet(str(data_dir))


def stage_manifest(checkpoint_dir: str, name: str) -> dict | None:
    p = Path(checkpoint_dir) / name / MANIFEST_NAME
    if not p.exists():
        return None
    return json.loads(p.read_text())
