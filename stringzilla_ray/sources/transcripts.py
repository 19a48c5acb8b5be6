"""Transcript table IO: schema-validated readers and a resumable,
partitioned writer.

The input contract is the north-rule shape
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp[us])``; readers project to the columns a
pipeline asks for (prune at the read — only needed columns leave
storage) and validate the schema up front so a bad source fails fast
instead of mid-shuffle.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa

import ray.data

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

REQUIRED_COLUMNS = ("conv_id", "turn_idx", "role", "text")


def read_transcripts(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Parquet reader with schema validation + column pruning.

    Validates against the file footer BEFORE building the Dataset so a
    bad source fails fast with a clear error instead of mid-shuffle.
    """
    import pyarrow.parquet as pq

    columns = columns or list(REQUIRED_COLUMNS)
    target = path
    if os.path.isdir(path):
        parts = sorted(Path(path).glob("*.parquet"))
        if not parts:
            raise ValueError(f"no parquet files under {path}")
        target = str(parts[0])
    names = set(pq.read_schema(target).names)
    missing = [c for c in columns if c not in names]
    if missing:
        raise ValueError(f"transcript source {path} missing columns: {missing}")
    from stringzilla_ray.util import read_parquet_clean

    return read_parquet_clean(path, columns=columns)


def read_transcripts_json(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """JSONL reader for transcript rows (same logical schema)."""
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_partitioned(ds: "ray.data.Dataset", out_dir: str, min_rows_per_file: int = 200_000) -> dict:
    """Resumable sink: a directory of part files written via a temp dir
    + atomic rename, plus a manifest of files and row counts, so a
    rerun can detect a completed partition and skip it (never one
    giant file)."""
    out = Path(out_dir)
    tmp = out.with_suffix(".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    ds.write_parquet(str(tmp), min_rows_per_file=min_rows_per_file)
    if out.exists():
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)

    import pyarrow.parquet as pq

    files = sorted(p.name for p in out.glob("*.parquet"))
    manifest = {
        "files": [{"file": f, "rows": pq.read_metadata(out / f).num_rows} for f in files],
    }
    manifest["rows"] = sum(f["rows"] for f in manifest["files"])
    (out / "_MANIFEST.json").write_text(json.dumps(manifest, indent=2))
    return manifest
