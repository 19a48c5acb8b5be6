"""Raw text / binary file sources — the Ray-Data analogue of the
reference's ``File`` memory-mapped type (python/README.md:106-120:
a file opened as one big Str, then sliced/split). Here a file becomes
a Dataset of line rows (or one binary payload row), produced by
vectorized in-task decoding:

- ``read_text_lines``: binary file blocks -> (path, line_no, line)
  rows via the 7-delimiter newline splitter (sz_utf8_newlines
  semantics — the same kernel splitlines queries use);
- ``read_binary_blobs``: (path, payload) rows feeding the multimodal
  decode stage;
- ``read_documents_any``: extension-dispatched parquet / CSV / JSONL
  reader with column pruning — lets every documents-table query run
  off non-parquet exports unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _maybe_gunzip(b: bytes | None) -> bytes | None:
    """Transparent gzip: decompress when the payload carries the gzip
    magic (1f 8b) — file-granular stdlib work, never per row."""
    if b is not None and len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
        import gzip

        return gzip.decompress(b)
    return b


def _explode_lines(batch: pa.Table) -> pa.Table:
    """(path, bytes) file rows -> (path, line_no, line) line rows."""
    from stringzilla_ray.functions.segment import splitlines_column

    paths = batch["path"]
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    payload = batch["bytes"]
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    texts = pa.array(
        [None if (b := _maybe_gunzip(v.as_py())) is None
         else b.decode("utf-8", "replace")
         for v in payload],
        pa.large_string(),
    )
    values, parents = splitlines_column(texts)
    # per-file line numbers: position within the parent segment
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(par):
        first = np.concatenate([[True], par[1:] != par[:-1]])
        seg_start = np.maximum.accumulate(np.where(first, np.arange(len(par)), 0))
        line_no = np.arange(len(par)) - seg_start
    else:
        line_no = np.zeros(0, np.int64)
    return pa.table({
        "path": paths.take(parents),
        "line_no": pa.array(line_no, pa.int64()),
        "line": values,
    })


def read_text_lines(path: str) -> "ray.data.Dataset":
    """File(s) -> one row per line: (path, line_no, line), split on the
    7-delimiter newline set with CRLF as one separator (the reference's
    ``File`` + splitlines view, vectorized per block)."""
    ds = ray.data.read_binary_files(path, include_paths=True)
    return ds.map_batches(_explode_lines, batch_format="pyarrow")


def read_binary_blobs(path: str) -> "ray.data.Dataset":
    """File(s) -> (path, payload large_binary) rows — the ingest shape
    the multimodal decode stage consumes."""
    ds = ray.data.read_binary_files(path, include_paths=True)

    def rename(batch: pa.Table) -> pa.Table:
        payload = batch["bytes"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        return pa.table({
            "path": batch["path"],
            "payload": payload.cast(pa.large_binary()),
        })

    return ds.map_batches(rename, batch_format="pyarrow")


def read_documents_any(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Extension-dispatched reader for a documents-shaped table:
    .parquet (pruned at the read), .csv, .json/.jsonl, each optionally
    .gz-compressed (web-corpus exports ship gzipped). Column pruning
    applies in-read for parquet and as an immediate projection for the
    text formats."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        # a write_jsonl / write_json output directory
        js = sorted(_glob.glob(_os.path.join(path, "*.json"))
                    + _glob.glob(_os.path.join(path, "*.jsonl")))
        if js:
            ds = ray.data.read_json(js)
            return ds.select_columns(columns) if columns else ds
    lower = path.lower()
    open_args = {}
    if lower.endswith(".gz"):
        lower = lower[: -len(".gz")]
        open_args = {"arrow_open_stream_args": {"compression": "gzip"}}
    if lower.endswith(".parquet") or not any(
        lower.endswith(s) for s in (".csv", ".json", ".jsonl")
    ):
        from stringzilla_ray.util import read_parquet_clean

        return read_parquet_clean(path, columns=columns)
    if lower.endswith(".csv"):
        ds = ray.data.read_csv(path, **open_args)
    else:
        ds = ray.data.read_json(path, **open_args)
    return ds.select_columns(columns) if columns else ds


def write_jsonl(ds, path: str) -> None:
    """JSONL sink (one object per line, one file per block) — the
    interchange format corpus tooling expects. Round-trips through
    ``read_documents_any(path)``: write + read is the identity on a
    documents-shaped table (oracle `jsonl_roundtrip`)."""
    ds.write_json(path)


def read_csv_files(path: str, column_names: list[str]) -> "ray.data.Dataset":
    """CSV file(s) -> typed-string rows via the vectorized RFC-4180
    codec (functions/csvx.py): per file-blob batch, one quote-parity
    record split (quoted newlines stay inside their record) + one
    field parse — no per-row Python.  Header-less files; callers name
    the columns.  Scale shape: parallelism is per FILE
    (read_binary_files), matching the sharded-parquet contract."""
    from stringzilla_ray.functions.csvx import (csv_parse_rows,
                                                csv_split_records)

    ds = ray.data.read_binary_files(path, include_paths=True)
    n_cols = len(column_names)

    def parse(batch: pa.Table) -> pa.Table:
        paths = batch["path"]
        if isinstance(paths, pa.ChunkedArray):
            paths = paths.combine_chunks()
        blobs = batch["bytes"]
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        tables = []
        for i in range(len(blobs)):
            recs = csv_split_records(blobs[i].as_py())
            cols = csv_parse_rows(recs, n_cols)
            tables.append(pa.table({
                "path": pa.array([paths[i].as_py()] * len(recs),
                                 pa.string()),
                **{c: v for c, v in zip(column_names, cols)},
            }))
        if not tables:
            return pa.table({
                "path": pa.array([], pa.string()),
                **{c: pa.array([], pa.string()) for c in column_names},
            })
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")
