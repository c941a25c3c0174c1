"""Document-table ingestion across the formats corpora actually arrive in.

``read_documents`` dispatches on extension: Parquet (the nominal fast
path, column-pruned at the scan), JSONL/NDJSON (the web-crawl delivery
format), and CSV — all returning the same (doc_id, text, ...) Dataset so
every text op downstream is format-agnostic. Gzip-compressed JSONL/CSV
work through Arrow's transparent codec handling.

No reference counterpart (moamosaic reads rasters only); completes the
S1 ingestion story for the text side the way sources/files.py does for
loose image files.
"""

from __future__ import annotations

import glob
import os


def _ext_of(path: str) -> str:
    base = path.rstrip("/").lower()
    if os.path.isdir(path):
        for pat in ("*.parquet", "*.jsonl", "*.jsonl.gz", "*.ndjson",
                    "*.json", "*.csv", "*.csv.gz"):
            if glob.glob(os.path.join(path, pat)):
                base = pat
                break
        else:
            raise ValueError(f"no ingestible files under {path}")
    for gz in (".gz",):
        if base.endswith(gz):
            base = base[: -len(gz)]
    return base.rsplit(".", 1)[-1]


def read_documents(path: str, columns: list[str] | None = None):
    """Dataset of document rows from parquet / jsonl / ndjson / csv
    (optionally .gz). ``columns`` prunes at the scan where the format
    supports it (parquet) and via select_columns otherwise."""
    import ray.data

    from ..io import read_parquet_clean

    ext = _ext_of(path)
    if ext == "parquet":
        return read_parquet_clean(path, columns=columns)
    if ext in ("jsonl", "ndjson", "json"):
        ds = ray.data.read_json(path)
    elif ext == "csv":
        ds = ray.data.read_csv(path)
    else:
        raise ValueError(f"unsupported document format {ext!r} at {path}")
    if columns:
        ds = ds.select_columns(columns)
    return ds
