"""Small IO helpers shared by the query surface and bench."""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def read_parquet_clean(path, columns: list[str] | None = None):
    """read_parquet with the pandas schema metadata stripped AT THE SCAN.

    Pandas-written parquet carries a dict-valued b'pandas' schema metadata
    blob; Ray's schema-dedup hashing can't hash it and warns
    ("Failed to hash the schemas ...") on every reduce task (round-1 verdict
    cosmetic). Passing an explicit metadata-free schema (one footer peek)
    makes every block of the read clean — no extra pipeline stage."""
    import pyarrow.parquet as pq
    import ray

    f = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        f = files[0] if files else None
    schema = None
    if f is not None:
        try:
            schema = pq.ParquetFile(f).schema_arrow.remove_metadata()
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
        except Exception:
            schema = None
    return ray.data.read_parquet(path, columns=columns, schema=schema)
