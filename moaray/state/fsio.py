"""Output-filesystem shim for the committed sinks.

The commit protocol is: write the data object, then write the manifest
object — the MANIFEST's existence is the commit marker, and partition
names are deterministic content keys, so retries rewrite the same names.
Atomicity requirements therefore differ by backend:

- **local POSIX**: a partially-written file is visible to readers, so
  every write goes tmp + ``os.replace`` (atomic rename) — the original
  protocol, byte-identical here.
- **object stores (s3://)**: a PUT is atomic (the key either exists with
  the full body or not at all) and rename does not exist; each write is
  a single ``open_output_stream`` PUT.

Either way a kill at any point leaves a fully-committed partition
(data + manifest) or an invisible orphan the deterministic retry
overwrites — the resume guarantees are backend-independent.

Paths: all helpers take/return FULL path strings ("/local/dir/x" or
"bucket/prefix/x" for remote). ``remote_sep`` joins with "/" on object
stores regardless of host OS.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class OutputFS:
    """Local-or-remote filesystem for one output root (see module doc)."""

    def __init__(self, root: str):
        from ..io import resolve_filesystem

        self.fs, self.root = resolve_filesystem(root)
        self.is_local = self.fs is None
        self._boto = None
        self._s3cfg = None
        if not self.is_local and root.startswith("s3://"):
            # capture connection config at DRIVER construction time (string
            # fields pickle into worker closures; worker env may be bare)
            env = os.environ
            self._s3cfg = {
                k: v for k, v in {
                    "endpoint_url": env.get("AWS_ENDPOINT_URL_S3")
                    or env.get("AWS_ENDPOINT_URL"),
                    "aws_access_key_id": env.get("AWS_ACCESS_KEY_ID"),
                    "aws_secret_access_key": env.get("AWS_SECRET_ACCESS_KEY"),
                    "aws_session_token": env.get("AWS_SESSION_TOKEN"),
                    "region_name": env.get("AWS_REGION")
                    or env.get("AWS_DEFAULT_REGION"),
                }.items() if v
            }

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_boto"] = None  # boto3 clients are not picklable; rebuilt lazily
        return d

    def _put_client(self):
        """boto3 S3 client for single-request PUTs, or None.

        The commit protocol wants ONE atomic request per object. pyarrow's
        ObjectOutputStream always runs a multipart upload (3+ requests,
        and aws-sdk-cpp misparses some S3-compatible servers' 200-with-
        body CompleteMultipartUpload responses); boto3's put_object is a
        single PUT, atomic on any S3 implementation. boto3 is optional —
        without it the pyarrow stream is the fallback."""
        if self._boto is None:
            if self._s3cfg is None:
                self._boto = False
            else:
                try:
                    import boto3

                    self._boto = boto3.client("s3", **self._s3cfg)
                except ImportError:
                    self._boto = False
        return self._boto or None

    # -- paths -----------------------------------------------------------
    def join(self, *parts: str) -> str:
        if self.is_local:
            return os.path.join(*parts)
        # keep the FIRST part's leading slash: fsspec-backed local/absolute
        # roots need it, s3 roots ("bucket/prefix") never have one
        first = parts[0].rstrip("/")
        rest = [p.strip("/") for p in parts[1:] if p]
        return "/".join([first] + rest)

    def normalize(self, path: str) -> str:
        """Canonical form for path comparisons (the winner tie-break):
        absolute locally; scheme-less, slash-trimmed remotely (Ray's
        include_paths reports object paths without the scheme)."""
        if self.is_local:
            return os.path.abspath(path)
        return path.split("://", 1)[-1].strip("/")

    # -- directories -----------------------------------------------------
    def makedirs(self, path: str) -> None:
        if self.is_local:
            os.makedirs(path, exist_ok=True)
            return
        # object stores have no directories — keys create their prefixes,
        # and create_dir would write a zero-byte "dir/" marker object that
        # then pollutes manifest listings. Generic pyarrow/fsspec backends
        # DO need parents to exist before open_output_stream.
        if self.fs.type_name in ("s3", "gcs", "abfs"):
            return
        try:
            self.fs.create_dir(path, recursive=True)
        except (OSError, NotImplementedError):
            pass

    def isdir(self, path: str) -> bool:
        if self.is_local:
            return os.path.isdir(path)
        from pyarrow import fs as pafs

        info = self.fs.get_file_info(path)
        if info.type == pafs.FileType.Directory:
            return True
        # an S3 "directory" exists iff some key lives under the prefix
        if info.type == pafs.FileType.NotFound:
            try:
                sel = pafs.FileSelector(path, recursive=False)
                return len(self.fs.get_file_info(sel)) > 0
            except (OSError, FileNotFoundError):
                return False
        return False

    def list_names(self, path: str) -> list[str]:
        """Base names of the files directly under ``path`` (empty when the
        directory/prefix does not exist)."""
        if self.is_local:
            if not os.path.isdir(path):
                return []
            return sorted(os.listdir(path))
        from pyarrow import fs as pafs

        try:
            sel = pafs.FileSelector(path, recursive=False)
            infos = self.fs.get_file_info(sel)
        except (OSError, FileNotFoundError):
            return []
        return sorted(i.path.rsplit("/", 1)[-1] for i in infos
                      if i.type == pafs.FileType.File)

    def rmtree(self, path: str) -> None:
        if self.is_local:
            import shutil

            if os.path.isdir(path):
                shutil.rmtree(path)
            return
        if self.isdir(path):
            self.fs.delete_dir_contents(path, missing_dir_ok=True)

    def remove(self, path: str) -> None:
        if self.is_local:
            os.remove(path)
        else:
            self.fs.delete_file(path)

    # -- atomic writes (see module doc) ------------------------------------
    def put_bytes(self, path: str, data: bytes) -> None:
        if self.is_local:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            return
        client = self._put_client()
        if client is not None:  # single-request PUT (see _put_client)
            bucket, key = path.split("/", 1)
            client.put_object(Bucket=bucket, Key=key, Body=data)
            return
        with self.fs.open_output_stream(path) as f:
            f.write(data)

    def put_json(self, path: str, obj) -> None:
        self.put_bytes(path, json.dumps(obj).encode())

    def put_table(self, path: str, table: pa.Table) -> int:
        """Write a parquet partition atomically; returns its byte size."""
        if self.is_local:
            tmp = path + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, path)
            return os.path.getsize(path)
        sink = pa.BufferOutputStream()
        pq.write_table(table, sink)
        buf = sink.getvalue()
        self.put_bytes(path, buf.to_pybytes())
        return buf.size

    # -- reads -------------------------------------------------------------
    def read_json(self, path: str):
        if self.is_local:
            with open(path) as f:
                return json.load(f)
        from pyarrow import fs as pafs

        info = self.fs.get_file_info(path)
        if info.type == pafs.FileType.NotFound:
            raise FileNotFoundError(path)
        with self.fs.open_input_stream(path) as f:
            return json.loads(f.read().decode())
