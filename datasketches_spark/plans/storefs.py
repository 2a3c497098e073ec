"""Storage backends for the checkpoint store.

The commit *protocol* in ``checkpoints.py`` is object-store safe (immutable
data dirs + one atomic single-file manifest publish), but through round 2
its *implementation* was hard-wired to POSIX (`open`/`os.rename`/
`os.listdir`/`os.path.isdir`) — none of which exist on the S3/GCS venue a
100 TB run actually uses. This module narrows every storage touch to an
object-store-shaped interface:

    put(key, data)        atomic publish of ONE object (the only atomic op
                          the protocol ever needs — a PUT on S3/GCS)
    get(key)              object bytes, or None
    list(prefix)          keys under a prefix (S3 LIST)
    delete_prefix(prefix) best-effort bulk delete (GC of orphan data dirs)
    exists_prefix(prefix) any object under prefix? (LIST with limit 1)
    spark_path(key)       URI Spark's own reader/writer uses for the
                          parquet data under this key (Spark talks to the
                          store through Hadoop FS connectors, not this API)

There is deliberately NO rename, NO mkdir, NO isdir in the interface —
backends that cannot express those (every object store) implement the full
protocol, and the in-memory fake in tests proves the store logic never
needs them.

``LocalBackend`` maps the interface onto POSIX (its PUT is a same-dir
write-then-``os.replace``, the local equivalent of an atomic object PUT).
``MemoryBackend`` is the object-store fake: manifests/metrics live in a
dict of key → bytes; parquet data dirs delegate to a scratch directory on
disk only because a local SparkSession needs a real path to write files —
exactly as a real cluster's Spark writes parquet straight to the bucket
while the store's own metadata ops go through the object API.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid


class LocalBackend:
    """POSIX implementation. PUT = unique temp file + ``os.replace`` into
    place (atomic on one filesystem — the local stand-in for an object
    PUT)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def put(self, key: str, data: bytes) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except OSError:
            return None

    def list(self, prefix: str) -> list[str]:
        base = self._p(prefix)
        out = []
        for dirpath, _dirs, files in os.walk(base):
            rel_dir = os.path.relpath(dirpath, self.root)
            for f in files:
                out.append(os.path.join(rel_dir, f))
        return sorted(out)

    def delete_prefix(self, prefix: str) -> None:
        shutil.rmtree(self._p(prefix), ignore_errors=True)

    def exists_prefix(self, prefix: str) -> bool:
        return os.path.exists(self._p(prefix))

    def spark_path(self, key: str) -> str:
        return self._p(key)


class MemoryBackend:
    """In-memory fake object store. Keys are flat strings; "directories"
    exist only as key prefixes, as on S3. Parquet data written by Spark
    goes to a scratch dir (``spark_path``) — the fake's "bucket device" —
    but the store's own metadata never touches it except through this
    object API. ``ops`` records every call so tests can assert the store
    exercises nothing outside the PUT/GET/LIST protocol."""

    def __init__(self, scratch: str | None = None):
        self.objects: dict[str, bytes] = {}
        self.scratch = scratch or tempfile.mkdtemp(prefix="memstore-")
        self.ops: list[tuple[str, str]] = []

    def put(self, key: str, data: bytes) -> None:
        self.ops.append(("put", key))
        self.objects[key] = bytes(data)

    def get(self, key: str) -> bytes | None:
        self.ops.append(("get", key))
        return self.objects.get(key)

    def list(self, prefix: str) -> list[str]:
        self.ops.append(("list", prefix))
        pre = prefix.rstrip("/") + "/"
        keys = sorted(k for k in self.objects if k.startswith(pre) or k == prefix)
        # data dirs written by Spark surface as objects too, as they would
        # on a real bucket
        base = os.path.join(self.scratch, prefix)
        for dirpath, _dirs, files in os.walk(base):
            rel_dir = os.path.relpath(dirpath, self.scratch)
            keys.extend(os.path.join(rel_dir, f) for f in files)
        return sorted(set(keys))

    def delete_prefix(self, prefix: str) -> None:
        self.ops.append(("delete_prefix", prefix))
        pre = prefix.rstrip("/") + "/"
        for k in [k for k in self.objects if k.startswith(pre) or k == prefix]:
            del self.objects[k]
        shutil.rmtree(os.path.join(self.scratch, prefix), ignore_errors=True)

    def exists_prefix(self, prefix: str) -> bool:
        self.ops.append(("exists_prefix", prefix))
        pre = prefix.rstrip("/") + "/"
        if any(k.startswith(pre) or k == prefix for k in self.objects):
            return True
        return os.path.exists(os.path.join(self.scratch, prefix))

    def spark_path(self, key: str) -> str:
        return os.path.join(self.scratch, key)
