r"""Storage seam for the commit path: the small set of primitives the
manifest/lock/view publish protocol needs, with a POSIX implementation
and a rename-free CAS implementation.

The reference commits its state to S3 (one JSON object re-written per
file, ``ejp_xml_pipeline/data_store/s3_data_service.py:26-39``) and its
data the same way; this engine's atomicity story was, until round 4,
POSIX-only (``tmp + fsync + os.replace``). ``os.replace`` does not
exist on object stores, so every metadata publish now goes through a
:class:`Store` whose contract is implementable on BOTH:

===================  =========================  =========================
primitive            POSIX (LocalFsStore)       object store mapping
===================  =========================  =========================
``get_bytes``        open+read                  GET
``put_atomic``       tmp + fsync + rename       PUT (a PUT is atomic at
                                                object granularity —
                                                readers see old or new
                                                bytes, never torn)
``put_if_absent``    ``O_CREAT|O_EXCL``         conditional PUT
                                                ``If-None-Match: *``
``replace_if_\       rename-to-unique +         conditional PUT
matches``            content check (single      ``If-Match: <etag read
                     winner)                    with the expected bytes>``
``delete`` /         unlink                     DELETE (conditional
``delete_if_\                                   DELETE / If-Match where
matches``                                       offered, else
                                                read-verify-delete)
``list_prefix``      listdir                    LIST prefix
===================  =========================  =========================

The commit protocol built on these (``checkpoint.commit_manifest``) is
rename-free end to end: the immutable per-version snapshot is the CAS
point (``put_if_absent`` — of N racing writers of v(N) exactly one
creates it), and the current pointer is published with
``replace_if_matches`` against the bytes read at CAS-check time, so a
zombie writer can never regress the pointer over a successor's commit.
Readers that want to avoid trusting the pointer entirely can resolve
"current" as ``max(list_versions())`` — snapshots are immutable and
content-complete.

Data-plane files (partition parquet, spill row groups) intentionally
stay plain-path writes: they are immutable and content-addressed by a
deterministic batch token, so on an object store a direct PUT of the
final name is already atomic and idempotent — the local ``tmp +
os.replace`` in the merge stage exists only so POSIX readers never
observe a half-written file, and is not part of this seam.
"""
from __future__ import annotations

import contextlib
import os
import threading
import uuid
from abc import ABC, abstractmethod


class InjectedFault(RuntimeError):
    """Raised by a fault-injecting store to simulate a writer crash
    mid-protocol (process death between two storage operations)."""


class Store(ABC):
    """Byte-blob store with the conditional-write primitives the commit
    protocol needs. Paths are opaque ``/``-separated keys (the local
    implementation maps them to filesystem paths verbatim)."""

    @abstractmethod
    def get_bytes(self, path: str) -> bytes:
        """Read a blob; raises FileNotFoundError when absent."""

    @abstractmethod
    def put_atomic(self, path: str, data: bytes) -> None:
        """Publish a blob atomically: a concurrent reader sees the old
        bytes or the new bytes, never a torn mix."""

    @abstractmethod
    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Create-if-absent (the CAS acquire). True = we created it;
        False = it already existed (unchanged)."""

    @abstractmethod
    def replace_if_matches(self, path: str, expected: bytes, data: bytes) -> bool:
        """Atomic conditional swap: publish ``data`` iff the current
        content is exactly ``expected``. True = swapped; False = the
        content moved (or vanished) — the caller lost the race."""

    @abstractmethod
    def delete(self, path: str) -> bool:
        """Best-effort delete. True = removed; False = was absent."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def list_prefix(self, prefix: str) -> list[str]:
        """Keys under a directory-like prefix (non-recursive), sorted."""

    def delete_if_matches(self, path: str, expected: bytes) -> bool:
        """Delete iff the current content matches (lock release without
        stomping a successor). Default: read-verify-delete — races are
        tolerated by callers (fencing checks backstop them)."""
        try:
            if self.get_bytes(path) != expected:
                return False
        except FileNotFoundError:
            return False
        return self.delete(path)

    def size(self, path: str) -> int:
        """Blob size in bytes; FileNotFoundError when absent. Default:
        full read (backends override with a HEAD/stat)."""
        return len(self.get_bytes(path))


class LocalFsStore(Store):
    """POSIX implementation — the default for every lake path in this
    sandbox (and for any shared-filesystem deployment)."""

    def get_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def put_atomic(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return True

    def replace_if_matches(self, path: str, expected: bytes, data: bytes) -> bool:
        # single-winner without flock: rename the blob to a unique name
        # (of N racers exactly one rename succeeds), verify the content
        # we captured, publish the replacement, or restore on mismatch.
        claimed = f"{path}.swap-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(path, claimed)
        except FileNotFoundError:
            return False
        try:
            with open(claimed, "rb") as f:
                got = f.read()
        except FileNotFoundError:  # pragma: no cover — we own `claimed`
            return False
        if got != expected:
            # content moved under us: restore unless someone already
            # re-created the path (then their version wins)
            if not os.path.exists(path):
                with contextlib.suppress(OSError):
                    os.rename(claimed, path)
                    return False
            with contextlib.suppress(FileNotFoundError):
                os.remove(claimed)
            return False
        self.put_atomic(path, data)
        with contextlib.suppress(FileNotFoundError):
            os.remove(claimed)
        return True

    def delete(self, path: str) -> bool:
        try:
            os.remove(path)
            return True
        except FileNotFoundError:
            return False

    def delete_if_matches(self, path: str, expected: bytes) -> bool:
        # ATOMIC single-winner (unlike the base read-verify-delete):
        # rename-claim the blob, verify the claimed content, then remove
        # it — a concurrent writer's fresh blob is restored, never
        # deleted. Required by the writer-lock's stale-lease break: a
        # non-atomic delete could remove a LIVE successor's lock.
        claimed = f"{path}.del-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(path, claimed)
        except FileNotFoundError:
            return False
        try:
            with open(claimed, "rb") as f:
                got = f.read()
        except FileNotFoundError:  # pragma: no cover — we own `claimed`
            return False
        if got != expected:
            if not os.path.exists(path):
                with contextlib.suppress(OSError):
                    os.rename(claimed, path)
                    return False
            with contextlib.suppress(FileNotFoundError):
                os.remove(claimed)
            return False
        with contextlib.suppress(FileNotFoundError):
            os.remove(claimed)
        return True

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_prefix(self, prefix: str) -> list[str]:
        if not os.path.isdir(prefix):
            return []
        return sorted(os.path.join(prefix, n) for n in os.listdir(prefix))

    def size(self, path: str) -> int:
        return os.path.getsize(path)


class InMemoryCASStore(Store):
    """Rename-free fake object store: every mutation is a dict swap
    under one lock (the moral equivalent of S3 conditional PUT/DELETE —
    ``If-None-Match: *`` / ``If-Match: <etag>``). There is deliberately
    NO rename primitive, so any protocol that passes against this store
    is proven not to depend on POSIX rename.

    ``fail_after(n)`` injects a crash: the (n+1)-th MUTATING operation
    raises :class:`InjectedFault` *before* applying, simulating a writer
    process dying between two storage calls."""

    def __init__(self) -> None:
        self._blobs: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self._fail_after: int | None = None
        self.mutations = 0

    def fail_after(self, n: int | None) -> None:
        with self._lock:
            self._fail_after = n
            self.mutations = 0

    def _tick(self) -> None:
        if self._fail_after is not None and self.mutations >= self._fail_after:
            raise InjectedFault(
                f"injected crash after {self.mutations} mutations"
            )
        self.mutations += 1

    def get_bytes(self, path: str) -> bytes:
        with self._lock:
            if path not in self._blobs:
                raise FileNotFoundError(path)
            return self._blobs[path]

    def put_atomic(self, path: str, data: bytes) -> None:
        with self._lock:
            self._tick()
            self._blobs[path] = data

    def put_if_absent(self, path: str, data: bytes) -> bool:
        with self._lock:
            self._tick()
            if path in self._blobs:
                return False
            self._blobs[path] = data
            return True

    def replace_if_matches(self, path: str, expected: bytes, data: bytes) -> bool:
        with self._lock:
            self._tick()
            if self._blobs.get(path) != expected:
                return False
            self._blobs[path] = data
            return True

    def delete(self, path: str) -> bool:
        with self._lock:
            self._tick()
            return self._blobs.pop(path, None) is not None

    def delete_if_matches(self, path: str, expected: bytes) -> bool:
        # atomic compare-and-delete under the single lock (conditional
        # DELETE / If-Match) — the base class's read-verify-delete is
        # two operations and would let a racer's fresh blob be deleted
        with self._lock:
            self._tick()
            if self._blobs.get(path) != expected:
                return False
            del self._blobs[path]
            return True

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._blobs

    def list_prefix(self, prefix: str) -> list[str]:
        pre = prefix.rstrip("/") + "/"
        with self._lock:
            return sorted(
                p for p in self._blobs
                if p.startswith(pre) and "/" not in p[len(pre):]
            )


#: process-wide default — every existing call site that does not pass a
#: store keeps its exact POSIX behavior
LOCAL_STORE = LocalFsStore()

_RAY_OBJECT_STORE = None


def resolve_store(path: str) -> Store:
    """Route a lake path to its storage backend by URL scheme:
    ``objstore://<store>/<key>`` -> the Ray-actor bucket emulator
    (:mod:`.objstore` — the S3-semantics backend), anything else ->
    :data:`LOCAL_STORE`. Every metadata call site resolves through
    here, so pointing ``lake_dir`` at a store URL moves the WHOLE
    commit protocol onto the object store with no other change."""
    if isinstance(path, str) and path.startswith("objstore://"):
        global _RAY_OBJECT_STORE
        if _RAY_OBJECT_STORE is None:
            from .objstore import RayObjectStore

            _RAY_OBJECT_STORE = RayObjectStore()
        return _RAY_OBJECT_STORE
    return LOCAL_STORE
