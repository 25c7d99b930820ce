"""Pluggable commit-claim seam — the LogStore.

Every snapshot commit in the manifest tier is serialized by ONE
primitive: atomically claim the next version slot
(``_manifests/v{N}.json``) such that exactly one of any number of
racing writers wins. Everything else in the protocol — delta bodies,
intent conflict checks, rebase-and-retry, settled reads — is built on
that single compare-and-swap.

Where the CAS comes from depends on where the log lives:

- **Local / POSIX filesystems** (and HDFS, NFSv4): exclusive create —
  ``open(O_CREAT|O_EXCL)`` — is atomic. :class:`LocalFSLogStore`.
- **Object stores**: S3 now supports conditional PUT
  (``If-None-Match: *``), GCS has ``x-goog-if-generation-match: 0``,
  Azure has ``If-None-Match: *`` — same shape: create-if-absent of
  the slot object. Stores (or deployments) without conditional
  writes need an EXTERNAL coordination table — the Delta-on-S3
  answer (DynamoDB LogStore): the CAS happens against the lock
  service, and the slot object is written only by the winner.
  :class:`ExternalCASLogStore` models exactly that split — the
  decision registry is separate from the file write — and doubles as
  the contended/chaos fake the concurrency suite injects.

The seam is intentionally tiny: ``claim(mdir, version) -> bool``.
True means the caller owns the slot exclusively and MUST publish the
manifest body into it; False means another writer owns it (the caller
re-reads the head and rebases or surfaces ConcurrentSnapshotError).
Claim errors (network faults against a lock service) propagate as
exceptions — an errored claim is NOT a lost claim; the caller must
not assume either outcome.

Post-claim visibility contract: after a True claim the slot file
exists on the filesystem (possibly still empty — readers settle on
the body via ``_read_manifest_settled``). ``ExternalCASLogStore`` can
DELAY that visibility (``defer_placeholder``) to model object-store
lag between the lock grant and the object landing; the protocol's
retry loop must tolerate re-listing a head that does not yet show the
winner's slot.

Reference parity note: the reference serializes writers through a
single MySQL connection (pipeline.py:246-259 — one transaction
commits both tables). The lakehouse tier reaches the same
exactly-one-winner guarantee through this seam at any writer count,
on any store that offers either exclusive-create or an external CAS.
"""

from __future__ import annotations

import os
import threading

__all__ = [
    "LogStore",
    "LocalFSLogStore",
    "ExternalCASLogStore",
    "ClaimUnavailableError",
]


def _slot_path(mdir: str, version: int) -> str:
    return os.path.join(mdir, f"v{version}.json")


class ClaimUnavailableError(RuntimeError):
    """The claim service could not answer — the attempt is neither won
    nor lost and the commit must surface the fault, not guess."""


class LogStore:
    """The commit-claim interface. Implementations must make
    ``claim`` an atomic exactly-one-winner CAS across every writer
    that can reach the table (threads, processes, hosts — whatever
    the store's scope is)."""

    def claim(self, mdir: str, version: int) -> bool:  # pragma: no cover
        raise NotImplementedError

    def publish_once(self, path: str, content: str) -> bool:
        """Atomically create ``path`` WITH ``content`` iff absent —
        the decision primitive for cross-table transaction markers,
        where the content (committed vs aborted) must be atomic with
        the creation: a reader may never observe an empty or torn
        marker. Returns True when this call created it. Object-store
        twin: conditional PUT with a body."""
        raise NotImplementedError  # pragma: no cover

    def release(self, mdir: str, version: int) -> None:
        """Recovery RECLAIMED the slot (its file was swept as a torn
        or aborted claim): stores whose CAS lives OUTSIDE the
        filesystem must forget the claim or the version number stays
        burned forever — a rerun recomputes the same next version,
        loses against the stale registry entry every retry, and
        exhausts the optimistic loop (found by the r11 txn soak).
        Filesystem-arbitrated stores need nothing: deleting the slot
        file IS the release. The Delta-on-DynamoDB analogue is
        deleting the lock-table item when its log entry is cleaned."""

    def describe(self) -> str:
        return type(self).__name__


class LocalFSLogStore(LogStore):
    """Exclusive-create claim — correct wherever the filesystem's
    create-new is atomic (local POSIX, HDFS, NFSv4+). The created
    empty file is simultaneously the CAS token and the slot
    placeholder that makes the version visible to listings."""

    def claim(self, mdir: str, version: int) -> bool:
        try:
            fd = os.open(
                _slot_path(mdir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        os.close(fd)
        return True

    def publish_once(self, path: str, content: str) -> bool:
        # write-then-link: os.link fails with EEXIST if the target
        # exists and is atomic on POSIX, so the marker appears with
        # its full content in one step — no empty-file window
        tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
        with open(tmp, "w") as fh:
            fh.write(content)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class ExternalCASLogStore(LogStore):
    """External-coordination claim: the CAS is an in-process registry
    insert (a stand-in for a DynamoDB conditional put / etcd txn /
    S3 ``If-None-Match`` PUT), and the slot placeholder is written
    NON-atomically afterwards — the filesystem is never the
    arbiter, exactly the object-store deployment shape.

    Doubles as the concurrency suite's chaos fake. Knobs:

    - ``before_claim``: callable(mdir, version) interposed INSIDE the
      claim, before the CAS — the race window. Tests park threads on
      a barrier here to force true duplicate-claim races, or run a
      competing writer to completion to force deterministic losses.
    - ``fail_next_claims``: the next N claim attempts raise
      ``ClaimUnavailableError`` (lock service unreachable). An error
      is neither a win nor a loss — callers must propagate.
    - ``defer_placeholder``: when True, winners do NOT create the
      slot file until :meth:`flush_placeholders` — object-store
      visibility lag. Listings meanwhile miss the claimed version,
      so racing writers recompute the same version, lose the CAS,
      and must spin/rebase without corrupting anything.
    - ``steal(mdir, version)``: claim a slot from outside any writer
      (a phantom winner that never publishes) — forces the settle /
      retry-exhaustion paths.

    Registry scope is this store instance (== one process). That is
    the fake's nature, not a protocol limit: the production twin is
    whatever service the deployment trusts for CAS.
    """

    def __init__(self, defer_placeholder: bool = False):
        self._lock = threading.Lock()
        self._claimed: set[tuple[str, int]] = set()
        self._pending: list[str] = []
        self.before_claim = None
        self.fail_next_claims = 0
        self.defer_placeholder = defer_placeholder
        self.claims_attempted = 0
        self.claims_won = 0

    def claim(self, mdir: str, version: int) -> bool:
        if self.before_claim is not None:
            self.before_claim(mdir, version)
        with self._lock:
            self.claims_attempted += 1
            if self.fail_next_claims > 0:
                self.fail_next_claims -= 1
                raise ClaimUnavailableError(
                    f"injected claim-service fault for v{version}"
                )
            key = (os.path.abspath(mdir), int(version))
            if key in self._claimed:
                return False
            # a slot file already on disk means a FOREIGN writer (one
            # not using this registry — e.g. the table's bootstrap
            # committed under LocalFS) owns the version; honoring it
            # keeps mixed-store histories safe
            if os.path.exists(_slot_path(mdir, version)):
                return False
            self._claimed.add(key)
            self.claims_won += 1
            placeholder = _slot_path(mdir, version)
            if self.defer_placeholder:
                self._pending.append(placeholder)
            else:
                self._touch(placeholder)
        return True

    @staticmethod
    def _touch(path: str) -> None:
        # plain create — deliberately NOT O_EXCL: the registry already
        # decided the winner; the file write is just publication
        with open(path, "a"):
            pass

    def flush_placeholders(self) -> int:
        """Materialize deferred winners' slot files (ends the modeled
        visibility lag). Returns how many were flushed."""
        with self._lock:
            pend, self._pending = self._pending, []
            for p in pend:
                self._touch(p)
            return len(pend)

    def steal(self, mdir: str, version: int) -> None:
        with self._lock:
            self._claimed.add((os.path.abspath(mdir), int(version)))

    def release(self, mdir: str, version: int) -> None:
        with self._lock:
            self._claimed.discard((os.path.abspath(mdir), int(version)))

    def publish_once(self, path: str, content: str) -> bool:
        """Registry-decided create-with-content: the CAS is the
        registry insert; the file write follows (winners only), same
        split as claim(). ``fail_next_claims`` applies here too —
        a marker decision against an unreachable lock service is an
        error, never a silent loss."""
        if self.before_claim is not None:
            self.before_claim(path, None)
        with self._lock:
            self.claims_attempted += 1
            if self.fail_next_claims > 0:
                self.fail_next_claims -= 1
                raise ClaimUnavailableError(
                    f"injected claim-service fault for marker {path}"
                )
            key = (os.path.abspath(path), -1)
            if key in self._claimed or os.path.exists(path):
                return False
            self._claimed.add(key)
            self.claims_won += 1
            with open(path, "w") as fh:
                fh.write(content)
        return True
