"""Cross-PROCESS concurrency soak: N=3 writers as separate OS
processes racing real optimistic commits, on BOTH claim stores.

The r11 soaks raced threads (shared GIL, shared page cache); this is
the axis they could not cover: independent interpreters, real fcntl
serialization, fsync-visibility and partial-read windows. Writers are
``multiprocessing`` children aligned on a Barrier; each runs a
random number of commits (pre-stated added_entries — metadata
commits, no Spark needed in children) with rebase-and-retry through
the store under test:

- even seeds: ``LocalFSLogStore`` (POSIX O_EXCL — the filesystem is
  the arbiter, already cross-process by nature);
- odd seeds:  ``SQLiteCASLogStore`` (r12 — external CAS arbitrated by
  SQLite's fcntl locks; the object-store deployment shape where the
  slot write is NOT the decision).

Per seed, the converged table must pin EXACTLY the union of every
writer's entries plus the seed, versions must be gapless with no
duplicate wins, and a recovery pass must be a no-op. The r12 commit
race already found one real bug this way (_update_latest_monotonic's
version-only tmp name); this soak keeps that class covered.

Usage: python scripts/process_soak.py [n_seeds]
"""

import multiprocessing as mp
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from data_pipeline_project_spark.sinks import manifest as M  # noqa: E402
from data_pipeline_project_spark.sinks.logstore import (  # noqa: E402
    LocalFSLogStore,
)
from data_pipeline_project_spark.sinks.logstore_sqlite import (  # noqa: E402
    SQLiteCASLogStore,
)

N_WRITERS = 3


def _intent():
    return {
        "op": "append",
        "removed": [],
        "dv_targets": [],
        "schema_change": False,
        "inserts_only": True,
    }


def _writer(table, store_kind, writer_id, n_commits, barrier, q):
    try:
        store = (
            SQLiteCASLogStore()
            if store_kind == "sqlite"
            else LocalFSLogStore()
        )
        M.set_log_store(store)
        barrier.wait(timeout=60)
        done = []
        for i in range(n_commits):
            base = M.committed_versions(table, resolve_in_doubt=True)[-1]
            m = M.commit_optimistic(
                table,
                added=[],
                removed=[],
                added_entries=[
                    {
                        "path": f"w{writer_id}-c{i}.parquet",
                        "bytes": 10 + i,
                        "rows": 1,
                    }
                ],
                intent=_intent(),
                base_version=base,
                max_retries=100,
            )
            done.append(m["version"])
        q.put(("ok", writer_id, done))
    except Exception:  # noqa: BLE001
        import traceback

        q.put(("err", writer_id, traceback.format_exc()))


def run_seed(seed: int, work: str) -> bool:
    rng = random.Random(seed)
    store_kind = "sqlite" if seed % 2 else "posix"
    table = os.path.join(work, f"t{seed}")
    os.makedirs(os.path.join(table, "_manifests"))
    prev = M.set_log_store(
        SQLiteCASLogStore() if store_kind == "sqlite" else LocalFSLogStore()
    )
    try:
        M.commit_optimistic(
            table,
            added=[],
            removed=[],
            added_entries=[{"path": "seed.parquet", "bytes": 1, "rows": 1}],
            intent=_intent(),
            base_version=0,
            allow_bootstrap=True,
        )
    finally:
        M.set_log_store(prev)

    counts = [rng.randrange(1, 5) for _ in range(N_WRITERS)]
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(N_WRITERS)
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_writer,
            args=(table, store_kind, w, counts[w], barrier, q),
        )
        for w in range(N_WRITERS)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)

    ok = all(r[0] == "ok" for r in results)
    detail = ""
    if not ok:
        detail = "; ".join(
            r[2].strip().split("\n")[-1] for r in results if r[0] == "err"
        )
    else:
        versions = sorted(v for r in results for v in r[2])
        want_versions = list(range(2, 2 + sum(counts)))
        final = M.read_manifest(
            os.path.join(table, "_manifests", "latest.json")
        )
        names = {f["path"] for f in final["files"]}
        want_names = {"seed.parquet"} | {
            f"w{w}-c{i}.parquet"
            for w in range(N_WRITERS)
            for i in range(counts[w])
        }
        prev = M.set_log_store(
            SQLiteCASLogStore()
            if store_kind == "sqlite"
            else LocalFSLogStore()
        )
        try:
            rec = M.recover_to_last_manifest(table)
        finally:
            M.set_log_store(prev)
        if versions != want_versions:
            ok, detail = False, f"versions {versions} != {want_versions}"
        elif names != want_names:
            ok, detail = False, f"file set diverged: {names ^ want_names}"
        elif rec.get("restored") or rec.get("quarantined"):
            ok, detail = False, f"recovery was not a no-op: {rec}"
    print(
        f"seed {seed} ({store_kind}, counts={counts}) -> "
        f"{'ok' if ok else 'FAIL ' + detail}"
    )
    shutil.rmtree(table, ignore_errors=True)
    return ok


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    work = tempfile.mkdtemp(prefix="process_soak_")
    failures = 0
    for seed in range(4000, 4000 + n_seeds):
        if not run_seed(seed, work):
            failures += 1
    print(f"\nprocess soak complete: {n_seeds} seeds, {failures} failure(s)")
    shutil.rmtree(work, ignore_errors=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
