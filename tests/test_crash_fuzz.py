"""Seeded crash-point fuzz for the snapshot-store commit protocol
(VERDICT r4 #6).

The lease/claim fixes are pinned at specific adjudicated
interleavings (test_round4_fixes, test_round5_fixes); this fuzz
generalizes: a merge is killed at a RANDOM durability boundary —
every os.fsync / os.rename / os.replace the store performs (meta
fsync, stage→snapshot rename, pointer fsync, pointer replace, reclaim
renames) — possibly AGAIN during the recovery replay, and recovery +
idempotent replay must always converge to the single-threaded oracle
state, with a readable manifest and monotonic snapshot ids at every
step.

Each seed draws its own batch contents (insert/patch/delete mix over
a small key space) AND its crash points, so ≥100 seeds cover ≥100
distinct (state, boundary) combinations.  A crashed orphan younger
than ORPHAN_LEASE_SEC conflicts by design; the harness backdates
orphans before replay — the documented retry-with-backoff protocol,
compressed in time.
"""

from __future__ import annotations

import os
import random

import pytest

from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import CommitConflictError, SnapshotStore

_FOLD_DDL = (
    "conv_id string, turn_idx int, kind string, "
    "role string, role_set boolean, text string, text_set boolean, "
    "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
    "last_lsn long, last_frame_seq long, n_changes long"
)

N_SEEDS = int(os.environ.get("PB3LD_CRASH_FUZZ_SEEDS", "100"))


class SimulatedCrash(Exception):
    pass


class Injector:
    """Counts durability events (fsync/rename/replace) inside the
    store module; raises SimulatedCrash BEFORE performing the chosen
    one — exactly the on-disk state a kill -9 at that boundary
    leaves."""

    def __init__(self):
        self.n = 0
        self.crash_at = None  # 1-based event index, None = run clean

    def _event(self):
        self.n += 1
        if self.crash_at is not None and self.n == self.crash_at:
            self.crash_at = None
            raise SimulatedCrash()

    def install(self):
        self._real = (os.fsync, os.rename, os.replace)
        real_fsync, real_rename, real_replace = self._real

        def fsync(fd):
            self._event()
            return real_fsync(fd)

        def rename(a, b, **kw):
            self._event()
            return real_rename(a, b, **kw)

        def replace(a, b, **kw):
            self._event()
            return real_replace(a, b, **kw)

        os.fsync, os.rename, os.replace = fsync, rename, replace

    def uninstall(self):
        os.fsync, os.rename, os.replace = self._real


def _gen_batches(rng: random.Random):
    """2-3 batches of (conv, turn, kind, text, lsn) over a small key
    space, lsn strictly increasing."""
    lsn = 0
    batches = []
    for _ in range(2):
        rows = []
        for _ in range(rng.randint(3, 5)):
            lsn += rng.randint(1, 3)
            conv = f"c{rng.randint(0, 3)}"
            turn = rng.randint(0, 2)
            kind = rng.choice(["REPLACE", "PATCH", "PATCH", "DELETE"])
            rows.append((conv, turn, kind, f"t{lsn}", lsn))
        batches.append(rows)
    return batches


def _oracle(batches):
    state: dict = {}
    for rows in batches:
        # the fold gives ONE action per key per batch: last change wins
        last = {}
        for conv, turn, kind, text, lsn in rows:
            last[(conv, turn)] = (kind, text, lsn)
        for key, (kind, text, lsn) in last.items():
            if kind == "DELETE":
                state.pop(key, None)
            else:
                state[key] = text
    return state


def _folded(spark, rows):
    # collapse to one action per key (mirrors the oracle's fold)
    last = {}
    for conv, turn, kind, text, lsn in rows:
        last[(conv, turn)] = (kind, text, lsn)
    data = [
        (c, t, k, None, False, txt, k != "DELETE", None, False,
         None, False, lsn, lsn, 1)
        for (c, t), (k, txt, lsn) in last.items()
    ]
    return spark.createDataFrame(data, _FOLD_DDL)


def _age_orphans(root):
    snaps = os.path.join(root, "snapshots")
    for d in os.listdir(snaps):
        p = os.path.join(snaps, d)
        old = os.stat(p).st_mtime - SnapshotStore.ORPHAN_LEASE_SEC - 5
        os.utime(p, (old, old))


def _check_invariants(spark, root):
    s = SnapshotStore(spark, root)  # manifest + meta must be readable
    assert s.snapshot_id >= 0
    return s


def _run_seed(spark, tmpdir_path, seed, mor=False):
    rng = random.Random(seed)
    batches = _gen_batches(rng)
    root = os.path.join(tmpdir_path, f"s{'m' if mor else ''}{seed}")
    SnapshotStore.create(
        spark, root, transcripts_schema(), num_buckets=1
    )
    inj = Injector()
    inj.install()
    try:
        crashes_left = rng.randint(1, 2)
        b = 0
        attempts = 0
        while b < len(batches):
            attempts += 1
            assert attempts < 40, "fuzz runaway"
            if crashes_left > 0 and rng.random() < 0.6:
                # events per merge ≈ 4 (meta fsync, rename, pointer
                # fsync+replace) + reclaim renames during recovery
                inj.crash_at = inj.n + rng.randint(1, 5)
                crashes_left -= 1
            store = _check_invariants(spark, root)
            hwm_lsn = max(r[4] for r in batches[b])
            apply = store.merge_mor if mor else store.merge
            try:
                apply(
                    _folded(spark, batches[b]), batch_id=b + 1,
                    hwm_override=(hwm_lsn, b + 1),
                )
            except SimulatedCrash:
                _age_orphans(root)
                continue  # "restart": reopen + replay same batch
            except CommitConflictError:
                _age_orphans(root)
                continue  # lease conflict from a crashed orphan: retry
            # watermark skip-check: a batch whose lsn ≤ hwm was already
            # applied pre-crash; merging it again must be idempotent
            b += 1
            if mor and rng.random() < 0.5:
                # compaction rides the same commit protocol — a crash
                # mid-compaction must leave the store readable with
                # the PRE-compaction snapshot intact (compaction moves
                # bytes, not state, so a skipped retry is harmless)
                if crashes_left > 0 and rng.random() < 0.5:
                    inj.crash_at = inj.n + rng.randint(1, 4)
                    crashes_left -= 1
                try:
                    _check_invariants(spark, root).compact()
                except (SimulatedCrash, CommitConflictError):
                    _age_orphans(root)
        inj.crash_at = None
        final = SnapshotStore(spark, root)
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in final.read_table().collect()
        }
        want = _oracle(batches)
        assert got == want, (seed, got, want)
        # no staging garbage is ever reachable from the manifest
        for rel in final._meta["files"].values():
            assert rel.startswith("snapshots"), rel
    finally:
        inj.uninstall()


@pytest.mark.parametrize("block", range(4))
def test_crash_fuzz_converges(spark, tmpdir_path, block):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        per = (N_SEEDS + 3) // 4
        for seed in range(block * per, min((block + 1) * per, N_SEEDS)):
            _run_seed(spark, tmpdir_path, seed)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("block", range(2))
def test_crash_fuzz_mor_converges(spark, tmpdir_path, block):
    """Same fuzz over the merge-on-read path: delta commits + random
    crashable compactions share the commit protocol, so recovery +
    replay must converge to the identical oracle state with the delta
    log resolving correctly across crash boundaries."""
    n = int(os.environ.get("PB3LD_CRASH_FUZZ_MOR_SEEDS", "40"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        per = (n + 1) // 2
        for seed in range(block * per, min((block + 1) * per, n)):
            _run_seed(spark, tmpdir_path, 1000 + seed, mor=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
