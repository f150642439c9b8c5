"""D5 + D6 + D7 — transactional bucketed snapshot store.

The production sink for this engine is an Iceberg table
(``MERGE INTO … ON t.conv_id=s.conv_id AND t.turn_idx=s.turn_idx``)
partitioned ``bucket(N, conv_id)``.  The sandbox has no Iceberg
runtime jar, so ``SnapshotStore`` implements the same contract with
the same mechanics Iceberg uses — copy-on-write MERGE over hash
buckets, snapshot manifests, atomic pointer swap — on plain parquet:

* data files live under ``snapshots/<id>/data/_bucket=K/``; a
  snapshot's manifest maps every bucket to a file directory, and
  **unaffected buckets are carried by reference** to the parent
  snapshot's files — a MERGE rewrites only the buckets its keys
  touch (Iceberg COW semantics; at 10^10 rows the per-batch write
  cost is proportional to touched buckets, not table size);
* the LSN high-watermark and per-bucket lineage (applied LSN range,
  row/upsert/delete counts) live **in the snapshot manifest**, so
  data + watermark + lineage commit in one atomic pointer swap
  (``os.replace``) — the exactly-once story (T4: the reference's
  fuzzer replays by dropping messages below a minimum LSN,
  ``tests/fuzzer/fuzzer.go:389-391``; our watermark generalizes that
  to crash-consistent resume);
* replaying any frame range against any snapshot is idempotent: the
  watermark filter drops already-applied frames, and the MERGE fold
  is last-write-wins per key.

Merge semantics per source row kind (from the D4 fold):

=========  =============================================================
DELETE     drop the target row (``WHEN MATCHED AND op='D' THEN DELETE``)
REPLACE    full row rebuild (INSERT barrier — new values win, columns
           absent since the barrier become NULL)
PATCH      partial update: only wire-present columns overwrite target
           values (TOAST omission, ``decoder/fsd.c:163-175``); missing
           target row → upsert with absent columns NULL
=========  =============================================================
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg_pb3_ld_spark.schema import TargetColumn, TargetSchema

MANIFEST = "manifest.json"


class CommitConflictError(RuntimeError):
    """Another writer committed a snapshot since this store instance
    loaded its base — the analog of Iceberg's CommitFailedException.
    The caller's protocol is the same as Iceberg's: ``refresh()`` to
    the new base and retry the merge (idempotent via the watermark)."""


class SnapshotStore:
    # A rename collision with a dir older than this lease is treated as
    # a crashed-commit orphan and reclaimed; younger dirs are presumed
    # to belong to an in-flight concurrent writer (post-rename,
    # pre-pointer-swap) and raise CommitConflictError instead.  Real
    # commits swap the pointer within milliseconds of the rename, so
    # 30 s is ~1000× the vulnerable window while keeping post-crash
    # replay latency bounded (retry with backoff clears it).
    ORPHAN_LEASE_SEC = 30.0

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._meta = self._load_meta()

    # ------------------------------------------------------------ setup

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: TargetSchema,
        num_buckets: int = 32,
        bucket_fn: str = "xxhash64",
        hot_split_rows: int = 0,
    ) -> "SnapshotStore":
        """``bucket_fn``: ``"xxhash64"`` (default — fastest, JVM-side)
        or ``"md5"`` (portable: the same bucket is computable in any
        engine with md5 + hex parsing, which is what lets an external
        system — or the DuckDB lineage oracle — independently verify
        per-bucket lineage).  Persisted in the table meta; all readers
        and writers derive buckets from it.

        ``hot_split_rows`` (0 = off): COW write-amplification guard for
        hot buckets — a bucket whose merged row count exceeds this
        threshold is written as ``_bucket=K/_sub=J`` sub-dirs, with J a
        deterministic hash of the FULL key (so one hot conv_id's turns
        spread across subs).  Reads union the subs transparently
        (recursive listing under the bucket dir); the bucket function —
        and therefore lineage, pruning, and the portable md5 oracle —
        is untouched.  At 10^10 events one storm bucket otherwise
        serializes the write path behind a single task."""
        if bucket_fn not in ("xxhash64", "md5"):
            raise ValueError(f"unknown bucket_fn {bucket_fn!r}")
        os.makedirs(os.path.join(root, "snapshots", "000000"), exist_ok=True)
        meta = {
            "snapshot_id": 0,
            "parent": None,
            "bucket_fn": bucket_fn,
            "table": schema.table,
            "columns": [
                {
                    "name": c.name,
                    "type_oid": c.type_oid,
                    "spark_type": c.spark_type,
                    "is_key": c.is_key,
                }
                for c in schema.columns
            ],
            "num_buckets": num_buckets,
            "hot_split_rows": int(hot_split_rows),
            "files": {},           # bucket -> dir relpath; absent = empty
            "hwm": {"lsn": -1, "frame_seq": -1},
            "lineage": {},
            "committed_at": time.time(),
        }
        cls._write_meta(root, meta)
        cls._swap_pointer(root, 0)
        return cls(spark, root)

    @staticmethod
    def _write_meta(root: str, meta: dict) -> None:
        snap_dir = os.path.join(root, "snapshots", f"{meta['snapshot_id']:06d}")
        os.makedirs(snap_dir, exist_ok=True)
        # fsync meta.json BEFORE the pointer swap publishes it: a power
        # loss right after the swap must never leave the manifest
        # pointing at a torn/empty meta.json (the commit protocol is
        # write data → write+fsync meta → fsync+rename pointer)
        with open(os.path.join(snap_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
            f.flush()
            os.fsync(f.fileno())

    @staticmethod
    def _swap_pointer(root: str, snapshot_id: int) -> None:
        tmp = os.path.join(root, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"snapshot": snapshot_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(root, MANIFEST))

    def _load_meta(self) -> dict:
        with open(os.path.join(self.root, MANIFEST)) as f:
            snap = json.load(f)["snapshot"]
        # belt-and-braces recovery: meta.json is fsynced before the
        # pointer swap, but if a snapshot's meta is GENUINELY torn or
        # missing (power loss on a non-ordering filesystem, manual
        # damage), fall back to the newest earlier snapshot with a
        # readable meta rather than bricking the table — replay from
        # the older watermark is idempotent by construction.
        # ONLY FileNotFoundError / JSONDecodeError trigger the
        # fallback: a transient OSError (EMFILE, EACCES, NFS hiccup)
        # on an intact meta must RAISE, or the silent regression to an
        # older snapshot would advance snapshot_id over a newer one on
        # the next merge and destroy committed state.
        skipped: list[int] = []
        for sid in range(snap, -1, -1):
            path = os.path.join(
                self.root, "snapshots", f"{sid:06d}", "meta.json"
            )
            try:
                with open(path) as f:
                    meta = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                skipped.append(sid)
                continue
            if skipped:
                import warnings

                warnings.warn(
                    f"snapshot meta recovery under {self.root!r}: "
                    f"skipped unreadable snapshot(s) {skipped}, "
                    f"recovered from snapshot {sid} — replay from its "
                    "watermark to converge",
                    RuntimeWarning,
                    stacklevel=2,
                )
            # remember the damaged pointer target: the next commit is
            # allowed to supersede it (it is NOT a concurrent writer)
            self._recovered_pointer = snap if skipped else None
            return meta
        raise RuntimeError(
            f"no readable snapshot meta under {self.root!r} "
            f"(manifest points at snapshot {snap})"
        )

    def refresh(self) -> None:
        self._meta = self._load_meta()

    # ------------------------------------------------------- properties

    @property
    def schema(self) -> TargetSchema:
        return TargetSchema(
            self._meta["table"],
            [
                TargetColumn(
                    c["name"], c["type_oid"], c["spark_type"], c["is_key"]
                )
                for c in self._meta["columns"]
            ],
        )

    @property
    def num_buckets(self) -> int:
        return self._meta["num_buckets"]

    @property
    def snapshot_id(self) -> int:
        return self._meta["snapshot_id"]

    def hwm(self) -> tuple[int, int]:
        """(lsn, frame_seq) high-watermark of applied frames."""
        return (self._meta["hwm"]["lsn"], self._meta["hwm"]["frame_seq"])

    def lineage(self) -> dict:
        return self._meta["lineage"]

    # ------------------------------------------------------------- read

    def bucket_expr(self, col: str = "conv_id") -> F.Column:
        if self._meta.get("bucket_fn") == "md5":
            # portable bucket: first 15 hex chars of md5 (60 bits,
            # always non-negative) mod N — reproducible in any engine
            return F.pmod(
                F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10)
                .cast("long"),
                F.lit(self.num_buckets),
            ).cast("int")
        # bucket(N, conv_id) — xxhash64 is seed-stable across sessions
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.num_buckets)).cast(
            "int"
        )

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current table state (optionally bucket-pruned) + ``_bucket``.

        ``_bucket`` is recomputed from ``conv_id`` (deterministic
        xxhash64), so data files stay partition-layout-agnostic.
        Files written under different snapshots may carry different
        column sets (additive evolution); the explicit schema fills
        missing columns with NULLs.
        """
        schema = self.schema
        files = self._meta["files"]
        sel = {
            int(b): path
            for b, path in files.items()
            if buckets is None or int(b) in buckets
        }
        key0 = schema.key_columns[0].name
        if not sel:
            df = self.spark.createDataFrame([], schema.ddl())
        else:
            paths = [os.path.join(self.root, p) for p in sel.values()]
            df = (
                self.spark.read.schema(schema.ddl())
                # explicit dirs, no partition inference on _bucket=K names
                .option("recursiveFileLookup", "true")
                .parquet(*paths)
            )
        return df.withColumn("_bucket", self.bucket_expr(key0))

    def read_table(self) -> DataFrame:
        return self.read().drop("_bucket")

    @staticmethod
    def _bucket_row_counts(data_dir: str) -> dict[int, int]:
        """Per-bucket row counts of a staged write from local parquet
        footers (metadata-only reads, no Spark job)."""
        import pyarrow.parquet as pq

        out: dict[int, int] = {}
        for d in os.listdir(data_dir):
            if not d.startswith("_bucket="):
                continue
            b = int(d.split("=")[1])
            n = 0
            for dirpath, _dirs, fns in os.walk(os.path.join(data_dir, d)):
                for fn in fns:
                    if fn.endswith(".parquet"):
                        n += (
                            pq.ParquetFile(os.path.join(dirpath, fn))
                            .metadata.num_rows
                        )
            out[b] = n
        return out

    def leaf_file_rows(self) -> dict[str, int]:
        """Rows per LEAF write-partition of the current snapshot —
        ``"K"`` for an unsplit bucket, ``"K/J"`` per sub of a
        hot-split one.  This is the write-task granularity the
        hot-split exists to bound; the bench records its spread."""
        import pyarrow.parquet as pq

        out: dict[str, int] = {}
        for b, rel in self._meta["files"].items():
            bdir = os.path.join(self.root, rel)
            subs = [
                d for d in os.listdir(bdir) if d.startswith("_sub=")
            ]
            targets = (
                {f"{b}/{d.split('=')[1]}": os.path.join(bdir, d)
                 for d in subs}
                if subs
                else {str(b): bdir}
            )
            for leaf, path in targets.items():
                n = 0
                for dirpath, _dirs, fns in os.walk(path):
                    for fn in fns:
                        if fn.endswith(".parquet"):
                            n += (
                                pq.ParquetFile(os.path.join(dirpath, fn))
                                .metadata.num_rows
                            )
                out[leaf] = n
        return out

    # ------------------------------------------------------------ evolve

    def evolved_schema(
        self, observed: list[tuple[int, str]] | list[tuple[str, int]]
    ) -> TargetSchema:
        """Additive evolution: unseen wire columns become new columns."""
        from pg_pb3_ld_spark.schema import OID_TO_SPARK

        schema = self.schema
        for name, oid in observed:
            if any(c.name == name for c in schema.columns):
                continue
            spark_type = OID_TO_SPARK.get(int(oid), "string")
            schema = schema.with_column(
                TargetColumn(name, int(oid), spark_type)
            )
        return schema

    # ------------------------------------------------------------ merge

    def merge(
        self,
        folded: DataFrame,
        schema: TargetSchema | None = None,
        batch_id: int | None = None,
        hwm_override: tuple[int, int] | None = None,
    ) -> dict:
        """Apply one folded change batch as a COW MERGE; commit a new
        snapshot atomically.  Returns the batch metrics dict.

        ``schema`` may be an evolved superset of the store schema
        (D7); the new snapshot records the evolved columns.
        """
        import time as _time

        schema = schema or self.schema
        keys = [c.name for c in schema.key_columns]
        vals = [c.name for c in schema.value_columns]
        _t: dict[str, float] = {}

        src = folded.withColumn("_bucket", self.bucket_expr(keys[0]))
        src = src.persist()
        stage_dir = None
        try:
            _t0 = _time.time()
            # batch stats: tiny agg (drives hwm + affected buckets)
            stats = src.groupBy("_bucket").agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("kind") == "DELETE", 1).otherwise(0)).alias("n_del"),
                F.sum("n_changes").alias("n_changes"),
                F.min("last_lsn").alias("lsn_min"),
                F.max("last_lsn").alias("lsn_max"),
                F.max("last_frame_seq").alias("frame_max"),
            ).collect()
            _t["stats"] = _time.time() - _t0
            if not stats:
                return {"applied_keys": 0, "skipped": True}
            affected = sorted(int(r["_bucket"]) for r in stats)

            tgt = self.read(buckets=affected)
            # align target to (possibly evolved) schema
            for c in schema.columns:
                if c.name not in tgt.columns:
                    tgt = tgt.withColumn(
                        c.name, F.lit(None).cast(c.spark_type)
                    )

            s = src.drop("_bucket").alias("s")
            t = tgt.drop("_bucket").alias("t")
            joined = t.join(s, on=keys, how="full_outer")
            no_src = F.col("s.kind").isNull()
            # recompute the bucket from the (coalesced) join key
            merged_cols = [self.bucket_expr(keys[0]).alias("_bucket")]
            for k in keys:
                merged_cols.append(F.col(k))
            for c in vals:
                merged_cols.append(
                    F.when(no_src, F.col(f"t.{c}"))
                    .when(F.col("s.kind") == "REPLACE", F.col(f"s.{c}"))
                    .when(
                        F.col(f"s.{c}_set"), F.col(f"s.{c}")
                    )  # PATCH, column present on the wire
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                )
            result = joined.where(
                no_src | (F.col("s.kind") != "DELETE")
            ).select(*merged_cols)

            # stage under a UNIQUE dir (Iceberg-style): concurrent
            # writers never collide on paths, so a failed/stale commit
            # can never clobber a committed snapshot's files.  The
            # snapshot id is claimed atomically at commit time by
            # renaming the staging dir into place.
            import uuid as _uuid

            new_id = self.snapshot_id + 1
            snap_rel = os.path.join("snapshots", f"{new_id:06d}")
            stage_rel = os.path.join("staging", _uuid.uuid4().hex)
            stage_dir = os.path.join(self.root, stage_rel)
            data_dir = os.path.join(stage_dir, "data")
            os.makedirs(data_dir)

            from pyspark.sql import Observation

            obs = Observation(f"merge_{new_id}")
            result = result.observe(
                obs,
                F.count(F.lit(1)).alias("rows_written"),
            )

            # Hot-bucket sub-splitting (write-amplification guard):
            # project each affected bucket's merged size as its last
            # known row count (lineage) plus this batch's keys; any
            # bucket over the threshold is spread across
            # ceil(projected / threshold) sub-partitions keyed by a
            # hash of the FULL key — one hot conv_id's turns split
            # across subs (a conv_id hash would keep them together).
            # The (bucket, n_sub) table rides a broadcast join, not a
            # literal map: per-batch literals in generated code force
            # serial Janino recompiles.
            hot_rows = int(self._meta.get("hot_split_rows", 0) or 0)
            lineage_prev = self._meta["lineage"]
            n_sub: dict[int, int] = {}
            for r in stats:
                b = int(r["_bucket"])
                projected = (
                    int(lineage_prev.get(str(b), {}).get("rows", 0))
                    + int(r["n_keys"])
                )
                n_sub[b] = (
                    min(32, -(-projected // hot_rows))
                    if hot_rows > 0 and projected > hot_rows
                    else 1
                )
            if any(v > 1 for v in n_sub.values()):
                nsub_df = F.broadcast(
                    self.spark.createDataFrame(
                        sorted(n_sub.items()), "_bucket int, _nsub int"
                    )
                )
                key_hash = F.xxhash64(*[F.col(k) for k in keys])
                result = (
                    result.join(nsub_df, "_bucket", "left")
                    .withColumn(
                        "_sub",
                        F.pmod(
                            key_hash, F.coalesce(F.col("_nsub"), F.lit(1))
                        ).cast("int"),
                    )
                    .drop("_nsub")
                )
                part_cols = [F.col("_bucket"), F.col("_sub")]
                write_parts = ["_bucket", "_sub"]
                total_parts = sum(n_sub.values())
            else:
                part_cols = [F.col("_bucket")]
                write_parts = ["_bucket"]
                total_parts = max(len(affected), 1)

            _t0 = _time.time()
            (
                result.repartition(total_parts, *part_cols)
                .sortWithinPartitions(*keys)
                .write.partitionBy(*write_parts)
                .mode("overwrite")
                .parquet(data_dir)
            )
            try:
                rows_written = obs.get["rows_written"]
            except Exception:
                # AQE's empty-relation propagation can eliminate the
                # CollectMetrics node when the merged result is empty
                # at runtime (e.g. a delete-all batch) — recount
                # exactly from the staged parquet footers instead
                rows_written = sum(
                    self._bucket_row_counts(data_dir).values()
                )
            _t["write"] = _time.time() - _t0

            # files map: affected buckets → new dirs; others inherited.
            # partitionBy writes _bucket=K dirs, but as a *partition*
            # column — rewrite relpaths and rely on read()'s explicit
            # schema, so re-inject _bucket as a data column by listing
            files = dict(self._meta["files"])
            # relpaths point at the FINAL (post-rename) location
            written = {
                int(d.split("=")[1]): os.path.join(snap_rel, "data", d)
                for d in os.listdir(data_dir)
                if d.startswith("_bucket=")
            }
            for b in affected:
                if b in written:
                    files[str(b)] = written[b]
                else:
                    files.pop(str(b), None)  # bucket emptied by deletes

            old_lsn, old_frame = self.hwm()
            if hwm_override is not None:
                batch_lsn, batch_frame = hwm_override
            else:
                batch_lsn = max(int(r["lsn_max"]) for r in stats)
                batch_frame = max(int(r["frame_max"]) for r in stats)
            # written rows per bucket from the staged parquet footers:
            # drives the NEXT merge's hot-split projection and the
            # lineage metrics.  Driver-side metadata reads only —
            # bounded by (affected buckets × files), no Spark job.
            bucket_rows = self._bucket_row_counts(data_dir)
            lineage = dict(self._meta["lineage"])
            for r in stats:
                b = int(r["_bucket"])
                ent = {
                    "last_batch": batch_id,
                    "keys": int(r["n_keys"]),
                    "deletes": int(r["n_del"]),
                    "changes": int(r["n_changes"]),
                    "lsn_range": [int(r["lsn_min"]), int(r["lsn_max"])],
                    "rows": int(bucket_rows.get(b, 0)),
                }
                if n_sub.get(b, 1) > 1:
                    ent["n_sub"] = n_sub[b]
                lineage[str(b)] = ent
            meta = {
                **self._meta,
                "snapshot_id": new_id,
                "parent": self.snapshot_id,
                "columns": [
                    {
                        "name": c.name,
                        "type_oid": c.type_oid,
                        "spark_type": c.spark_type,
                        "is_key": c.is_key,
                    }
                    for c in schema.columns
                ],
                "files": files,
                "hwm": {
                    "lsn": max(old_lsn, batch_lsn),
                    "frame_seq": max(old_frame, batch_frame),
                },
                "lineage": lineage,
                "committed_at": time.time(),
            }
            meta.pop("total_rows", None)
            # meta.json rides in the staging dir so data + watermark +
            # lineage arrive together in ONE atomic rename
            with open(os.path.join(stage_dir, "meta.json"), "w") as f:
                json.dump(meta, f, indent=1)
                f.flush()
                os.fsync(f.fileno())

            # Commit protocol (optimistic concurrency — the Iceberg
            # CommitFailedException analog):
            # 1. the commit is valid only against the base snapshot
            #    this merge read from — re-check the pointer;
            # 2. claim the snapshot id by ATOMICALLY renaming the
            #    staging dir into place (rename onto a non-empty dir
            #    fails, so two writers can never both own an id);
            # 3. publish via the fsynced pointer swap.
            # A rename collision is reclaimed ONLY when the dir is
            # provably dead: the recovered-over damaged snapshot, or an
            # orphan older than ORPHAN_LEASE_SEC.  Anything younger may
            # be a concurrent writer between ITS rename and pointer
            # swap, so the collision fails loudly instead.  The caller
            # refreshes and retries (idempotent via the watermark).
            def _pointer() -> int | None:
                try:
                    with open(os.path.join(self.root, MANIFEST)) as f:
                        return json.load(f)["snapshot"]
                except FileNotFoundError:
                    return None

            recovered = getattr(self, "_recovered_pointer", None)
            cur = _pointer()
            if cur != self.snapshot_id and cur != recovered:
                raise CommitConflictError(
                    f"concurrent commit detected: base snapshot "
                    f"{self.snapshot_id} but manifest now points at "
                    f"{cur} — refresh() and retry the merge"
                )
            snap_dir = os.path.join(self.root, snap_rel)
            try:
                os.rename(stage_dir, snap_dir)
            except OSError:
                cur = _pointer()
                if (
                    cur is not None and cur >= new_id
                    and cur != recovered
                ):
                    raise CommitConflictError(
                        f"concurrent commit detected: snapshot {new_id} "
                        f"already committed (manifest at {cur}) — "
                        "refresh() and retry the merge"
                    )
                # Reclaims must be MUTUALLY EXCLUSIVE: two writers can
                # both judge the same dir dead (both saw the recovered
                # pointer, or both aged the same orphan past the lease)
                # and a bare rmtree+rename would let the second rmtree
                # delete the first writer's fully-renamed snapshot
                # before its pointer swap — one merge silently lost
                # while both report success.  Claim the name first by
                # ATOMICALLY renaming the dead dir to a unique trash
                # name (os.rename raises for the loser), then rmtree
                # the trash at leisure.
                def _reclaim(expected_mtime: float | None = None) -> None:
                    import uuid as _uuid

                    trash = snap_dir + ".trash-" + _uuid.uuid4().hex
                    try:
                        os.rename(snap_dir, trash)
                    except OSError:
                        # another writer won the claim — conflict
                        raise CommitConflictError(
                            f"snapshot dir {new_id} reclaimed by a "
                            "concurrent writer — refresh() and retry "
                            "the merge"
                        )
                    if expected_mtime is not None:
                        # TOCTOU re-verify AFTER the claim: between
                        # this writer's staleness stat and its rename,
                        # another reclaimer may have completed its
                        # ENTIRE reclaim + stage-rename (+ pointer
                        # swap), making the name a LIVE snapshot — a
                        # different dir incarnation, detectable by its
                        # mtime differing from the one the staleness
                        # check saw.  Restore the stolen dir and
                        # conflict instead of destroying a committed
                        # merge.
                        try:
                            now_mtime = os.stat(trash).st_mtime
                        except OSError:
                            now_mtime = None
                        if now_mtime != expected_mtime:
                            try:
                                os.rename(trash, snap_dir)
                            except OSError:
                                pass  # name re-taken — trash kept for audit
                            raise CommitConflictError(
                                f"snapshot dir {new_id} was replaced by a "
                                "live commit during reclaim — refresh() "
                                "and retry the merge"
                            )
                    shutil.rmtree(trash, ignore_errors=True)
                    try:
                        os.rename(stage_dir, snap_dir)
                    except OSError:
                        # a concurrent writer renamed ITS snapshot into
                        # the freed name between our rmtree and rename
                        raise CommitConflictError(
                            f"snapshot dir {new_id} claimed by a "
                            "concurrent commit during reclaim — "
                            "refresh() and retry the merge"
                        )

                if recovered is not None and cur == recovered:
                    # damaged (recovered-over) snapshot: the pointer was
                    # rolled back past it at open time, so the dir is
                    # unreachable by every reader and owned by THIS
                    # writer's recovery — safe to reclaim the name.
                    _reclaim()
                else:
                    # The pointer not having advanced does NOT prove the
                    # colliding dir is a crashed orphan: a concurrent
                    # writer sits in exactly this state between its
                    # successful rename and its pointer swap — rmtree
                    # here would destroy its fully-written snapshot and
                    # silently lose its merge.  Only staleness can tell
                    # the two apart: reclaim only if the dir predates
                    # the commit lease; otherwise conflict and let the
                    # caller refresh() + retry (by then the in-flight
                    # writer has swapped the pointer, or a true orphan
                    # has aged past the lease).
                    try:
                        seen_mtime = os.stat(snap_dir).st_mtime
                        age = time.time() - seen_mtime
                    except OSError:
                        age = None  # dir vanished → live racing writer
                    if age is not None and age > self.ORPHAN_LEASE_SEC:
                        _reclaim(expected_mtime=seen_mtime)
                    else:
                        raise CommitConflictError(
                            f"snapshot dir {new_id} already claimed by "
                            "an in-flight commit (pointer not yet "
                            "swapped) — refresh() and retry the merge"
                        )
            self._swap_pointer(self.root, new_id)
            self._meta = meta
            self._recovered_pointer = None  # damage superseded

            return {
                "merge_phase_sec": {k: round(v, 2) for k, v in _t.items()},
                "snapshot_id": new_id,
                "applied_keys": int(sum(r["n_keys"] for r in stats)),
                "applied_changes": int(sum(r["n_changes"] for r in stats)),
                "deletes": int(sum(r["n_del"] for r in stats)),
                "buckets_rewritten": len(affected),
                "rows_written": int(rows_written),
                "hwm_lsn": meta["hwm"]["lsn"],
                "hwm_frame_seq": meta["hwm"]["frame_seq"],
            }
        finally:
            src.unpersist()
            # un-renamed staging (failed/conflicted commit) is garbage
            if stage_dir and os.path.exists(stage_dir):
                shutil.rmtree(stage_dir, ignore_errors=True)
