"""End-to-end apply pipeline (SURVEY.md §3.4).

``raw frames → [hwm filter] → mapInArrow typed decode (D1+D2, ONE
pass) → persist → commit-watermark gate (D3) → per-key fold (D4,
map-side combining agg) → COW MERGE + lineage + watermark commit
(D5/D6) with additive schema evolution (D7)``.

Scale/action budget: the batch runs exactly TWO Spark actions over
decoded data —

1. fold + per-bucket stats on the folded (persisted, small) output —
   this action materializes the typed persist (so **the frame stream
   is decoded exactly once**), computes the commit watermark in-plan
   (broadcast subquery over the cache), and delivers every batch
   scalar the driver needs (commit ordinate, schema-evolution probe,
   frame density, commit count) through an Observation;
2. the COW MERGE write (row counts via ``observe``, no extra job).

Round 1 decoded every frame twice (a light summary pre-scan plus the
typed pass) and ran four actions; at 100 TB that second scan is the
largest avoidable cost in the engine, and the per-batch fixed costs
cap the measured N→4N scaling efficiency at small batch sizes.  The
plan persists the *narrow typed* rows (a few typed columns — far
smaller than the generic array-column shape); the watermark and the
``_x_names`` schema-evolution probe ride them.  A batch that actually
evolves the schema re-runs gate→fold from the cache with the new
columns derived by JVM expressions from the probe's raw wire values —
still one decode; only binary-form float4/float8 evolution pays a
re-decode (rare × rare).

Commit gating uses the producer's flush discipline (COMMIT always
flushes, transactions arrive serially in commit order —
``decoder/pg_pb3_ld.c:248-272``): everything ordered before the last
COMMIT of the batch is committed, so gating is a scalar comparison,
not a txn-id join.  Changes after the last COMMIT (an in-flight
transaction cut by the micro-batch boundary) are **held back**: the
caller persists those frames and re-feeds them with the next batch
(``pending_frames`` in the metrics / ``streaming.runner``).

The high-watermark filter runs on the *frame* table before decode —
cheapest possible exactly-once: replayed frames are dropped by a
pushdown-friendly ``lsn > hwm`` predicate against the parquet scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.operators.decode import decode_typed_changes
from pg_pb3_ld_spark.operators.fold import ORD_SHIFT, fold_changes
from pg_pb3_ld_spark.operators.txn import gate_by_commit_subquery
from pg_pb3_ld_spark.sinks.store import SnapshotStore

PROBE_COLS = ("_x_names", "_x_oids", "_x_values", "_x_nulls", "_x_formats")


class _SchemaEvolved(Exception):
    """Internal: unknown wire columns observed — redo with the
    evolved schema (probe columns carry the values, so the redo is a
    re-fold from the cache, not a re-decode)."""

    def __init__(self, names):
        self.names = names


@dataclass
class IngestPipeline:
    spark: SparkSession
    store: SnapshotStore
    config: EngineConfig = field(default_factory=EngineConfig)
    salt: int = 0                  # D8 explicit two-phase fold knob
    evolve_schema: bool = True     # D7
    profile: bool = False          # stamp per-phase wall times

    def apply_frames(
        self,
        frames_df: DataFrame,
        batch_id: int = 0,
        pending_out: str | None = None,
    ) -> dict:
        """Apply one batch of raw frames; returns metrics.

        Idempotent: frames at-or-below the store watermark are
        filtered out, so replaying any prefix/suffix of the stream
        (including the whole stream) converges to the same snapshot.

        ``pending_out``: directory to write held-back frames (the
        uncommitted tail) as parquet for the next micro-batch.
        """
        import time as _time

        hwm_lsn, hwm_frame = self.store.hwm()
        fresh = frames_df.where(
            (F.col("lsn") > hwm_lsn)
            | ((F.col("lsn") == hwm_lsn) & (F.col("frame_seq") > hwm_frame))
        )

        par = self.spark.sparkContext.defaultParallelism
        times: dict[str, float] = {}
        schema = self.store.schema

        # single-pass decode, TWO Spark actions total: the typed rows
        # are persisted; the commit watermark is computed in-plan
        # (broadcast subquery over the cache — its build job is the
        # cache's first materialization) and every batch scalar the
        # driver needs (commit ordinate, evolution probe, frame
        # density, commit count) arrives via an Observation riding the
        # merge's stats action — no separate summary action.
        typed_all = decode_typed_changes(
            fresh, schema, self.config, parallelism=par
        ).persist()
        try:
            t0 = _time.time()
            try:
                metrics, summary = self._merge_once(
                    typed_all, schema, batch_id, known_extra=frozenset()
                )
            except _SchemaEvolved as ev:
                # evolution batch: unknown wire columns appeared.  The
                # probe carries their raw wire values, so the evolved
                # columns are derived from the persisted typed rows
                # with JVM expressions — still exactly ONE decode; the
                # wasted first fold is the (rare) evolution batch's
                # price for the 2-action steady state.
                from pg_pb3_ld_spark.operators.project import (
                    can_project_from_probe,
                )

                evolved = self.store.evolved_schema(ev.names)
                new_cols = [
                    c for c in evolved.columns
                    if all(c.name != o.name for o in schema.columns)
                ]
                schema = evolved
                if not can_project_from_probe(new_cols, self.config):
                    # binary-float evolution: full re-decode (rare×rare)
                    typed_all.unpersist()
                    typed_all = decode_typed_changes(
                        fresh, schema, self.config, parallelism=par
                    ).persist()
                    new_cols = []
                metrics, summary = self._merge_once(
                    typed_all, schema, batch_id,
                    known_extra=frozenset(c.name for c in new_cols),
                    new_cols=new_cols,
                )
            times["merge"] = _time.time() - t0
        finally:
            typed_all.unpersist()

        # hold back the uncommitted tail for the next micro-batch
        n_pending = 0
        if pending_out is not None and self.config.commit_messages:
            from pyspark.sql import Observation

            commit_frame = summary.get("commit_frame")
            wm_frame = commit_frame if commit_frame is not None else hwm_frame
            obs = Observation(f"pending_{batch_id}")
            pending = fresh.where(F.col("frame_seq") > wm_frame).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            t0 = _time.time()
            pending.write.mode("overwrite").parquet(pending_out)
            n_pending = int(obs.get["n"])
            times["pending"] = _time.time() - t0
        metrics["pending_frames"] = n_pending

        if self.profile:
            metrics["phase_sec"] = {k: round(v, 2) for k, v in times.items()}
        return metrics

    def _merge_once(
        self,
        typed_all: DataFrame,
        schema,
        batch_id: int,
        known_extra: frozenset,
        new_cols: list | None = None,
    ) -> tuple[dict, dict]:
        """Build gate→fold→merge over the persisted typed rows; batch
        scalars ride an Observation through the merge's stats action.

        Raises ``_SchemaEvolved`` (before anything is written) when the
        probe reports wire columns beyond ``known_extra``.
        """
        from pyspark.sql import Observation

        from pg_pb3_ld_spark.operators.project import (
            project_evolved_from_probe,
        )

        is_commit = F.col("op") == "COMMIT"
        packed = (
            F.shiftleft(F.col("frame_seq"), ORD_SHIFT) + F.col("offset_idx")
        )
        obs = Observation(f"batch_{batch_id}_{len(known_extra)}")
        observed = typed_all.observe(
            obs,
            F.max(F.when(is_commit, packed)).alias("cpacked"),
            F.max(F.when(is_commit, F.col("lsn"))).alias("clsn"),
            F.sum(F.when(is_commit, 1).otherwise(0)).alias("nc"),
            F.sum(
                F.when(F.col("offset_idx") == 0, 1).otherwise(0)
            ).alias("nf"),
            F.min("frame_seq").alias("min_f"),
            F.max("frame_seq").alias("max_f"),
            # probe shipped as JSON strings: Observation rows can't
            # carry nested array<struct> values through toPyRow
            F.collect_set(
                F.to_json(
                    F.arrays_zip(
                        F.col("_x_names").alias("n"),
                        F.col("_x_oids").alias("o"),
                    )
                )
            ).alias("xprobe"),
        )
        data = observed.where(F.col("table_name") == schema.table)
        if new_cols:
            data = project_evolved_from_probe(data, new_cols)
        data = data.drop(*PROBE_COLS)
        gated = gate_by_commit_subquery(
            data, typed_all, has_commits=self.config.commit_messages
        )
        folded = fold_changes(gated, schema, salt=self.salt)

        summary: dict = {}

        def pre_write(stats):
            import json as _json

            try:
                vals = obs.get  # stats action done ⇒ metrics available
            except Exception:
                # an empty batch can collapse to a LocalRelation and
                # optimize the CollectMetrics node away, leaving a
                # schemaless metrics row — fall back to the standalone
                # summary aggregation (extra action, degenerate
                # batches only)
                from pg_pb3_ld_spark.operators.txn import (
                    batch_summary_typed,
                )

                s = batch_summary_typed(typed_all)
                co = s["commit_ord"]
                vals = {
                    "cpacked": (
                        (co[0] << ORD_SHIFT) + co[1] if co else None
                    ),
                    "clsn": co[2] if co else None,
                    "nc": s["n_commits"],
                    "nf": s["n_frames"],
                    "min_f": s["min_frame_seq"],
                    "max_f": s["max_frame_seq"],
                    "xprobe": [
                        _json.dumps([{"n": n, "o": o}])
                        for n, o in s["names"]
                    ],
                }
            names = {}
            for blob in vals["xprobe"] or []:
                for e in _json.loads(blob) or []:
                    if e.get("n") is not None:
                        names[e["n"]] = max(
                            int(e.get("o") or 0), names.get(e["n"], 0)
                        )
            summary.update(
                {
                    "names": list(names.items()),
                    "n_commits": int(vals["nc"] or 0),
                    "commit_frame": (
                        vals["cpacked"] >> ORD_SHIFT
                        if vals["cpacked"] is not None
                        else None
                    ),
                    "commit_lsn": vals["clsn"],
                    "n_frames": int(vals["nf"] or 0),
                    "min_frame_seq": vals["min_f"],
                    "max_frame_seq": vals["max_f"],
                }
            )
            # transport-order guard: the LSN watermark is only sound
            # under in-order delivery (Spark's file source orders by
            # mtime with arbitrary ties) — above-watermark frame_seqs
            # must be dense.  offset_idx==0 occurs exactly once per
            # decoded frame; runs BEFORE anything is written.
            if self.config.strict_frame_order and summary["n_frames"]:
                span = summary["max_frame_seq"] - summary["min_frame_seq"] + 1
                if summary["n_frames"] != span:
                    raise RuntimeError(
                        "out-of-order frame delivery: batch covers "
                        f"frame_seq [{summary['min_frame_seq']}, "
                        f"{summary['max_frame_seq']}] but holds only "
                        f"{summary['n_frames']} frames — the source must "
                        "deliver frames in LSN order (fix the "
                        "landing-zone ordering or disable "
                        "config.strict_frame_order)"
                    )
            unknown = [
                (n, o) for n, o in summary["names"] if n not in known_extra
            ]
            if self.evolve_schema and unknown and stats:
                raise _SchemaEvolved(summary["names"])
            # the applied watermark is the commit point, not the batch
            # max — held-back frames must stay above the hwm so they
            # re-apply with the next batch
            if self.config.commit_messages and summary["commit_frame"] is not None:
                return (summary["commit_lsn"], summary["commit_frame"])
            return None

        metrics = self.store.merge(
            folded, schema=schema, batch_id=batch_id, pre_write=pre_write
        )
        if metrics.get("skipped"):
            metrics.setdefault("applied_changes", 0)
        return metrics, summary
