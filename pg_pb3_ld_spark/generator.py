"""Deterministic synthetic transcripts CDC stream generator + oracle.

Sandbox stand-in for the reference producer: emits byte-exact
pg_pb3_ld frames over the transcripts schema, shaped like the
reference's fuzzer workload (``tests/fuzzer/fuzzy.go:72-89``:
multi-op transactions, NULL sprinkling) plus the apply-side stress
patterns the north rule demands:

* multi-change transactions and **empty** transactions;
* **partial-column UPDATEs** (TOAST omission semantics,
  ``decoder/fsd.c:163-175`` — absent ≠ NULL);
* DELETEs by replica-identity key (``pg_pb3_ld.c:388-411``);
* **hot-key skew**: one conv_id carries ~hot_fraction of all events;
* **additive schema evolution**: a new wire column (``model``)
  appears mid-stream;
* optional **duplicate frame replays** (for exactly-once tests) —
  the reference's own replay idiom re-sends whole frames and relies
  on LSN filtering (``tests/fuzzer/fuzzer.go:389-391``).

Also provides ``apply_oracle``: a single-threaded Python reference
apply (the analog of the fuzzer's client-side ExpectedMessages,
``tests/fuzzer/operations.go:57-88``) used as the correctness oracle
for the Spark pipeline's final table state.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field

import numpy as np

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.pb3.encoder import (
    FieldValue,
    WireBatcher,
    encode_delete,
    encode_field_set,
    encode_insert,
    encode_table,
    encode_update,
)
from pg_pb3_ld_spark.pb3.pgtypes import encode_value
from pg_pb3_ld_spark.schema import TargetSchema, transcripts_schema

_EPOCH = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "python", "browser", None, None]
_WORDS = (
    "spark shuffle merge upsert lsn frame decode batch arrow pandas "
    "conversation turn transcript agent tool call reply stream commit"
).split()


@dataclass
class GeneratedStream:
    """Frames plus everything a test needs to check the apply."""

    frames: list[tuple[int, int, bytes]]        # (frame_seq, lsn, frame)
    oracle: dict[tuple[str, int], dict]         # expected final rows
    schema: TargetSchema
    n_changes: int
    n_txns: int


def _text_for(rng: np.random.Generator, conv: str, turn: int, version: int) -> str:
    n = int(rng.integers(4, 24))
    words = [_WORDS[int(rng.integers(len(_WORDS)))] for _ in range(n)]
    return f"[{conv}#{turn} v{version}] " + " ".join(words)


def generate_stream(
    seed: int = 42,
    n_convs: int = 50,
    max_turns: int = 20,
    n_extra_txns: int = 200,
    config: EngineConfig | None = None,
    hot_fraction: float = 0.3,
    evolve_at: float = 0.6,
    empty_txn_every: int = 17,
    binary_values: bool = True,
    conv_prefix: str = "conv",
    key_move_prob: float = 0.0,
) -> GeneratedStream:
    """Deterministic CDC stream over the transcripts table.

    Phase 1 INSERTs conversations turn by turn (multi-change txns);
    phase 2 issues UPDATE/DELETE/INSERT mixes; after ``evolve_at`` of
    phase 2, new rows carry an extra ``model`` column.  ``seed`` fixes
    everything, so two calls produce byte-identical frames (needed for
    replay/exactly-once tests and bench determinism).
    """
    cfg = config or EngineConfig(
        type_oids_mode="omit_nulls",
        formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    # mixed wire forms on purpose (like fuzzer.go:236-240): turn_idx
    # (int4=23) and ts (timestamptz=1184) ride binary send form,
    # conv_id/role/text/tool (text=25) stay in text output form
    rng = np.random.default_rng(seed)
    schema = transcripts_schema()
    batcher = WireBatcher(cfg)
    td = encode_table("public", "transcripts", table_oid=51234)

    oracle: dict[tuple[str, int], dict] = {}
    turn_counts: dict[str, int] = {}
    n_changes = 0
    n_txns = 0

    conv_ids = [f"{conv_prefix}-{i:05d}" for i in range(n_convs)]
    hot = conv_ids[0]

    def fv(name: str, value, oid: int) -> FieldValue:
        if value is None:
            return FieldValue(name, None, oid)
        binary = binary_values and cfg.binary_output_for(oid)
        return FieldValue(
            name, encode_value(value, oid, binary), oid, is_binary=binary
        )

    def pick_conv() -> str:
        if rng.random() < hot_fraction:
            return hot
        return conv_ids[int(rng.integers(len(conv_ids)))]

    def row_fields(conv: str, turn: int, version: int, with_model: bool):
        ts = _EPOCH + datetime.timedelta(
            seconds=int(rng.integers(0, 10_000_000))
        )
        role = _ROLES[int(rng.integers(len(_ROLES)))]
        tool = _TOOLS[int(rng.integers(len(_TOOLS)))]
        row = {
            "conv_id": conv,
            "turn_idx": turn,
            "role": role,
            "text": _text_for(rng, conv, turn, version),
            "tool": tool,
            "ts": ts,
        }
        if with_model:
            row["model"] = f"model-{int(rng.integers(4))}"
        return row

    def emit_insert(row: dict):
        nonlocal n_changes
        cols = [
            fv("conv_id", row["conv_id"], wire.OID_TEXT),
            fv("turn_idx", row["turn_idx"], wire.OID_INT4),
            fv("role", row["role"], wire.OID_TEXT),
            fv("text", row["text"], wire.OID_TEXT),
            fv("tool", row["tool"], wire.OID_TEXT),
            fv("ts", row["ts"], wire.OID_TIMESTAMPTZ),
        ]
        if "model" in row:
            cols.append(fv("model", row["model"], wire.OID_TEXT))
        body = encode_insert(
            td, encode_field_set(cols, cfg.type_oids_mode, cfg.formats_mode)
        )
        batcher.change(wire.WMSG_INSERT, body)
        # oracle: INSERT replaces the row wholesale
        full = {c.name: None for c in schema.columns}
        full.update(row)
        oracle[(row["conv_id"], row["turn_idx"])] = full
        n_changes += 1

    def emit_update(conv: str, turn: int, patch: dict):
        nonlocal n_changes
        key = [
            fv("conv_id", conv, wire.OID_TEXT),
            fv("turn_idx", turn, wire.OID_INT4),
        ]
        # partial-column update: only patched columns appear on the
        # wire (TOAST omission semantics) — key columns always present
        # in new_values (fsd_populate_from_tuple projects all logged
        # columns; unchanged TOASTed ones drop out)
        oid_of = {c.name: c.type_oid for c in schema.columns}
        oid_of["model"] = wire.OID_TEXT
        cols = key + [fv(k, v, oid_of[k]) for k, v in patch.items()]
        body = encode_update(
            td,
            encode_field_set(
                [c for c in key], cfg.type_oids_mode, cfg.formats_mode
            ),
            encode_field_set(cols, cfg.type_oids_mode, cfg.formats_mode),
        )
        batcher.change(wire.WMSG_UPDATE, body)
        row = oracle.get((conv, turn))
        if row is not None:
            row.update(patch)
        else:
            # upsert semantics for updates to missing rows
            row = {c.name: None for c in schema.columns}
            row.update({"conv_id": conv, "turn_idx": turn})
            row.update(patch)
            oracle[(conv, turn)] = row
        n_changes += 1

    def emit_move(conv: str, old_turn: int, new_turn: int, evolved: bool):
        """Key-changing UPDATE: key_fields carry the OLD key, the new
        tuple carries the NEW key (pg_pb3_ld.c:370-380 — the
        replica-identity projection reads the old tuple).  The engine
        splits it into DELETE(old)+INSERT(new); a full new tuple is
        logged, so the oracle row moves wholesale."""
        nonlocal n_changes
        key = [
            fv("conv_id", conv, wire.OID_TEXT),
            fv("turn_idx", old_turn, wire.OID_INT4),
        ]
        row = row_fields(conv, new_turn, version=0, with_model=evolved)
        oid_of = {c.name: c.type_oid for c in schema.columns}
        oid_of["model"] = wire.OID_TEXT
        cols = [fv(k, v, oid_of[k]) for k, v in row.items()]
        body = encode_update(
            td,
            encode_field_set(key, cfg.type_oids_mode, cfg.formats_mode),
            encode_field_set(cols, cfg.type_oids_mode, cfg.formats_mode),
        )
        batcher.change(wire.WMSG_UPDATE, body)
        oracle.pop((conv, old_turn), None)
        full = {c.name: None for c in schema.columns}
        full.update(row)
        oracle[(conv, new_turn)] = full
        n_changes += 1

    def emit_delete(conv: str, turn: int):
        nonlocal n_changes
        body = encode_delete(
            td,
            encode_field_set(
                [
                    fv("conv_id", conv, wire.OID_TEXT),
                    fv("turn_idx", turn, wire.OID_INT4),
                ],
                cfg.type_oids_mode,
                cfg.formats_mode,
            ),
        )
        batcher.change(wire.WMSG_DELETE, body)
        oracle.pop((conv, turn), None)
        n_changes += 1

    # live keys per conv — a valid WAL stream only UPDATEs/DELETEs
    # rows that exist (PostgreSQL guarantees it; the fold's
    # INSERT/DELETE barrier semantics rely on it)
    alive: dict[str, list[int]] = {}
    dead: dict[str, list[int]] = {}

    # ---- phase 1: conversations grow turn by turn ----
    for conv in conv_ids:
        n_turns = int(rng.integers(2, max_turns + 1))
        turn_counts[conv] = n_turns
        alive[conv] = list(range(n_turns))
        dead[conv] = []
        for start in range(0, n_turns, 4):
            batcher.begin_txn()
            for turn in range(start, min(start + 4, n_turns)):
                emit_insert(row_fields(conv, turn, version=0, with_model=False))
            batcher.commit_txn()
            n_txns += 1

    # ---- phase 2: mixed update/delete/insert traffic with skew ----
    for i in range(n_extra_txns):
        evolved = i >= int(n_extra_txns * evolve_at)
        if empty_txn_every and i % empty_txn_every == 0:
            # empty transaction: begin+commit, no changes
            batcher.begin_txn()
            batcher.commit_txn()
            n_txns += 1
            continue
        batcher.begin_txn()
        for _ in range(int(rng.integers(1, 8))):
            conv = pick_conv()
            live = alive[conv]
            r = rng.random()
            if r < 0.55 and live:
                turn = live[int(rng.integers(len(live)))]
                patch = {}
                if rng.random() < 0.8:
                    patch["text"] = _text_for(rng, conv, turn, version=i + 1)
                if rng.random() < 0.3:
                    patch["tool"] = _TOOLS[int(rng.integers(len(_TOOLS) - 1))]
                if rng.random() < 0.15:
                    patch["role"] = _ROLES[int(rng.integers(len(_ROLES)))]
                if evolved and rng.random() < 0.5:
                    patch["model"] = f"model-{int(rng.integers(4))}"
                if not patch:
                    patch["text"] = _text_for(rng, conv, turn, version=i + 1)
                emit_update(conv, turn, patch)
            elif key_move_prob and r < 0.55 + key_move_prob and live:
                # key-changing UPDATE: move a live row to a fresh turn
                old_turn = live.pop(int(rng.integers(len(live))))
                new_turn = turn_counts[conv]
                turn_counts[conv] += 1
                live.append(new_turn)
                dead[conv].append(old_turn)
                emit_move(conv, old_turn, new_turn, evolved)
            elif r < 0.7 and live:
                turn = live.pop(int(rng.integers(len(live))))
                dead[conv].append(turn)
                emit_delete(conv, turn)
            else:
                if dead[conv] and rng.random() < 0.3:
                    turn = dead[conv].pop(int(rng.integers(len(dead[conv]))))
                else:
                    turn = turn_counts[conv]
                    turn_counts[conv] += 1
                live.append(turn)
                emit_insert(
                    row_fields(conv, turn, version=i + 1, with_model=evolved)
                )
        batcher.commit_txn()
        n_txns += 1

    frames = [
        (seq, lsn, frame)
        for seq, (lsn, frame) in enumerate(batcher.frames())
    ]
    # evolved rows make 'model' part of the expected final schema
    if any("model" in r for r in oracle.values()):
        from pg_pb3_ld_spark.schema import TargetColumn

        schema = schema.with_column(
            TargetColumn("model", wire.OID_TEXT, "string")
        )
        for r in oracle.values():
            r.setdefault("model", None)
    return GeneratedStream(frames, oracle, schema, n_changes, n_txns)


def _gen_shard(args: tuple) -> GeneratedStream:
    shard, kwargs = args
    return generate_stream(
        seed=kwargs.pop("seed", 42) + shard * 1009,
        conv_prefix=f"c{shard:02d}",
        **kwargs,
    )


def generate_stream_sharded(
    n_shards: int = 8, seed: int = 42, **kwargs
) -> GeneratedStream:
    """Parallel generation: shards own disjoint conv-id spaces, their
    frame sequences are concatenated with re-based frame_seq/LSN
    (conversation interleaving across shards isn't needed — different
    convs never share keys, so apply semantics are unaffected)."""
    import multiprocessing as mp

    jobs = [(s, {"seed": seed, **kwargs}) for s in range(n_shards)]
    if n_shards <= 1:
        shards = [_gen_shard(jobs[0])]
    else:
        with mp.Pool(min(n_shards, mp.cpu_count())) as pool:
            shards = pool.map(_gen_shard, jobs)
    frames: list[tuple[int, int, bytes]] = []
    oracle: dict = {}
    schema = shards[0].schema
    n_changes = 0
    n_txns = 0
    lsn_base = 0
    seq = 0
    for st in shards:
        top = 0
        for _, lsn, frame in st.frames:
            frames.append((seq, lsn + lsn_base, frame))
            seq += 1
            top = max(top, lsn + len(frame) + 1)
        lsn_base += top + 1000
        oracle.update(st.oracle)
        n_changes += st.n_changes
        n_txns += st.n_txns
        for c in st.schema.columns:
            schema = schema.with_column(c)
    return GeneratedStream(frames, oracle, schema, n_changes, n_txns)


def encode_routed_changes(
    changes: list[tuple],
    config: EngineConfig | None = None,
    txn_every: int = 20,
) -> list[tuple[int, int, bytes]]:
    """Encode an ordered change list spanning MULTIPLE tables into
    pg_pb3_ld frames — the multi-table routing fixture (the reference
    emits every replica-identity table's messages interleaved, one
    TableDescription per message, decoder/pg_pb3_ld.c:274-293).

    ``changes``: ``(schema_name, table_name, op, key_cols, val_cols)``
    with op INSERT/UPDATE/DELETE and cols as (name, value, oid)
    triples.  Key cols ride ``key_fields`` for UPDATE/DELETE and are
    prepended to ``new_values`` (fsd_populate_from_tuple logs all
    columns).  Returns (frame_seq, lsn, frame) rows for
    ``_frames_table`` / parquet writers."""
    cfg = config or EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    batcher = WireBatcher(cfg)
    tds: dict[tuple[str, str], bytes] = {}

    def fv(name: str, value, oid: int) -> FieldValue:
        if value is None:
            return FieldValue(name, None, oid)
        binary = cfg.binary_output_for(oid)
        return FieldValue(
            name, encode_value(value, oid, binary), oid, is_binary=binary
        )

    open_n = 0
    for schema_name, table, op, key_cols, val_cols in changes:
        if open_n == 0:
            batcher.begin_txn()
        td = tds.setdefault(
            (schema_name, table), encode_table(schema_name, table)
        )
        keys = [fv(*k) for k in key_cols]
        vals = [fv(*v) for v in val_cols]
        fs = lambda cols: encode_field_set(  # noqa: E731
            cols, cfg.type_oids_mode, cfg.formats_mode
        )
        if op == "INSERT":
            batcher.change(wire.WMSG_INSERT, encode_insert(td, fs(keys + vals)))
        elif op == "UPDATE":
            batcher.change(
                wire.WMSG_UPDATE, encode_update(td, fs(keys), fs(keys + vals))
            )
        elif op == "DELETE":
            batcher.change(wire.WMSG_DELETE, encode_delete(td, fs(keys)))
        else:
            raise ValueError(f"unknown op {op!r}")
        open_n += 1
        if open_n >= txn_every:
            batcher.commit_txn()
            open_n = 0
    if open_n:
        batcher.commit_txn()
    return [(i, lsn, fr) for i, (lsn, fr) in enumerate(batcher.frames())]


def _frames_table(frames: list[tuple[int, int, bytes]]):
    import pyarrow as pa

    return pa.table(
        {
            "frame_seq": pa.array([f[0] for f in frames], pa.int64()),
            "lsn": pa.array([f[1] for f in frames], pa.int64()),
            "frame": pa.array([f[2] for f in frames], pa.binary()),
        }
    )


def write_frames_binary_dir(stream: GeneratedStream, dirpath: str) -> int:
    """One raw file per frame, named ``frame-<seq>-<lsn>.bin`` — the
    landing-zone layout ``sources.frames.binaryfile_frames`` reads."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    for seq, lsn, frame in stream.frames:
        with open(
            os.path.join(dirpath, f"frame-{seq:010d}-{lsn}.bin"), "wb"
        ) as f:
            f.write(frame)
    return len(stream.frames)


def write_frames_parquet(stream: GeneratedStream, path: str) -> None:
    """Persist frames as parquet (frame_seq, lsn, frame) — the raw
    ingest table the Spark pipeline reads (batch or readStream)."""
    import pyarrow.parquet as pq

    pq.write_table(_frames_table(stream.frames), path)


def write_frames_parquet_dir(
    stream: GeneratedStream, dirpath: str, n_files: int = 8,
    start_file: int = 0, end_file: int | None = None,
) -> int:
    """Write frames chronologically split across ``n_files`` parquet
    files in a directory — the streaming file source's landing zone.
    ``start_file``/``end_file`` select a sub-range (to simulate files
    arriving over time).  Returns the number of files written."""
    import os

    import pyarrow.parquet as pq

    import time as _time

    os.makedirs(dirpath, exist_ok=True)
    n = len(stream.frames)
    per = (n + n_files - 1) // n_files
    end_file = n_files if end_file is None else end_file
    written = 0
    # strictly increasing mtimes: Spark's file source orders batches
    # by modification time with arbitrary tie-breaks; a real landing
    # zone produces files over time, so emulate that — the pipeline's
    # LSN watermark requires in-order delivery (strict_frame_order)
    base = _time.time() - 86_400
    for i in range(start_file, min(end_file, n_files)):
        chunk = stream.frames[i * per : (i + 1) * per]
        if not chunk:
            continue
        path = os.path.join(dirpath, f"frames-{i:04d}.parquet")
        pq.write_table(_frames_table(chunk), path)
        os.utime(path, (base + i, base + i))
        written += 1
    return written
