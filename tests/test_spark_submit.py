"""North-rule deployment evidence: the engine runs via
``spark-submit --py-files`` — the real command line, a real
subprocess, the package imported ONLY from the zip (cwd stripped),
and a real mini CDC apply inside the submitted job."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from pg_pb3_ld_spark.deploy import build_pyfiles_zip

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

JOB = '''
import json, os, sys, tempfile
# prove the engine came from --py-files: the repo itself must NOT be
# importable from cwd/sys.path entries other than the shipped zip
sys.path = [p for p in sys.path if not p.rstrip("/").endswith("/repo")]
import pg_pb3_ld_spark
assert ".zip" in (pg_pb3_ld_spark.__file__ or ""), pg_pb3_ld_spark.__file__

from pyspark.sql import SparkSession
from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
from pg_pb3_ld_spark.pipeline import IngestPipeline
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

spark = SparkSession.builder.getOrCreate()
wd = tempfile.mkdtemp()
cfg = EngineConfig(type_oids_mode="omit_nulls", formats_mode="disabled",
                   binary_oid_ranges="20-23,1184")
stream = generate_stream(seed=5, n_convs=4, max_turns=3, n_extra_txns=6,
                         config=cfg)
fp = os.path.join(wd, "frames.parquet")
write_frames_parquet(stream, fp)
store = SnapshotStore.create(spark, os.path.join(wd, "t"),
                             transcripts_schema(), num_buckets=2)
IngestPipeline(spark, store, cfg).apply_frames(
    spark.read.parquet(fp), batch_id=1)
rows = {(r["conv_id"], r["turn_idx"]): r["text"]
        for r in store.read_table().collect()}
want = {k: v["text"] for k, v in stream.oracle.items()}
print("SUBMIT_RESULT", json.dumps({"ok": rows == want, "n": len(rows)}))
spark.stop()
'''


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files(tmpdir_path):
    zip_path = os.path.join(tmpdir_path, "engine.zip")
    build_pyfiles_zip(zip_path)
    job_path = os.path.join(tmpdir_path, "job.py")
    with open(job_path, "w") as f:
        f.write(JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # engine must come from --py-files only
    env["MALLOC_MMAP_MAX_"] = "0"
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            job_path,
        ],
        capture_output=True, text=True, timeout=420,
        cwd=tmpdir_path, env=env,
    )
    lines = [
        l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT")
    ]
    assert lines, f"no result line;\nstdout:{out.stdout[-1500:]}\nstderr:{out.stderr[-1500:]}"
    res = json.loads(lines[-1][len("SUBMIT_RESULT "):])
    assert res["ok"] and res["n"] > 0


def test_pyfiles_zip_reproducible(tmpdir_path):
    a = build_pyfiles_zip(os.path.join(tmpdir_path, "a.zip"))
    b = build_pyfiles_zip(os.path.join(tmpdir_path, "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_any_batching_same_final_state(spark, tmpdir_path):
    """North-rule replay property: applying the SAME stream as 1, 2,
    3, or 5 prefix batches (each later batch re-offering everything —
    resume-from-checkpoint shape) must produce IDENTICAL final tables
    and watermarks."""
    from pyspark.sql import functions as F

    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
    from pg_pb3_ld_spark.pipeline import IngestPipeline
    from pg_pb3_ld_spark.schema import transcripts_schema
    from pg_pb3_ld_spark.sinks.store import SnapshotStore

    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    stream = generate_stream(
        seed=91, n_convs=8, max_turns=5, n_extra_txns=30, config=cfg,
        key_move_prob=0.2,
    )
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    frames = spark.read.parquet(fp)
    n = len(stream.frames)

    def apply_in(tag, n_batches):
        store = SnapshotStore.create(
            spark, os.path.join(tmpdir_path, tag), transcripts_schema(),
            num_buckets=4,
        )
        pipe = IngestPipeline(spark, store, cfg)
        step = (n + n_batches - 1) // n_batches
        for b in range(1, n_batches):
            pipe.apply_frames(
                frames.where(F.col("frame_seq") < b * step), batch_id=b
            )
        pipe.apply_frames(frames, batch_id=n_batches)
        rows = sorted(
            tuple(r[c] for c in
                  ("conv_id", "turn_idx", "role", "text", "tool", "ts"))
            for r in store.read_table().collect()
        )
        return rows, store.hwm()

    base_rows, base_hwm = apply_in("k1", 1)
    want = {k: v["text"] for k, v in stream.oracle.items()}
    assert {(r[0], r[1]): r[3] for r in base_rows} == want
    for k in (2, 3, 5):
        rows, hwm = apply_in(f"k{k}", k)
        assert rows == base_rows, f"{k}-batch replay diverged"
        assert hwm == base_hwm, f"{k}-batch watermark diverged"
