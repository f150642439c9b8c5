"""SparkSession builder with the engine's scale-tuned defaults.

Local-mode shape for the sandbox; on a real cluster the same configs
ride ``spark-submit --py-files`` unchanged.  AQE is on for runtime
partition coalescing and skew-join splitting (SURVEY.md §4); session
timezone is pinned UTC so timestamptz values round-trip exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pg_pb3_ld_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # glibc mmap()s every >128 KiB allocation and munmap()s it on
    # free, so each large numpy temp in the decode stage pays fresh
    # first-touch page faults — catastrophically slow under some
    # hypervisors (measured 5× end-to-end decode here).  Keep big
    # blocks on the heap instead; memory headroom is ample.
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    if shuffle_partitions is None:
        cores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 8)
    try:
        n_cores = int(master[master.find("[") + 1 : master.find("]")])
    except (ValueError, IndexError):
        n_cores = os.cpu_count() or 8
    # heap must scale with cores or GC becomes the scalability ceiling
    # (single-JVM local mode shares one heap across all task threads)
    default_mem = f"{max(8, 2 * n_cores)}g"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the decode stage sub-chunks its own Arrow batches by bytes,
        # so the row-count cap can stay generous
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", default_mem))
        .config("spark.ui.enabled", "false")
        # propagate the malloc tuning to executor python workers
        .config("spark.executorEnv.MALLOC_MMAP_MAX_", "0")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
    )
    # shuffle spill on the sandbox's ~200 MB/s virtual disk serializes
    # every stage; a real cluster has per-node NVMe. tmpfs restores an
    # I/O bandwidth that scales with cores.
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        local_dir = os.path.join(shm, "spark-local")
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
