#!/usr/bin/env python3
"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Times individual declared queries with the same methodology as
bench.py (build + .count()), with repeats, optional plan capture, and
optional noop-sink isolation (guide §1.4).  Prints one JSON line.

Usage:
  python bench_extra.py q1 q2 ...      # time those queries
  python bench_extra.py --all          # every declared query
  REPEATS=3 python bench_extra.py ...  # repeat count (default 2)
  EXPLAIN_DIR=plans/r06 SUFFIX=_before python bench_extra.py q1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("REPEATS", "2"))
EXPLAIN_DIR = os.environ.get("EXPLAIN_DIR", "")
SUFFIX = os.environ.get("SUFFIX", "")
USE_NOOP = os.environ.get("NOOP", "") == "1"


def main():
    import __spark_entry__ as entrymod
    from pg_pb3_ld_spark.session import build_session

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    qmap = entrymod.queries()
    if "--all" in sys.argv:
        names = sorted(qmap)
    spark = build_session(
        app_name="pb3ld-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    out: dict = {}
    try:
        # session warmup (JVM/FS/python-worker spin-up) so per-query
        # numbers are comparable to bench.py's (whose query loop runs
        # after the cdc benches warmed everything)
        spark.sparkContext.setJobDescription("warmup")
        for t in ("events", "documents", "embeddings"):
            spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
        qmap["doc_token_stats"](spark, SF_DIR).count()
        for name in names:
            fn = qmap[name]
            spark.sparkContext.setJobDescription(name)
            runs = []
            for r in range(REPEATS):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                t_build = time.time() - t0
                if USE_NOOP:
                    df.write.format("noop").mode("overwrite").save()
                    n = -1
                else:
                    n = df.count()
                el = time.time() - t0
                runs.append(
                    {"sec": round(el, 3), "build_sec": round(t_build, 3),
                     "rows": n, "load1": round(os.getloadavg()[0], 2)}
                )
            if EXPLAIN_DIR:
                os.makedirs(EXPLAIN_DIR, exist_ok=True)
                df = qmap[name](spark, SF_DIR)
                with open(
                    os.path.join(EXPLAIN_DIR, f"{name}{SUFFIX}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            out[name] = {
                "best_sec": min(r["sec"] for r in runs),
                "runs": runs,
            }
            print(f"## {name}: {out[name]['best_sec']}s", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
