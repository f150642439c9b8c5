"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf directory, compare row count + sorted-column value hash.

Usage: python BENCH/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(rows, cols):
    cols = sorted(cols)
    lines = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(zip(r[1], r[0]))
        lines.append("|".join(_norm(d[c]) for c in cols))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from pg_pb3_ld_spark.session import build_session

    spark = build_session(
        app_name="correctness-check", master="local[8]",
        shuffle_partitions=16,
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if sql is None:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        ores = con.execute(sql)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        odicts = [dict(zip(ocols, r)) for r in orows]
        sh = value_hash(srows, scols)
        oh = hashlib.md5(
            "\n".join(
                sorted(
                    "|".join(_norm(d[c]) for c in sorted(ocols))
                    for d in odicts
                )
            ).encode()
        ).hexdigest()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"cols_match={ok_cols} hash_match={ok_hash}"
        )
        if not ok_cols:
            print(f"  spark cols: {sorted(scols)}\n  oracle cols: {sorted(ocols)}")
    spark.stop()
    if fails:
        print("FAILURES:", fails)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
