"""Pre-flight for the driver's correctness gate: run every __spark_entry__
queries() entry against its oracle_sql() on DuckDB at the given SF, compare
row count + column names + order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from dream_spark import get_spark
from tests.conftest import TABLES


def norm(v):
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("check_entry")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    print("== entry() smoke ==")
    df = entrymod.entry(spark)
    print("entry rows:", df.count(), "schema:", df.schema.simpleString())

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name in sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sorted((tuple(norm(v) for v in r) for r in sdf.collect()), key=repr)
            scols = [c.lower() for c in sdf.columns]
            if name not in os_:
                print(f"{name}: rows={len(srows)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
                n_ok += 1
                continue
            res = con.execute(os_[name])
            dcols = [d[0].lower() for d in res.description]
            drows = sorted((tuple(norm(v) for v in r) for r in res.fetchall()), key=repr)
            ok = scols == dcols and srows == drows
            status = "OK " if ok else "FAIL"
            extra = ""
            if not ok:
                if scols != dcols:
                    extra = f" cols spark={scols} duck={dcols}"
                elif len(srows) != len(drows):
                    extra = f" rowcount {len(srows)} vs {len(drows)}"
                else:
                    diff = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
                    extra = f" first-diff {diff}"
            print(f"{name}: {status} rows={len(srows)} [{time.time()-t0:.1f}s]{extra}")
            n_ok += ok
            n_bad += not ok
        except Exception as e:
            print(f"{name}: EXC {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
