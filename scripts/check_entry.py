"""Pre-flight for the driver's correctness gate: run every __spark_entry__
queries() entry against its oracle_sql() on DuckDB at the given SF and compare
row count + column names + pandas dtypes + order-insensitive values.

This reproduces the DRIVER's environment, not ours: by default the Spark
session is built conf-less (no nanosAsLong, no AQE tuning, default shuffle
partitions) exactly like the driver supplies its own session, and the value
comparison goes through pandas so dtype drift (int32 vs int64, float vs
decimal) is caught the same way the driver's type-sensitive hash catches it.

Usage: python scripts/check_entry.py [sf_dir] [--get-spark] [--only name1,name2]
       [--clear-cache]

--clear-cache drops cached/persisted frames between queries, emulating the
driver's one-query-per-adjudication memory profile.  Without it, a single
small-heap session accumulates every operator's persisted intermediates
across all ~100 queries, which can exhaust a default 1g driver heap at
sf0.1 even though every query passes in isolation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _confless_spark():
    """The driver's session: no engine confs at build time."""
    from pyspark.sql import SparkSession

    return SparkSession.builder.master("local[32]").appName("check_entry_confless").getOrCreate()


def _norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — mirrors the
    driver's order-insensitive, column-name-keyed compare."""
    df = df[sorted(df.columns, key=str.lower)]
    df.columns = [str(c).lower() for c in df.columns]
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            s = s.map(lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
        out[c] = s
    nd = pd.DataFrame(out)
    if len(nd):
        nd = nd.sort_values(by=list(nd.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return nd


def _dtype_sig(df: pd.DataFrame) -> dict[str, str]:
    return {c: str(df[c].dtype) for c in df.columns}


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
            if not np.allclose(sa.to_numpy(dtype=float), sb.to_numpy(dtype=float), rtol=0, atol=0, equal_nan=True):
                return False
        else:
            av = sa.map(repr).to_numpy()
            bv = sb.map(repr).to_numpy()
            if not (av == bv).all():
                return False
    return True


def main() -> int:
    args = [a for a in sys.argv[1:]]
    use_get_spark = "--get-spark" in args
    clear_cache = "--clear-cache" in args
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    args = [a for a in args if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    if use_get_spark:
        from dream_spark import get_spark

        spark = get_spark("check_entry")
    else:
        spark = _confless_spark()

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
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if clear_cache:
                spark.catalog.clearCache()
            sdf = qs[name](spark, sf_dir)
            spd = _norm_frame(sdf.toPandas())
            if name not in os_:
                print(f"{name}: rows={len(spd)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
                n_ok += 1
                continue
            dpd = _norm_frame(con.execute(os_[name]).fetchdf())
            scols, dcols = list(spd.columns), list(dpd.columns)
            sdt, ddt = _dtype_sig(spd), _dtype_sig(dpd)
            ok_cols = scols == dcols
            ok_dtype = sdt == ddt
            ok_vals = ok_cols and _values_equal(spd, dpd)
            ok = ok_cols and ok_dtype and ok_vals
            status = "OK " if ok else "FAIL"
            extra = ""
            if not ok_cols:
                extra = f" cols spark={scols} duck={dcols}"
            elif not ok_dtype:
                diffs = {c: (sdt[c], ddt[c]) for c in scols if sdt[c] != ddt[c]}
                extra = f" dtypes(spark,duck)={diffs}" + ("" if ok_vals else " +value-diff")
            elif not ok_vals:
                if len(spd) != len(dpd):
                    extra = f" rowcount {len(spd)} vs {len(dpd)}"
                else:
                    for c in scols:
                        av, bv = spd[c].map(repr).to_numpy(), dpd[c].map(repr).to_numpy()
                        bad = np.nonzero(av != bv)[0]
                        if len(bad):
                            i = bad[0]
                            extra = f" col={c} row{i}: spark={spd[c].iloc[i]!r} duck={dpd[c].iloc[i]!r}"
                            break
            print(f"{name}: {status} rows={len(spd)} [{time.time()-t0:.1f}s]{extra}")
            n_ok += ok
            n_bad += not ok
        except Exception as e:
            print(f"{name}: EXC {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
