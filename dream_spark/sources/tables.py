"""Load the driver-generated parquet tables and register them as temp views.

The same table names are pre-registered as DuckDB views by the correctness
driver, so any SQL that references them bare runs identically on both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Current testdata stores timestamps as parquet TIMESTAMP(MICROS) without
# isAdjustedToUTC, which Spark 4 surfaces as TIMESTAMP_NTZ (matching DuckDB's
# naive TIMESTAMP) — no repair needed; temporal operators use
# functions.timeutils.epoch_micros, which is dtype-aware.  Earlier driver
# generations wrote TIMESTAMP(NANOS), which Spark only reads as BIGINT nanos
# under spark.sql.legacy.parquet.nanosAsLong; keep that repair path so the
# engine reads either generation: convert bigint nanos to microsecond
# TIMESTAMP with integer division — exact, truncating the same way DuckDB's
# nanos→micros read does.
_NANO_TS_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"], "events": ["ts"]}


def _fix_timestamps(df: DataFrame, name: str) -> DataFrame:
    for c in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """The engine must work under ANY caller-supplied session (reference O1
    contract, Proxy.c:40) — not just our own get_spark().  events.parquet is
    TIMESTAMP(NANOS), which Spark rejects unless nanosAsLong is set; it is a
    runtime-settable conf, so set it here rather than at session build time."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # read-only conf mechanism (e.g. Connect w/ locked confs): proceed


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_nanos_readable(spark)
    return _fix_timestamps(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")), name)


# (session id, view name) -> sf_dir currently backing that view.  Used to
# make registration idempotent: createOrReplaceTempView INVALIDATES every
# cache entry whose plan references the replaced view (Spark's staleness
# guard), so re-registering the same table for the same sf_dir — which
# rel_sql_passthrough and every engine construction do — would silently
# evict the open triple store's cache.
_REGISTERED: dict[tuple[int, str], str] = {}


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view named after itself.

    Scans stay parquet-backed (predicate pushdown + column pruning reach the
    file scan); nothing is materialized here.  Re-registration for the SAME
    sf_dir is skipped (see _REGISTERED); pointing a view at a DIFFERENT
    sf_dir replaces it — and deliberately drops dependent caches, since
    their data really did change.
    """
    _ensure_nanos_readable(spark)
    out: dict[str, DataFrame] = {}
    for name in tables or TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        key = (id(spark), name)
        if _REGISTERED.get(key) == sf_dir:
            # trust-but-verify: the registry entry can be stale (caller
            # dropped the view, or a new session object reused this id) —
            # fall through to re-registration instead of failing later
            try:
                out[name] = spark.table(name)
                continue
            except Exception:
                _REGISTERED.pop(key, None)
        df = _fix_timestamps(spark.read.parquet(path), name)
        df.createOrReplaceTempView(name)
        _REGISTERED[key] = sf_dir
        out[name] = df
    return out
