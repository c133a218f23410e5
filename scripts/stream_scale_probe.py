"""Measured scaling slope of the STREAM RUNS themselves (r8; 100x legs r9).

The live entries (streaming_*_live) measure sink read-back; the
availableNow trigger runs they read are one-time builds whose cost DOES
scale with data — this probe measures that cost per decade, which is the
number a 100-TB streaming deployment sizes against (state rows per key,
shuffle volume per micro-batch).

Method: for each named stream operator, build the augmented input
(events + flush sentinel, the live-entry recipe) for the sf dir, run the
stream availableNow into a throwaway parquet sink, and time the full
drain.  No build-once cache — every run is a real measured execution.

Usage: python scripts/stream_scale_probe.py [--dirs d1,d2,...]
           [--entries name1,name2,...] [--timeout SECONDS]
Defaults to /root/testdata/sf0.1 and /tmp/dream_spark_scale10 (built by
scale_probe.py).  ``--entries`` restricts the measured set (the 100x
legs are expensive — a targeted run keeps a second-decade probe to
minutes); ``--timeout`` raises the per-stream drain bound for those
legs.  The 100x dir needs SPARK_GRAFT_DRIVER_MEM=48g like scale_probe's
second decade (a memory-sizing knob, not a slope term).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = ["/root/testdata/sf0.1", "/tmp/dream_spark_scale10"]


def measure(sf_dir: str, entries: list[str] | None, timeout_s: int) -> dict[str, float]:
    from dream_spark import get_spark
    from dream_spark.streaming import events as SE

    spark = get_spark("stream-scale-probe")
    out: dict[str, float] = {}
    try:
        in_dir = SE._live_input_path(spark, sf_dir)  # cached: input build excluded
        dim = SE.user_profile_dim(spark, sf_dir).select("user_id", "n_events")
        streams = {
            "sessionize": SE.sessionize_stream,
            "sessionize_agg": SE.sessionize_stream_agg,
            "funnel": SE.funnel_stream,
            "funnel_agg": SE.funnel_stream_agg,
            "hourly": SE.hourly_counts_stream,
            "kmv": SE.kmv_stream,
            "hll": SE.hll_stream,
            "attribution": SE.attribution_stream,
            "enrich": lambda ev: SE._enrich_projected(ev, dim),
        }
        if entries:
            unknown = [e for e in entries if e not in streams]
            if unknown:
                raise SystemExit(f"unknown stream entries: {unknown}")
            streams = {k: v for k, v in streams.items() if k in entries}
        scratch = tempfile.mkdtemp(prefix="stream_probe_")
        try:
            for name, build in streams.items():
                raw = (
                    spark.readStream.schema(SE.EVENTS_SCHEMA)
                    .format("parquet")
                    .load(f"{in_dir}/in")
                )
                t0 = time.perf_counter()
                q = (
                    build(SE._instant_ts(raw))
                    .writeStream.format("parquet")
                    .option("path", f"{scratch}/{name}/out")
                    .option("checkpointLocation", f"{scratch}/{name}/ckpt")
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                # explicit raise (an assert vanishes under -O and would
                # publish a partial-drain wall time as a slope); stop the
                # query BEFORE the finally-block deletes its sink/checkpoint
                if not q.awaitTermination(timeout_s):
                    q.stop()
                    raise RuntimeError(
                        f"stream {name!r} did not drain in {timeout_s}s"
                    )
                out[name] = round(time.perf_counter() - t0, 2)
                n = spark.read.parquet(f"{scratch}/{name}/out").count()
                print(f"  {name} @ {sf_dir}: {out[name]}s rows={n}", file=sys.stderr)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    finally:
        # in the finally block (r8 ADVICE): a drain timeout raising out of
        # measure() must not leak the session — the next measure() call
        # would otherwise create a second session against the leaked one
        spark.stop()
    return out


def main() -> None:
    dirs = DIRS
    entries: list[str] | None = None
    timeout_s = 1200
    argv = sys.argv
    for i, a in enumerate(argv):
        if a in ("--dirs", "--entries", "--timeout") and i + 1 >= len(argv):
            raise SystemExit(f"{a} requires an argument")
        if a == "--dirs":
            dirs = argv[i + 1].split(",")
        elif a == "--entries":
            entries = [e for e in argv[i + 1].split(",") if e]
        elif a == "--timeout":
            timeout_s = int(argv[i + 1])
    results = {d: measure(d, entries, timeout_s) for d in dirs}
    base = results[dirs[0]]
    ratios = {
        d: {k: round(v[k] / base[k], 2) if base.get(k) else None for k in v}
        for d, v in results.items()
        if d != dirs[0]
    }
    print(json.dumps({"runs": results, "ratio_vs_first": ratios}))


if __name__ == "__main__":
    main()
