"""Compare two bench JSON outputs per query and flag regressions.

Usage: python scripts/bench_compare.py NEW.json [OLD.json] [--threshold 1.3]
       python scripts/bench_compare.py --min-of A.json,B.json,C.json [OLD.json]

NEW defaults to BENCH_LAST.json (written by bench.py alongside stdout);
OLD defaults to the newest BENCH_r*.json with a parsable per-query map
(the driver's stdout capture truncates long tails, so the "tail" field is
regex-scavenged when "parsed" is null).  Exit code 1 when any query shared
by both runs regressed beyond the threshold — the machine-checkable
regression gate VERDICT r3 asked for.

``--min-of`` implements the BASELINE.md min-of-N protocol (adopted r7):
the NEW side becomes the per-query MINIMUM across the listed runs — load
noise on this box is strictly additive on a fixed workload, so the
minimum is the least-contaminated estimate of the code's cost, and a
real regression cannot hide inside one noisy sample.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_doc(path: str) -> dict:
    """The full JSON document of one bench output file (when a captured
    stdout holds TWO JSON lines — full map first, compact summary last —
    the line with the most per-query timings wins)."""
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        docs = []
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    docs.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        if not docs:
            raise
        return max(docs, key=lambda d: len(d.get("queries", {}) or {}))


def load_queries(path: str) -> dict[str, float]:
    """Per-query timing map of one bench JSON, or {} when the file holds
    none (a crashed round's record) — callers decide whether that is
    fatal (an explicitly named file) or skippable (the fallback scan)."""
    doc = load_doc(path)
    # bench.py output: {"queries": {...}}; driver BENCH_r*.json: {"parsed":
    # {...}} or a truncated "tail" string to scavenge
    for key in ("queries", "parsed"):
        node = doc.get(key)
        if isinstance(node, dict):
            q = node.get("queries", node)
            if isinstance(q, dict) and q:
                return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}
    tail = doc.get("tail")
    if isinstance(tail, str):
        # scavenge ONLY the per-query map: scope to the substring after
        # '"queries": {' and before its closing '}' when the marker
        # survived truncation; a tail cut AFTER the marker starts mid-map
        # (the r4 record's shape), so then scavenge everything but DROP
        # the known top-level scalars — either way non-query fields can't
        # enter the timing map and fabricate REGRESSED flags from e.g.
        # setup drift
        qpos = tail.find('"queries": {')
        if qpos >= 0:
            tail = tail[qpos + len('"queries": {'):]
        end = tail.find("}")
        if end >= 0:
            tail = tail[:end]
        scalars = {"value", "sf", "setup_sec", "n_queries", "baseline53_sec"}
        return {
            k: float(v)
            for k, v in re.findall(r'"(\w+)": ([0-9.]+)', tail)
            if k not in scalars
        }
    return {}


def main() -> None:
    # --threshold accepts both '--threshold 1.5' and '--threshold=1.5';
    # the consumed value must NOT leak into the positional file args
    thr = 1.3
    min_of: list[str] = []
    write_min: str | None = None
    argv = list(sys.argv[1:])
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        # exact flag names only (with or without '='): startswith would
        # silently accept a typo like --min-of3 and consume the next token
        if a == "--threshold" or a.startswith("--threshold="):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                i += 1
                thr = float(argv[i])
        elif a == "--min-of" or a.startswith("--min-of="):
            if "=" in a:
                min_of = a.split("=", 1)[1].split(",")
            else:
                i += 1
                min_of = argv[i].split(",")
        elif a == "--write-min" or a.startswith("--write-min="):
            if "=" in a:
                write_min = a.split("=", 1)[1]
            else:
                i += 1
                write_min = argv[i]
        elif a.startswith("--"):
            raise SystemExit(f"unknown option {a!r}")
        else:
            args.append(a)
        i += 1
    # positional layout: [NEW] [OLD] normally; [OLD] only under --min-of
    # (the NEW side IS the min-of file list — binding a positional to the
    # discarded NEW slot would silently compare against the wrong OLD)
    if min_of:
        new_path = None
        old_args = args
    else:
        new_path = args[0] if args else os.path.join(REPO, "BENCH_LAST.json")
        old_args = args[1:]
    if old_args:
        if len(old_args) > 1:
            raise SystemExit(f"unexpected extra arguments: {old_args[1:]}")
        old_path = old_args[0]
    else:
        # newest-first scan SKIPS unparsable records (a crashed round's
        # {"rc":1, "parsed":null} file) instead of aborting on them.
        # BENCH_FULL_r*.json snapshots (the committed full per-query maps;
        # the driver's BENCH_r*.json tail capture holds only the compact
        # 53-anchor line from r7 on) are preferred within the same round —
        # without them the gate would silently narrow to the anchor set.
        def round_key(p: str) -> tuple[int, int]:
            m = re.search(r"_r(\d+)\.json$", p)
            return (int(m.group(1)) if m else -1, 1 if "FULL" in p else 0)

        cands = sorted(
            glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            + glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json")),
            key=round_key,
            reverse=True,
        )
        old_path = next((c for c in cands if load_queries(c)), None)
        if old_path is None:
            raise SystemExit("no BENCH_r*.json with per-query timings found")
    # load the OLD side BEFORE any --write-min output: the natural closing
    # invocation writes the refreshed map over the committed OLD path, and
    # loading afterwards silently compared the new map against itself
    # (always "zero movers" — a useless gate)
    old = load_queries(old_path)
    if min_of:
        # per-query minimum across the listed runs; a query missing from
        # some run still contributes the min over the runs that have it
        maps = [(p, load_queries(p)) for p in min_of]
        for p, m in maps:
            if not m:
                raise SystemExit(f"no per-query map found in {p}")
        new = {}
        for _, m in maps:
            for k, v in m.items():
                new[k] = min(v, new.get(k, v))
        new_path = f"min-of-{len(maps)}({','.join(os.path.basename(p) for p in min_of)})"
        if write_min:
            # snapshot the ELEMENTWISE-MIN map in the BENCH_FULL schema
            # (r9 VERDICT task 3: two rounds running, a committed
            # single-run snapshot handed the judge a phantom mover that
            # BENCH_LAST contradicted same-day; the committed artifact is
            # now the protocol's own min-of-N map, with provenance).
            # Template: the quietest run's full doc (sf/setup metadata).
            docs = [load_doc(p) for p in min_of]
            base = min(docs, key=lambda d: d.get("value", float("inf")))
            out = dict(base)
            out["queries"] = {k: round(new[k], 4) for k in sorted(new)}
            out["value"] = round(sum(new.values()), 4)
            b53 = [
                d["baseline53_sec"]
                for d in docs
                if isinstance(d.get("baseline53_sec"), (int, float))
            ]
            if b53:
                out["baseline53_sec"] = round(min(b53), 4)
            out["provenance"] = (
                f"per-query min of the {len(min_of)} closing runs: "
                + ", ".join(os.path.basename(p) for p in min_of)
            )
            with open(write_min, "w") as f:
                json.dump(out, f)
                f.write("\n")
            print(f"wrote elementwise-min map -> {write_min}")
    else:
        new = load_queries(new_path)
    if not new:
        raise SystemExit(f"no per-query map found in {new_path}")
    if not old:
        raise SystemExit(f"no per-query map found in {old_path}")
    shared = sorted(set(new) & set(old))
    print(f"new={os.path.basename(new_path)} ({len(new)} queries)  "
          f"old={os.path.basename(old_path)} ({len(old)} queries)  shared={len(shared)}")
    print(f"sum over shared: {sum(old[k] for k in shared):.1f}s -> {sum(new[k] for k in shared):.1f}s")
    regressed = []
    for k in sorted(shared, key=lambda k: new[k] / old[k], reverse=True):
        ratio = new[k] / old[k]
        if ratio > thr and new[k] - old[k] > 0.15:  # ignore sub-noise absolutes
            regressed.append(k)
            print(f"  REGRESSED {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({ratio:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only queries ({len(only_new)}): " + ", ".join(only_new))
    if regressed:
        sys.exit(1)
    print("no per-query regression beyond "
          f"{thr}x (+0.15s absolute floor)")


if __name__ == "__main__":
    main()
