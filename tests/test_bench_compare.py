"""Unit tests for scripts/bench_compare.py's record loader — the r5 ADVICE
(b) surface: the truncated-tail scavenger must never let top-level scalars
(setup_sec, n_queries, …) into the per-query timing map, where they would
fabricate REGRESSED flags from e.g. setup drift."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "bench_compare.py"),
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def _write(tmp_path, doc):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_loads_plain_queries_map(tmp_path):
    doc = {"value": 9.9, "queries": {"q1": 1.5, "q2": 0.25}, "setup_sec": 20.0}
    assert bc.load_queries(_write(tmp_path, doc)) == {"q1": 1.5, "q2": 0.25}


def test_tail_scavenge_scopes_to_the_queries_map(tmp_path):
    # marker survived truncation: everything before '"queries": {' (the
    # top-level scalars) and everything after its closing '}' must be
    # ignored
    tail = ('{"metric": "x", "value": 99.0, "queries": {"q1": 1.25, "q2": 0.5}'
            ', "setup_sec": 23.5, "n_queries": 2')
    got = bc.load_queries(_write(tmp_path, {"parsed": None, "tail": tail}))
    assert got == {"q1": 1.25, "q2": 0.5}


def test_tail_cut_after_marker_drops_known_scalars(tmp_path):
    # the r4 record's shape: the tail STARTS mid-map (marker truncated
    # away), so the fallback scan runs — known top-level scalars must
    # still be excluded
    tail = '"q7": 2.5, "q8": 0.75}, "sf": 0.1, "setup_sec": 23.0, "n_queries": 109'
    got = bc.load_queries(_write(tmp_path, {"parsed": None, "tail": tail}))
    assert got == {"q7": 2.5, "q8": 0.75}
    assert "setup_sec" not in got and "n_queries" not in got


def test_crashed_record_yields_empty_map(tmp_path):
    assert bc.load_queries(_write(tmp_path, {"rc": 1, "parsed": None})) == {}


def test_min_of_takes_per_query_minimum(tmp_path, monkeypatch, capsys):
    """--min-of (the BASELINE.md r7 protocol): the NEW side is the
    per-query minimum across the listed runs, so one noisy sample cannot
    fabricate a regression; the positional argument is the OLD baseline
    and MUST be honored (the review found it silently discarded, which
    made the gate compare against the wrong record); a query missing from
    some run still contributes the min over the runs that have it."""
    import sys

    runs = []
    for i, q in enumerate([
        {"q1": 2.0, "q2": 0.5},
        {"q1": 1.0, "q2": 0.9, "q3": 4.0},
        {"q1": 3.0, "q2": 0.4},
    ]):
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps({"queries": q}))
        runs.append(str(p))
    old = tmp_path / "old.json"
    old.write_text(json.dumps({"queries": {"q1": 1.0, "q2": 0.5, "q3": 4.0}}))
    monkeypatch.setattr(
        sys, "argv",
        ["bench_compare.py", "--min-of", ",".join(runs), str(old)],
    )
    bc.main()  # min map {q1:1.0, q2:0.4, q3:4.0} vs old: no regression
    out = capsys.readouterr().out
    assert "min-of-3" in out and "no per-query regression" in out
    # the named OLD was really used: all three of its queries compared
    assert "old=old.json" in out and "shared=3" in out


def test_min_of_regression_against_named_old_fails(tmp_path, monkeypatch, capsys):
    """A genuine regression vs the NAMED old baseline must exit 1 under
    --min-of — the exact scenario the discarded-positional bug passed."""
    import sys

    import pytest

    run = tmp_path / "run.json"
    run.write_text(json.dumps({"queries": {"q1": 5.0}}))
    old = tmp_path / "old.json"
    old.write_text(json.dumps({"queries": {"q1": 1.0}}))
    monkeypatch.setattr(
        sys, "argv", ["bench_compare.py", "--min-of", str(run), str(old)]
    )
    with pytest.raises(SystemExit) as exc:
        bc.main()
    assert exc.value.code == 1
    assert "REGRESSED q1" in capsys.readouterr().out


def test_two_line_stdout_capture_prefers_the_full_map(tmp_path):
    """bench.py stdout now holds TWO JSON lines (full per-query map, then
    the compact tail-fitting summary); the loader must pick the full map,
    not fail on 'Extra data' and not settle for the 53-entry subset."""
    p = tmp_path / "stdout.json"
    p.write_text(
        json.dumps({"queries": {"q1": 1.0, "q2": 2.0, "q3": 3.0}}) + "\n"
        + json.dumps({"queries": {"q1": 1.0}, "queries_full": "BENCH_LAST.json"}) + "\n"
    )
    assert bc.load_queries(str(p)) == {"q1": 1.0, "q2": 2.0, "q3": 3.0}


def test_compact_summary_line_fits_driver_tail():
    """The LAST stdout line bench.py prints must fit the driver's
    2000-byte tail capture WITHOUT triggering the smallest-first anchor
    trimming — if the 53-anchor compact line as currently generated ever
    outgrows ~1800 bytes, the durable record silently degrades (VERDICT
    r7 task 6).  Built with worst-realistic-case widths: every timing at
    maximum 2-decimal width (999.99) and headline scalars at full width."""
    import importlib.util as _il

    spec = _il.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
    )
    bench = _il.module_from_spec(spec)
    spec.loader.exec_module(bench)
    anchor = {n: 999.99 for n in bench.BASELINE_53}
    compact = {
        "metric": "headline_queries_total_wall",
        "value": 99999.9999,
        "unit": "sec",
        "queries": anchor,
        "sf": 0.1,
        "setup_sec": 999.999,
        "n_queries": 999,
        "baseline53_sec": 99999.9999,
        "queries_full": "BENCH_LAST.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1800, (
        f"compact bench summary line is {len(line)} bytes — approaching the "
        "driver's 2000-byte tail; shrink the anchor map or key names"
    )


def test_write_min_snapshots_elementwise_min_map(tmp_path, monkeypatch, capsys):
    """--write-min (r9 VERDICT task 3): the committed BENCH_FULL artifact
    becomes the protocol's own elementwise-min map instead of one noisy
    run — queries are per-query minima, value is their sum, baseline53 is
    the min of the runs' scalars, and a provenance line names the runs so
    the next judge can see no single-run transient survived into it."""
    import sys

    runs = []
    for i, (q, b53, v) in enumerate([
        ({"q1": 2.0, "q2": 0.5}, 10.0, 2.5),
        ({"q1": 1.0, "q2": 0.9}, 12.0, 1.9),
    ]):
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps(
            {"metric": "m", "value": v, "queries": q, "sf": 0.1,
             "baseline53_sec": b53}
        ))
        runs.append(str(p))
    old = tmp_path / "old.json"
    old.write_text(json.dumps({"queries": {"q1": 1.0, "q2": 0.5}}))
    dest = tmp_path / "BENCH_FULL_rX.json"
    monkeypatch.setattr(
        sys, "argv",
        ["bench_compare.py", "--min-of", ",".join(runs),
         "--write-min", str(dest), str(old)],
    )
    bc.main()
    doc = json.loads(dest.read_text())
    assert doc["queries"] == {"q1": 1.0, "q2": 0.5}
    assert doc["value"] == 1.5
    assert doc["baseline53_sec"] == 10.0
    assert "run0.json" in doc["provenance"] and "run1.json" in doc["provenance"]
    # template metadata (sf etc.) carried from the quietest run
    assert doc["sf"] == 0.1
