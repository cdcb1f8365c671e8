"""Summarize a `tpu.profile` trace without TensorBoard.

The reference documents a pstats workflow for its cProfile dumps
(reference README.md:371-383); the equivalent here: `tpu.profile: true`
writes a jax.profiler trace into `<log_dir>/profile/plugins/profile/<ts>/`
and this script turns its `*.trace.json.gz` into a per-op device-time
table.

Usage: python scripts/profile_summary.py <log_dir | trace.json.gz> [-n 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    """Accept a run dir, a profile dir, or the trace file itself."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.trace.json.gz"), recursive=True
    ))
    if not hits:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {path!r} — run with tpu.profile: true"
        )
    return hits[-1]  # newest timestamp dir sorts last


def summarize(trace_path: str):
    """-> (lanes, rows, total_ms): per-op total duration on device lanes."""
    with gzip.open(trace_path, "rt") as f:
        events = json.load(f)["traceEvents"]
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            lanes[e["pid"]] = e["args"].get("name", "")
    by = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        lane = lanes.get(e.get("pid"), "")
        if e.get("ph") == "X" and ("TPU" in lane or "GPU" in lane):
            ms = e.get("dur", 0) / 1e3
            by[e.get("name", "?")] += ms
            calls[e.get("name", "?")] += 1
            total += ms
    rows = [(name, ms, calls[name]) for name, ms in by.most_common()]
    return lanes, rows, total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="run log dir (or the trace.json.gz itself)")
    ap.add_argument("-n", type=int, default=25, help="rows to print")
    args = ap.parse_args(argv)

    trace = find_trace(args.path)
    lanes, rows, total = summarize(trace)
    dev = {p: n for p, n in lanes.items() if n and "CPU" not in n}
    print(f"trace: {trace}")
    print(f"device lanes: {', '.join(dev.values()) or '(none found)'}")
    print(f"total device-op time: {total:.1f} ms")
    print(f"{'ms':>10}  {'calls':>6}  op")
    for name, ms, n in rows[: args.n]:
        print(f"{ms:10.2f}  {n:6d}  {name[:100]}")


if __name__ == "__main__":
    sys.exit(main())
