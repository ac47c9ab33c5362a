#!/usr/bin/env python3
"""Streaming per-batch-floor gate: compares the current STREAM_DETAIL.json
against a recorded one and flags growth in sec_per_batch.

The per-batch floor (sec/chunks under maxFilesPerTrigger=1) is the number
that detects a streaming pipeline accreting per-batch driver work — rows/sec
alone can hide it behind bigger batches. StreamBench records the canonical
line (argless run: sf0.1, 16 chunks) to STREAM_DETAIL.json; this tool joins
two such lines per-pipeline and exits nonzero when any pipeline's floor grew
more than the threshold (default 1.5x), so the closing gate matrix can carry
a tool-produced streaming line instead of a hand-read one.

Usage:
    python3 tools/stream_diff.py                 # HEAD copy vs working copy
    python3 tools/stream_diff.py OLD [NEW]       # each arg: a file path, or
                                                 # a git ref (resolved against
                                                 # <ref>:STREAM_DETAIL.json)

Exit codes: 0 = within threshold, 1 = floor regression flagged,
2 = sides not comparable (missing file/ref, different chunk counts).
(Builder-side tool only — not part of the library.)
"""
import json
import os
import subprocess
import sys

THRESHOLD = float(os.environ.get("STREAM_DIFF_THRESHOLD", "1.5"))


def load(spec: str) -> dict:
    if os.path.exists(spec):
        with open(spec) as f:
            return json.load(f)
    ref = spec if ":" in spec else f"{spec}:STREAM_DETAIL.json"
    out = subprocess.check_output(["git", "show", ref], text=True)
    return json.loads(out)


def main() -> int:
    old_spec = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_spec = sys.argv[2] if len(sys.argv) > 2 else "STREAM_DETAIL.json"
    try:
        old, new = load(old_spec), load(new_spec)
    except (subprocess.CalledProcessError, FileNotFoundError, json.JSONDecodeError) as e:
        print(f"stream_diff: cannot load both sides ({e}); "
              "run `sbt 'runMain graft.StreamBench'` to record one")
        return 2
    if old.get("chunks") != new.get("chunks") or old.get("sf") != new.get("sf"):
        print(f"stream_diff: sides not comparable — old chunks={old.get('chunks')} "
              f"sf={old.get('sf')} vs new chunks={new.get('chunks')} sf={new.get('sf')}; "
              "the gate is defined on the canonical argless run only")
        return 2

    flagged = []
    for name in sorted(set(old["pipelines"]) | set(new["pipelines"])):
        o, n = old["pipelines"].get(name), new["pipelines"].get(name)
        if o is None or n is None:
            print(f"  {name:<14} present on one side only")
            continue
        ratio = n["sec_per_batch"] / max(o["sec_per_batch"], 1e-9)
        mark = " <-- FLOOR REGRESSION" if ratio > THRESHOLD else ""
        print(f"  {name:<14} floor {o['sec_per_batch']:.3f} -> {n['sec_per_batch']:.3f} s/batch "
              f"({ratio:.2f}x)  throughput {o['rows_per_sec']:.0f} -> "
              f"{n['rows_per_sec']:.0f} rows/s{mark}")
        if ratio > THRESHOLD:
            flagged.append(name)
    if flagged:
        print(f"stream_diff: per-batch floor grew >{THRESHOLD}x on: {', '.join(flagged)} "
              "(check calib/ambient load first — the floor is wall-clock; "
              "re-run at idle before believing a regression)")
        return 1
    print(f"stream_diff: OK — all pipeline floors within {THRESHOLD}x of "
          f"{old_spec}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
