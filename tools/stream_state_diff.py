#!/usr/bin/env python3
"""Streaming state-plateau gate: compares the current STREAMSTATE_DETAIL.json
against a recorded one and flags growth in the per-pipeline state plateau.

StreamStateProbe gates boundedness WITHIN a run (last-quarter vs
second-quarter max); this tool gates ACROSS rounds: the plateau level
(q4max — max state rows over the last quarter of batches) of each stateful
pipeline should stay put on unchanged code and data. A creeping plateau
(default threshold 1.5x) means a pipeline started retaining more state per
watermark window — the slow-leak direction a single run's plateau check
can't see. State ROW counts are deterministic (no wall-clock noise), so
unlike the floor gate this one needs no ambient-load caveat.

Usage:
    python3 tools/stream_state_diff.py             # HEAD copy vs working copy
    python3 tools/stream_state_diff.py OLD [NEW]   # each arg: a file path, or
                                                   # a git ref (resolved against
                                                   # <ref>:STREAMSTATE_DETAIL.json)

Exit codes: 0 = within threshold, 1 = plateau growth or lost boundedness,
2 = sides not comparable (missing file/ref, different chunks/sf).
(Builder-side tool only — not part of the library.)
"""
import json
import os
import subprocess
import sys

THRESHOLD = float(os.environ.get("STREAM_STATE_DIFF_THRESHOLD", "1.5"))


def load(spec: str) -> dict:
    if os.path.exists(spec):
        with open(spec) as f:
            return json.load(f)
    ref = spec if ":" in spec else f"{spec}:STREAMSTATE_DETAIL.json"
    out = subprocess.check_output(["git", "show", ref], text=True)
    return json.loads(out)


def main() -> int:
    old_spec = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_spec = sys.argv[2] if len(sys.argv) > 2 else "STREAMSTATE_DETAIL.json"
    try:
        old, new = load(old_spec), load(new_spec)
    except (subprocess.CalledProcessError, FileNotFoundError, json.JSONDecodeError) as e:
        print(f"stream_state_diff: cannot load both sides ({e}); "
              "run `sbt 'runMain graft.StreamStateProbe'` to record one")
        return 2
    if old.get("chunks") != new.get("chunks") or old.get("sf") != new.get("sf"):
        print(f"stream_state_diff: sides not comparable — old chunks="
              f"{old.get('chunks')} sf={old.get('sf')} vs new chunks="
              f"{new.get('chunks')} sf={new.get('sf')}; the gate is defined "
              "on the canonical argless run only")
        return 2

    flagged = []
    for name in sorted(set(old["pipelines"]) | set(new["pipelines"])):
        o, n = old["pipelines"].get(name), new["pipelines"].get(name)
        if o is None or n is None:
            # the canonical probe always emits all six pipelines — a
            # one-sided row means a pipeline was deleted or its curve
            # lost, which must not pass the gate silently (r14 advice)
            side = "old" if o is None else "new"
            print(f"  {name:<14} MISSING on the {side} side "
                  "<-- PIPELINE SET CHANGED")
            flagged.append(name)
            continue
        ratio = n["q4max"] / max(o["q4max"], 1)
        bad = ratio > THRESHOLD or (o.get("bounded", True) and not n.get("bounded", True))
        mark = " <-- STATE PLATEAU GREW" if ratio > THRESHOLD else ""
        if o.get("bounded", True) and not n.get("bounded", True):
            mark += " <-- LOST BOUNDEDNESS"
        # live-state BYTES plateau (rocksdbSstFileSize q4max, added r15 —
        # the per-key VALUE-leak signal the rows gate is blind to);
        # absent on pre-r15 recordings, gated once both sides carry it
        sst = ""
        if o.get("sst_q4max") is not None and n.get("sst_q4max") is not None:
            sst_ratio = n["sst_q4max"] / max(o["sst_q4max"], 1)
            sst = f"  sst {o['sst_q4max']} -> {n['sst_q4max']} ({sst_ratio:.2f}x)"
            if sst_ratio > THRESHOLD:
                sst += " <-- LIVE-STATE BYTES GREW"
                bad = True
        # mem-boundedness is gated whenever the NEW side carries the
        # field, independent of the old side's sst fields (r15 advice:
        # nesting this under the both-sides-have-sst branch let a new
        # run lose boundedness against a pre-r15 baseline unflagged)
        if n.get("mem_bounded") is not None:
            if o.get("mem_bounded", True) and not n["mem_bounded"]:
                sst += " <-- LOST MEM BOUNDEDNESS"
                bad = True
        print(f"  {name:<14} plateau {o['q4max']} -> {n['q4max']} rows "
              f"({ratio:.2f}x)  dropped {o['dropped']} -> {n['dropped']}"
              f"  bounded {o.get('bounded')} -> {n.get('bounded')}{mark}{sst}")
        if bad:
            flagged.append(name)
    if flagged:
        print(f"stream_state_diff: state plateau grew >{THRESHOLD}x, lost "
              f"boundedness, or pipeline missing on one side: "
              f"{', '.join(flagged)}")
        return 1
    print(f"stream_state_diff: OK — all pipeline state plateaus within "
          f"{THRESHOLD}x of {old_spec}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
