#!/usr/bin/env python3
"""Bench-trajectory diff: joins two BENCH_DETAIL.json per-query maps and
prints the movers, so "env-wide drift vs targeted regression" is a
one-command answer instead of a manual forensic.

Usage:
    python3 tools/bench_diff.py                 # HEAD copy vs working copy
    python3 tools/bench_diff.py OLD [NEW]       # each arg: a file path, or a
                                                # git ref (resolved against
                                                # <ref>:BENCH_DETAIL.json)

Reads the {"queries": {name: sec}} map from each side. Output:
  - totals + overall median per-query ratio (the env-drift indicator: a
    near-uniform median shift with few outliers = environment, not code)
  - a CALIBRATION-NORMALIZED median (added round 16): each side's CPU
    calibration (mean of calib_pre/calib_post — a fixed 32-thread LCG
    loop, so its ratio IS the ambient contention ratio) divides the
    per-query ratios, turning the recurring "the 1.14x median is uniform
    ambient, calib moved the same way" argument into one printed number.
    The mover gate below uses the NORMALIZED ratio when both sides carry
    calibrations (raw otherwise).
  - every query whose normalized ratio moved >1.5x either way, sorted by
    |log ratio|, with the absolute delta (a 4.6x move on a 0.27s query
    is noise-grade; the delta column keeps that honest)
  - queries present on only one side (added/removed)

Exit code 0 always — this is a reporting tool, not a gate.
"""
import json
import math
import os
import subprocess
import sys


def load(spec: str) -> dict:
    """Existing file path wins (even one containing ':'); anything else is
    a git ref, resolved against <ref>:BENCH_DETAIL.json unless the spec
    already names an object path."""
    if os.path.exists(spec):
        with open(spec) as f:
            return json.load(f)
    ref = spec if ":" in spec else f"{spec}:BENCH_DETAIL.json"
    out = subprocess.check_output(["git", "show", ref], text=True)
    return json.loads(out)


def main() -> None:
    old_spec = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_spec = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    old, new = load(old_spec), load(new_spec)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no common queries between the two sides")
        return

    ratios = sorted(nq[k] / max(oq[k], 1e-9) for k in common)
    med = ratios[len(ratios) // 2]

    def calib_mean(d: dict):
        vals = [v for v in (d.get("calib_pre"), d.get("calib_post")) if v]
        return sum(vals) / len(vals) if vals else None

    cal_o, cal_n = calib_mean(old), calib_mean(new)
    cal_ratio = (cal_n / cal_o) if (cal_o and cal_n) else None

    def probes(d: dict) -> str:
        """Environment-probe suffix (fields present since round 10):
        calib ≈0.9 idle, inflated by ambient contention; pass_totals
        lopsided = mid-run load the calibrations can't see."""
        parts = []
        if d.get("calib_pre") is not None:
            parts.append(f"calib={d['calib_pre']:.2f}/{d.get('calib_post', 0):.2f}")
        if d.get("pass_totals"):
            parts.append("passes=[" + ",".join(f"{p:.0f}" for p in d["pass_totals"]) + "]")
        return ("  " + "  ".join(parts)) if parts else ""

    def split_totals(q: dict) -> str:
        """Since round 12 shared memoized builds are their own `memo:<key>`
        lines and query lines carry marginal cost only — totals are
        conserved but per-line values are NOT comparable to pre-r12
        details unless memo lines are folded back in. Show the split so a
        cross-era total comparison stays honest."""
        memo = sum(v for k, v in q.items() if k.startswith("memo:"))
        if memo == 0:
            return ""
        return f"  (queries {sum(q.values()) - memo:.1f} + memo {memo:.1f})"

    print(f"old: {old_spec}  total={old.get('value')}s  n={len(oq)}{probes(old)}{split_totals(oq)}")
    print(f"new: {new_spec}  total={new.get('value')}s  n={len(nq)}{probes(new)}{split_totals(nq)}")
    one_sided_memo = (any(k.startswith('memo:') for k in oq)
                      != any(k.startswith('memo:') for k in nq))
    if one_sided_memo:
        print("NOTE: only one side carries memo:<key> lines — the runs straddle"
              " the ROUND-12 memo-attribution boundary (builds moved off the"
              " first family consumer onto their own lines; canonical re-based"
              " trajectory: BASELINE.md round-13 block, r12 closing 111.460s)."
              " Per-query ratios for memo-consuming families are accounting"
              " artifacts; compare totals or query+memo sums.")
    norm_note = ""
    if cal_ratio:
        norm_note = (f"  calib_ratio={cal_ratio:.2f}x"
                     f"  normalized_median={med / cal_ratio:.2f}x")
    print(f"common={len(common)}  median_ratio={med:.2f}x{norm_note}  "
          f"(>1.2x: {sum(r > 1.2 for r in ratios)}, <0.83x: {sum(r < 1/1.2 for r in ratios)})")

    # the mover gate runs on the calibration-NORMALIZED ratio when both
    # sides carry calibrations: a uniform ambient-load shift moves calib
    # and every query by the same factor, so dividing it out leaves only
    # code movement (raw ratio when either side predates the probes)
    def norm(r: float) -> float:
        return r / cal_ratio if cal_ratio else r

    gate = "normalized " if cal_ratio else ""
    # clamp BOTH sides to 1ms: per-query values are rounded to 1ms, so a
    # sub-millisecond line lands as 0.0 and a bare ratio is 0 or inf —
    # log() in the sort below blew up on exactly that (r18); below-
    # resolution measurements are noise, not movers
    movers = [(k, norm(max(nq[k], 1e-3) / max(oq[k], 1e-3))) for k in common]
    movers = [(k, r) for k, r in movers if r > 1.5 or r < 1 / 1.5]
    movers.sort(key=lambda kr: -abs(math.log(kr[1])))
    if movers:
        print(f"\n{len(movers)} quer{'y' if len(movers) == 1 else 'ies'} "
              f"moved >1.5x ({gate}ratio):")
        print(f"  {'query':42} {'old':>7} {'new':>7} {'ratio':>7} {'delta':>8}")
        for k, r in movers:
            print(f"  {k:42} {oq[k]:7.2f} {nq[k]:7.2f} {r:6.2f}x {nq[k]-oq[k]:+7.2f}s")
    else:
        print(f"\nno query moved >1.5x either way ({gate}ratio)")

    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(f"{k} ({nq[k]:.2f}s)" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(f"{k} ({oq[k]:.2f}s)" for k in removed))


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped into head; not an error
        import os
        os._exit(0)
