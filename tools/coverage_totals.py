#!/usr/bin/env python3
"""Regenerate COVERAGE.md's totals block from a driver CORRECTNESS json.

Usage: python3 tools/coverage_totals.py [CORRECTNESS_rNN.json]

With no argument, picks the newest CORRECTNESS_r*.json in the repo root.
Rewrites the text between the GENERATED-TOTALS markers in COVERAGE.md so
the headline numbers are always derived from the last measured run and
cannot drift from the truth by hand-editing (the round-7 failure mode:
the doc claimed a fully-green surface while one query failed the hash).
(Builder-side tool only — not part of the library.)
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED TOTALS (tools/coverage_totals.py) -->"
END = "<!-- END GENERATED TOTALS -->"


def newest_correctness():
    paths = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        sys.exit("no CORRECTNESS_r*.json found in repo root")
    return paths[-1]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else newest_correctness()
    with open(src) as f:
        data = json.load(f)

    total = len(data)
    rows_only = sorted(k for k, v in data.items() if v.get("err") == "no_oracle")
    errs = sorted(k for k, v in data.items()
                  if v.get("err") not in (None, "no_oracle"))
    paired = {k: v for k, v in data.items() if v.get("err") is None}
    green = sorted(k for k, v in paired.items()
                   if v.get("rows_match") and v.get("schema_match")
                   and v.get("hash_match"))
    failed = sorted(k for k in paired if k not in green)

    lines = [
        BEGIN,
        f"Totals from `{os.path.basename(src)}` (driver-measured, regenerated "
        "by `tools/coverage_totals.py` — do not hand-edit this block):",
        "",
        f"- **{total} contract queries**: {len(paired)} oracle-paired, "
        f"{len(rows_only)} rows-only approximate (each with a recall/error "
        "spec), " + (f"{len(errs)} erroring." if errs else "0 erroring."),
        f"- Oracle-paired green (rows+schema+hash): **{len(green)} / "
        f"{len(paired)}**."
        + (f" Failing: {', '.join('`%s`' % k for k in failed)}."
           if failed else " No failures."),
    ]
    if errs:
        lines.append(f"- Broken (driver error): "
                     f"{', '.join('`%s`' % k for k in errs)}.")
    lines.append(END)
    block = "\n".join(lines)

    cov_path = os.path.join(ROOT, "COVERAGE.md")
    with open(cov_path) as f:
        cov = f.read()
    if BEGIN in cov:
        cov = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                     cov, flags=re.S)
    else:
        sys.exit("COVERAGE.md has no GENERATED-TOTALS markers")
    with open(cov_path, "w") as f:
        f.write(cov)
    print(f"COVERAGE.md totals regenerated from {os.path.basename(src)}: "
          f"{len(green)}/{len(paired)} oracle-green, {len(rows_only)} "
          f"rows-only, {len(errs)} err")


if __name__ == "__main__":
    main()
