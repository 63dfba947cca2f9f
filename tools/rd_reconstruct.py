#!/usr/bin/env python
"""Reconstruct an rd_experiment report JSON from the run log.

Insurance for a deadline-killed evaluation: `tools/rd_experiment.py`
prints every finished RD point as

    <mode> lmbda=<l>: bpp=<b> rgb-psnr=<p>

before the final report write, so a run killed mid-eval still has its
completed points in `runs/rd_log.txt`.  This tool parses those lines
(the LAST occurrence per (mode, lambda) wins — watchdog relaunches may
re-evaluate) and writes the same report schema rd_experiment would
have, including the BD-rate delta when both modes have >= 4 points.

Usage:
  python tools/rd_reconstruct.py runs/rd_log.txt --out runs/rd2/rd_report.json \
      [--modes fp32 bf16] [--lambdas 0.003 0.01 0.03 0.09]
Refuses to overwrite an existing report unless --force is given.
"""

import argparse
import json
import os
import re
import sys

LINE = re.compile(
    r"^\s*(?P<mode>\w+) lmbda=(?P<lm>[0-9.e-]+): "
    r"bpp=(?P<bpp>[0-9.]+) rgb-psnr=(?P<psnr>[0-9.]+)\s*$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--out", required=True)
    ap.add_argument("--modes", nargs="+", default=["fp32", "bf16"])
    ap.add_argument("--lambdas", type=float, nargs="+",
                    default=[0.003, 0.01, 0.03, 0.09])
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    if os.path.exists(args.out) and not args.force:
        sys.exit(f"{args.out} already exists (the run finished?); "
                 f"pass --force to overwrite")

    found = {}  # (mode, lambda) -> (bpp, psnr), last occurrence wins
    with open(args.log) as f:
        for line in f:
            m = LINE.match(line)
            if m and m.group("mode") in args.modes:
                found[(m.group("mode"), float(m.group("lm")))] = (
                    float(m.group("bpp")), float(m.group("psnr")))

    curves = {}
    for mode in args.modes:
        pts = [found[(mode, lm)] for lm in args.lambdas
               if (mode, lm) in found]
        missing = [lm for lm in args.lambdas if (mode, lm) not in found]
        if missing:
            print(f"note: mode {mode} missing lambdas {missing} "
                  f"(killed before they evaluated)", file=sys.stderr)
        if pts:
            curves[mode] = pts

    if not curves:
        sys.exit("no RD points found in the log; nothing to reconstruct")

    report = {"lambdas": args.lambdas, "curves": curves,
              "reconstructed_from": args.log}
    # Write the curves-only report FIRST: this tool exists for degenerate /
    # partial-log recoveries, exactly the cases where the BD fit below can
    # raise (non-overlapping PSNR ranges -> ValueError; a leading mode with
    # no points -> missing key).  A BD crash must not lose the curves.
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    ab = args.modes[:2]
    if all(m in curves and len(curves[m]) >= 4 for m in ab):
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from lssvc_tpu.harness.bd_rate import bd_rate

        a, b = (curves[m] for m in ab)
        try:
            report["bd_rate_delta_pct"] = bd_rate(
                [p[0] for p in a], [p[1] for p in a],
                [p[0] for p in b], [p[1] for p in b])
        except ValueError as e:
            print(f"BD-rate fit failed ({e}); curves-only report kept",
                  file=sys.stderr)
        else:
            print(f"BD-rate {ab[1]} vs {ab[0]}: "
                  f"{report['bd_rate_delta_pct']:+.3f}%")
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
    print(f"report -> {args.out}")


if __name__ == "__main__":
    main()
