#!/usr/bin/env python
"""Render an rd_experiment report JSON into the docs/RD_RESULTS.md table.

Usage: python tools/rd_report.py runs/rd/rd_report.json [--label "TPU staged"]
Prints markdown to stdout; append/commit into docs/RD_RESULTS.md.
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("report")
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    with open(args.report) as f:
        rep = json.load(f)

    lambdas = rep["lambdas"]
    curves = rep["curves"]
    modes = list(curves)
    print(f"### RD points{' — ' + args.label if args.label else ''}\n")
    hdr = "| lambda | " + " | ".join(
        f"{m} bpp | {m} RGB-PSNR (dB)" for m in modes) + " |"
    print(hdr)
    print("|" + "---|" * (1 + 2 * len(modes)))
    for i, lm in enumerate(lambdas):
        cells = []
        for m in modes:
            bpp, psnr = curves[m][i]
            cells += [f"{bpp:.4f}", f"{psnr:.2f}"]
        print(f"| {lm:g} | " + " | ".join(cells) + " |")
    if "bd_rate_delta_pct" in rep:
        a, b = modes[0], modes[1]
        print(f"\nBD-rate {b} vs {a} (cubic fit over the four points): "
              f"**{rep['bd_rate_delta_pct']:+.3f}%**")


if __name__ == "__main__":
    main()
