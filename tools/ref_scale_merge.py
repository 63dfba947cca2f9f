#!/usr/bin/env python
"""Merge per-rate-point test.py output dirs into one reference-schema set.

tools/round4_chip.sh runs the reference-scale eval as one test.py call per
rate point (so a wall-clock kill keeps completed points); each call writes
`{ratio}_{BL,EL,FL}.json` with a single checkpoint key under
logs[ds][seq].  This tool deep-merges those files into the combined
4-rate-point JSONs the reference commits (e.g.
`/root/reference/json_results/LSSVC/IP32/x2_FL.json`: one file, all rate
points as sibling checkpoint keys).

Usage: python tools/ref_scale_merge.py OUT_DIR... --out MERGED_DIR
"""

import argparse
import glob
import json
import os


def deep_merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+", help="per-point output dirs, in order")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    merged = {}  # filename -> merged log dict
    n_in = 0
    for d in args.dirs:
        for path in sorted(glob.glob(os.path.join(d, "*_*.json"))):
            name = os.path.basename(path)
            with open(path) as f:
                log = json.load(f)
            deep_merge(merged.setdefault(name, {}), log)
            n_in += 1
    if not merged:
        print(f"ref_scale_merge: no {{ratio}}_{{layer}}.json found under "
              f"{args.dirs}")
        return 1
    os.makedirs(args.out, exist_ok=True)
    for name, log in merged.items():
        with open(os.path.join(args.out, name), "w") as f:
            json.dump(log, f, indent=2)
    points = set()
    for log in merged.values():
        for ds in log.values():
            for seq in ds.values():
                points.update(seq.keys())
    print(f"ref_scale_merge: merged {n_in} files -> {len(merged)} in "
          f"{args.out}; rate points: {sorted(points)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
