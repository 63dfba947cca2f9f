#!/usr/bin/env python
"""Produce an int8 activation-calibration table for the serving path.

Runs the two-layer P-frame forward (models/lssvc.py forward_one_frame)
in the width-packed bf16 domain with the trace-time absmax recorder
active (ops/int8.py `recording`), over a few chained synthetic-motion
frames, and writes {shape-qualified scope prefix: activation scale} JSON
(lssvc_tpu/harness/calibrate.py does the work).

The table feeds `--precision int8 --int8_calib <json>` in test.py /
decode.py and `bench.py --mode int8_packed --ckpt ...` (which can also
self-calibrate).  Scales are per-tensor symmetric (absmax/127); weights
are quantized per-output-channel at trace time and need no table.

Usage:
  python tools/int8_calibrate.py --out calib.json [--ckpt video.npz]
      [--size 512] [--frames 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lssvc_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="video model checkpoint (train.py npz); "
                         "random init if omitted")
    ap.add_argument("--size", type=int, default=512,
                    help="EL height=width for the calibration forward "
                         "(per-tensor scales are shape-independent)")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--margin", type=float, default=1.0)
    args = ap.parse_args()

    from lssvc_tpu.harness.calibrate import calibrate_video
    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.ops import set_precision_mode
    from lssvc_tpu.ops.nn import set_packed_width
    from lssvc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    set_precision_mode("bf16")
    set_packed_width(2)
    if args.ckpt:
        from lssvc_tpu.checkpoint import load_params

        params, _ = load_params(args.ckpt)
    else:
        params = init_lssvc(0)

    table = calibrate_video(params, size=args.size, frames=args.frames,
                            margin=args.margin)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2, sort_keys=True)
    print(f"{len(table)} scales -> {args.out}")


if __name__ == "__main__":
    main()
