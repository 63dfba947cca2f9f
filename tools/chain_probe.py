#!/usr/bin/env python
"""Per-frame EL-PSNR probe over a GOP chain — the fast steady-state
health check for a trained checkpoint pair.

A healthy codec degrades gently along the P-frame chain; an untrained
steady-state path (the round-4 eval collapse: cascade chains truncated
to T=2 never trained the 48ch-feature P configuration) shows a cliff
between P-frame 1 (feature=None, the trained config) and P-frame 2.

Usage:
  JAX_PLATFORMS=cpu python tools/chain_probe.py \
      --video runs/rd2/video_l0p01_ft_step600.npz \
      --intra runs/rd2/intra_l0p01_step2000.npz [--frames 6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lssvc_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True)
    ap.add_argument("--intra", required=True)
    ap.add_argument("--yuv", default="runs/rd2/eval_ds/eval/x1.yuv")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    import jax.numpy as jnp

    from lssvc_tpu.checkpoint import load_params
    from lssvc_tpu.models.intra_ss import IntraSS
    from lssvc_tpu.models.lssvc import LSSVCExtend
    from lssvc_tpu.ops import set_precision_mode
    from lssvc_tpu.ops.nn import set_packed_width
    from lssvc_tpu.utils.color import ycbcr420_to_rgb
    from lssvc_tpu.utils.io import YUVReader
    from lssvc_tpu.utils.resize import imresize

    set_precision_mode(args.precision)
    set_packed_width(2 if args.precision in ("bf16", "int8") else 1)

    vnet = LSSVCExtend(load_params(args.video)[0])
    inet = IntraSS(load_params(args.intra)[0], channel_BL=192)
    size = args.size
    r = YUVReader(args.yuv, size, size)
    frames = []
    for _ in range(args.frames):
        y, uv = r.read_one_frame(dst_format="420")
        frames.append(ycbcr420_to_rgb(y, uv))
    vnet.set_scale_information(2.0, (size, size), (0, 0, 0, 0))
    inet.set_scale_information(2.0, (size, size), (0, 0, 0, 0))

    def nhwc(x):
        return jnp.asarray(x[None].transpose(0, 2, 3, 1))

    dpb = None
    psnrs = []
    for t in range(args.frames):
        x_el = nhwc(frames[t])
        x_bl = jnp.asarray(np.asarray(imresize(
            jnp.asarray(frames[t][None]),
            sizes=(size // 2, size // 2))).transpose(0, 2, 3, 1))
        if t == 0:
            out = inet.forward(x_bl, x_el)
            rec = np.clip(np.asarray(out["x_hat_el"]), 0, 1)
            dpb = {"ref_frame_bl": jnp.clip(out.get("x_hat_bl", x_bl), 0, 1),
                   "ref_frame_el": jnp.clip(out["x_hat_el"], 0, 1),
                   "ref_feature_bl": None, "ref_feature_el": None}
        else:
            o = vnet.forward_one_frame(x_bl, x_el, dpb["ref_frame_bl"],
                                       dpb["ref_frame_el"],
                                       dpb["ref_feature_bl"],
                                       dpb["ref_feature_el"])
            rec = np.clip(np.asarray(o["dpb"]["ref_frame_el"]), 0, 1)
            dpb = dict(o["dpb"])
            dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0, 1)
            dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0, 1)
        mse = float(np.mean((rec - np.asarray(x_el)) ** 2))
        p = 10 * np.log10(1.0 / max(mse, 1e-12))
        psnrs.append(p)
        print(f"frame {t}: EL rgb psnr {p:.2f} dB", flush=True)
    # cliff detector: P2 must hold at least half of P1's dB (collapse
    # measured ~19 -> ~8 dB; healthy chains lose < 2 dB)
    if args.frames >= 3 and psnrs[2] < 0.6 * psnrs[1]:
        print(f"STEADY-STATE CLIFF: P1 {psnrs[1]:.1f} dB -> "
              f"P2 {psnrs[2]:.1f} dB", flush=True)
        raise SystemExit(1)
    print("chain healthy", flush=True)


if __name__ == "__main__":
    main()
