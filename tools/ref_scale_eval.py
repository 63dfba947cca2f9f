#!/usr/bin/env python
"""Reference-scale evaluation fixture: a 96-frame 1080p synthetic YUV
sequence + the dataset config JSON for `test.py`.

The reference's committed results are 96-frame real sequences (e.g.
BQTerrace 1920x1080, `/root/reference/json_results/LSSVC/IP32/x2_FL.json`;
cmdlines `README.md:50-163`).  No real dataset exists on this box, so the
scale demonstration uses synthetic content with codec-relevant structure:
a smooth panning texture (global motion for the MV path), two moving
occluders (edges + disocclusions earn bits), and a slow global brightness
drift (keeps P-frame residuals non-degenerate over a 32-frame GOP).

Usage:
  python tools/ref_scale_eval.py --out runs/ref_scale [--frames 96]
prints the test.py invocation for the four rd2 rate points.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_1080p(path, n_frames, h=1080, w=1920, seed=11):
    from lssvc_tpu.utils.color import rgb_to_ycbcr420
    from lssvc_tpu.utils.io import YUVWriter

    rng = np.random.default_rng(seed)
    # 16x-upsampled smooth texture, made wide enough to pan across
    small = rng.random((h // 16 + 16, w // 16 + 16, 3)).astype(np.float32)
    base = np.repeat(np.repeat(small, 16, axis=0), 16, axis=1)
    sq1, sq2 = h // 8, h // 5
    c1 = rng.random(3).astype(np.float32)
    c2 = rng.random(3).astype(np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wtr = YUVWriter(path, w, h)
    for t in range(n_frames):
        ox = int(2.0 * t) % (base.shape[1] - w)
        oy = int(1.0 * t) % (base.shape[0] - h)
        f = base[oy:oy + h, ox:ox + w].copy()
        y1 = (h // 4 + 3 * t) % (h - sq1)
        x1 = (w // 5 + 5 * t) % (w - sq1)
        f[y1:y1 + sq1, x1:x1 + sq1] = c1
        y2 = (h // 2 + int(1.5 * t)) % (h - sq2)
        x2 = (w // 2 - 4 * t) % (w - sq2)
        f[y2:y2 + sq2, x2:x2 + sq2] = c2
        f = np.clip(f * (0.9 + 0.1 * np.cos(2 * np.pi * t / n_frames)),
                    0.0, 1.0)
        y, uv = rgb_to_ycbcr420(f.transpose(2, 0, 1))
        wtr.write_one_frame(y=y, uv=uv, src_format="420")
    wtr.close()
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/ref_scale")
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--gop", type=int, default=32)
    args = p.parse_args()

    seq_dir = os.path.join(args.out, "ds", "seq1080")
    yuv = os.path.join(seq_dir, "x1.yuv")
    if not os.path.exists(yuv):
        synth_1080p(yuv, args.frames)
        print(f"wrote {yuv}")
    cfg = {"SYN1080": {
        "test": 1,
        "base_path": os.path.join(args.out, "ds"),
        "x1": {"width": 1920, "height": 1080},
        "x2": {"width": 960, "height": 540},
        "sequences": {"seq1080": {"frames": args.frames, "gop": args.gop}},
    }}
    cfg_path = os.path.join(args.out, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {cfg_path}")

    lambdas = ["0p003", "0p01", "0p03", "0p09"]
    intra = " ".join(f"runs/rd2/intra_l{t}_step2000.npz" for t in lambdas)
    video = " ".join(f"runs/rd2/video_l{t}_ft_step600.npz" for t in lambdas)
    print("run:\n"
          f"python test.py --test_config {cfg_path} \\\n"
          f"  --i_frame_model_path {intra} \\\n"
          f"  --model_path {video} \\\n"
          f"  --write_stream 1 --precision bf16 --ratios x2 --worker 1 \\\n"
          f"  --stream_path {args.out}/bins --output_path {args.out}/out")


if __name__ == "__main__":
    main()
