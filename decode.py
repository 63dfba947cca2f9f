#!/usr/bin/env python
"""Standalone two-layer decoder CLI.

Decodes per-frame .bin pairs (`<bin_dir>/BL/<t>.bin`, `<bin_dir>/EL/<t>.bin`
— the layout `test.py --write_stream 1` produces) back to YUV, without the
encoder.  The reference has no decode-only entry point (its test.py always
re-encodes in-process, `test.py:219-247` / SURVEY §3.4); a deployment
decoder is exactly this loop: host rANS + the staged device decode programs,
DPB resident on device, reference-parity in-place clamping between frames.

Usage:
  python decode.py --bin_dir bins/seq/0/x2 --i_frame_model_path i.pth \
      --model_path v.pth --height 1080 --width 1920 --ratio x2 --gop 32 \
      --frame_num 96 --yuv_out dec_el.yuv [--yuv_out_bl dec_bl.yuv]

Model paths accept torch .pth checkpoints or native .npz (checkpoint.py).
"""

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--bin_dir", required=True,
                   help="directory containing BL/ and EL/ per-frame bins")
    p.add_argument("--i_frame_model_path", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--height", type=int, required=True,
                   help="original EL height (pre-padding)")
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--ratio", default="x2",
                   choices=["x1_5", "x2", "x3", "x4"])
    p.add_argument("--gop", type=int, default=32)
    p.add_argument("--frame_num", type=int, required=True)
    p.add_argument("--yuv_out", required=True, help="EL output YUV path")
    p.add_argument("--yuv_out_bl", default=None, help="BL output YUV path")
    p.add_argument("--precision", default="fp32",
                   choices=["fp32", "high", "bf16", "int8"],
                   help="MUST match the precision the stream was encoded "
                        "with: the scale-index planes are derived by the "
                        "same jitted stages on both sides, and a "
                        "precision mismatch flips quantized index buckets "
                        "and desynchronizes the rANS stream (closed-loop "
                        "contract, models/dmc_stream.py)")
    p.add_argument("--int8_calib", default=None,
                   help="for --precision int8: the SAME calibration table "
                        "the encoder used (tools/int8_calibrate.py)")
    return p.parse_args()


def main():
    args = parse_args()

    # honor JAX_PLATFORMS=cpu (the sitecustomize registers the TPU backend
    # at interpreter start; env alone is ignored) — same as test.py/train.py
    from lssvc_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lssvc_tpu.ops.nn import apply_precision_cli
    from lssvc_tpu.parallel.scheduler import _load_net as load_model
    from lssvc_tpu.utils.cache import enable_compile_cache

    apply_precision_cli(args.precision, args.int8_calib)
    enable_compile_cache()

    from lssvc_tpu.harness.runner import RATIO_FACTORS, _to_host_chw
    from lssvc_tpu.models import IntraSS
    from lssvc_tpu.models.intra_ss_stream import decompress_stream
    from lssvc_tpu.models.lssvc import LSSVCExtend
    from lssvc_tpu.ops import pad_nhwc
    from lssvc_tpu.utils.color import rgb_to_ycbcr420
    from lssvc_tpu.utils.io import YUVWriter
    from lssvc_tpu.utils.padding import (
        get_interlayer_padding,
        inverse_padding_size,
    )
    from lssvc_tpu.utils.stream import decode_p

    scale_factor = RATIO_FACTORS[args.ratio]
    pad_info = get_interlayer_padding(H_HR=args.height, W_HR=args.width,
                                      ratio=scale_factor)
    p_size_el = pad_info["P_HR"]
    p_size_bl = pad_info["P_LR"]
    hb_pad, wb_pad = pad_info["LR_padded_size"]
    he_pad, we_pad = pad_info["HR_padded_size"]
    hb, wb = pad_info["LR_size"]
    he, we = pad_info["HR_size"]

    i_net = load_model(IntraSS, args.i_frame_model_path)
    v_net = load_model(LSSVCExtend, args.model_path)
    for m in (i_net, v_net):
        m.set_scale_information(scale_factor, (he_pad, we_pad), (0, 0, 0, 0))
        m.update(force=True)

    writer_el = YUVWriter(args.yuv_out, we, he)
    writer_bl = YUVWriter(args.yuv_out_bl, wb, hb) if args.yuv_out_bl else None

    dpb = None
    t0 = time.time()
    for t in range(args.frame_num):
        bin_bl = os.path.join(args.bin_dir, "BL", f"{t}.bin")
        bin_el = os.path.join(args.bin_dir, "EL", f"{t}.bin")
        if t % args.gop == 0:
            res = decompress_stream(i_net, bin_bl, bin_el)
            dpb = {"ref_frame_bl": res["x_hat_bl"],
                   "ref_frame_el": res["x_hat_el"],
                   "ref_feature_bl": None,
                   "ref_feature_el": res["feature_el"]}
        else:
            bl_res = v_net.base_layer_model.decompress(
                decode_p(bin_bl), hb_pad, wb_pad, dpb)
            dpb_el = dict(dpb)
            dpb_el["texture"] = bl_res["dpb"]["ref_feature_bl"]
            dpb_el["y_hat_bl"] = bl_res["dpb"]["y_hat_bl"]
            dpb_el["mv_hat_bl"] = bl_res["dpb"]["mv_hat_bl"]
            el_res = v_net.decompress(decode_p(bin_el), he_pad, we_pad,
                                      dpb_el)
            dpb = {"ref_frame_bl": bl_res["dpb"]["ref_frame_bl"],
                   "ref_feature_bl": bl_res["dpb"]["ref_feature_bl"],
                   "ref_frame_el": el_res["dpb"]["ref_frame_el"],
                   "ref_feature_el": el_res["dpb"]["ref_feature_el"]}
        # reference clamps the DPB frames in place between frames
        dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
        dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)

        x_el = _to_host_chw(pad_nhwc(dpb["ref_frame_el"],
                                     inverse_padding_size(p_size_el)))
        y, uv = rgb_to_ycbcr420(x_el)
        writer_el.write_one_frame(y=y, uv=uv, src_format="420")
        if writer_bl is not None:
            x_bl = _to_host_chw(pad_nhwc(dpb["ref_frame_bl"],
                                         inverse_padding_size(p_size_bl)))
            yb, uvb = rgb_to_ycbcr420(x_bl)
            writer_bl.write_one_frame(y=yb, uv=uvb, src_format="420")

    dt = time.time() - t0
    print(f"decoded {args.frame_num} frames in {dt:.2f}s "
          f"({args.frame_num / dt:.3f} fps) -> {args.yuv_out}")


if __name__ == "__main__":
    main()
