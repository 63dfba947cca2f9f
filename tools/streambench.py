#!/usr/bin/env python
"""Real-bitstream serving benchmark: pipelined vs sequential encoder.

Measures the end-to-end two-layer ENCODE path (device compute + host rANS
+ container writes) at 1080p+540p:

  sequential : per-frame compress() — host entropy coding blocks the chip
  pipelined  : pipeline.encode_sequence — host coding overlapped on a
               worker thread; streams are byte-identical

and, for context, the full sequential encode_decode_extend (enc+dec, the
reference-parity loop).  Run on the TPU (axon); CPU works but measures
nothing interesting.

Usage: python tools/streambench.py [--frames 8] [--hw 1152x1920]
       [--mode bf16]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    import numpy as np

    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.models.lssvc import LSSVCExtend
    from lssvc_tpu.models import pipeline
    from lssvc_tpu.ops import set_precision_mode

    frames = 8
    el_hw = (1152, 1920)
    mode = "bf16"
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    if "--hw" in sys.argv:
        el_hw = tuple(int(v) for v in
                      sys.argv[sys.argv.index("--hw") + 1].split("x"))
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]

    set_precision_mode(mode)
    bl_hw = (el_hw[0] // 2, el_hw[1] // 2)

    m = LSSVCExtend(init_lssvc(0))
    m.set_scale_information(2.0, el_hw, (0, 0, 0, 0))
    m.update(force=True)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    xs_bl = [jax.random.uniform(k, (1, *bl_hw, 3))
             for k in jax.random.split(ks[0], frames)]
    xs_el = [jax.random.uniform(k, (1, *el_hw, 3))
             for k in jax.random.split(ks[1], frames)]
    dpb0 = {
        "ref_frame_bl": jax.random.uniform(ks[2], (1, *bl_hw, 3)),
        "ref_frame_el": jax.random.uniform(ks[3], (1, *el_hw, 3)),
        "ref_feature_bl": jax.random.uniform(ks[4], (1, *bl_hw, 64)),
        "ref_feature_el": jax.random.uniform(ks[5], (1, *el_hw, 48)),
    }

    td = tempfile.mkdtemp()
    paths = lambda tag: ([os.path.join(td, f"{tag}_bl{t}.bin")
                          for t in range(frames)],
                         [os.path.join(td, f"{tag}_el{t}.bin")
                          for t in range(frames)])

    def run_pipelined(tag):
        bl_paths, el_paths = paths(tag)
        t0 = time.time()
        dpb, bits = pipeline.encode_sequence(m, xs_bl, xs_el, dict(dpb0),
                                             bl_paths, el_paths)
        jax.block_until_ready(dpb["ref_frame_el"])
        return time.time() - t0, bits

    def run_sequential(tag):
        from lssvc_tpu.models import dmc_stream as ds
        from lssvc_tpu.models import lssvc_stream as ls
        from lssvc_tpu.utils.stream import encode_p, filesize

        bl_paths, el_paths = paths(tag)
        dpb = dict(dpb0)
        bits = []
        t0 = time.time()
        bl = m.base_layer_model
        for t in range(frames):
            enc_bl = bl.compress(xs_bl[t], dpb)
            encode_p(enc_bl["string"], bl_paths[t])
            dpb_el = {"texture": enc_bl["dpb"]["ref_feature_bl"],
                      "y_hat_bl": enc_bl["dpb"]["y_hat_bl"],
                      "mv_hat_bl": enc_bl["dpb"]["mv_hat_bl"],
                      "ref_frame_el": dpb["ref_frame_el"],
                      "ref_feature_el": dpb["ref_feature_el"]}
            enc_el = m.compress(xs_el[t], dpb_el)
            encode_p(enc_el["string"], el_paths[t])
            bits.append((filesize(bl_paths[t]) * 8,
                         filesize(el_paths[t]) * 8))
            dpb = {"ref_frame_bl": enc_bl["dpb"]["ref_frame_bl"],
                   "ref_feature_bl": enc_bl["dpb"]["ref_feature_bl"],
                   "ref_frame_el": enc_el["dpb"]["ref_frame_el"],
                   "ref_feature_el": enc_el["dpb"]["ref_feature_el"]}
        jax.block_until_ready(dpb["ref_frame_el"])
        return time.time() - t0, bits

    # warm both paths (compiles shared between them)
    run_sequential("warm_seq")
    run_pipelined("warm_pip")

    t_seq, bits_seq = run_sequential("seq")
    t_pip, bits_pip = run_pipelined("pip")
    assert bits_seq == bits_pip, "pipelined streams diverge from sequential"

    sum_bits = sum(b[0] + b[1] for b in bits_seq) / frames
    print(f"frames={frames} el_hw={el_hw} mode={mode} "
          f"avg_bits/frame={sum_bits:.0f}")
    print(f"sequential encode : {t_seq / frames * 1e3:8.1f} ms/frame "
          f"({frames / t_seq:.3f} fps)")
    print(f"pipelined  encode : {t_pip / frames * 1e3:8.1f} ms/frame "
          f"({frames / t_pip:.3f} fps)  speedup {t_seq / t_pip:.2f}x")


if __name__ == "__main__":
    main()
