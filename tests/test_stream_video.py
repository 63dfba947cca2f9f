"""Real-bitstream round-trips for the video codecs (DMCExtend, LSSVCExtend).

The decoder consumes actual rANS bytes and must reproduce the encoder-side
quantized reconstruction — the same in-process consistency check the
reference relies on (SURVEY.md §4)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from parity_utils import assert_close_mostly
from ref_oracle import import_reference


def nhwc_rand(rng, shape):
    return jnp.asarray(rng.random(shape), dtype=jnp.float32)


@pytest.fixture(scope="module")
def dmc_model():
    import_reference()
    from src.models.dmc_net import DMC as RefDMC

    from lssvc_tpu.models import DMCExtend

    torch.manual_seed(0)
    ref = RefDMC()
    m = DMCExtend.from_torch_state_dict(
        {k: v for k, v in ref.state_dict().items()
         if not k.startswith("ms_ssim_loss")})
    m.update(force=True)
    return m


def test_dmc_stream_roundtrip(dmc_model, tmp_path):
    rng = np.random.default_rng(0)
    x = nhwc_rand(rng, (1, 64, 64, 3))
    dpb = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
    }
    out_path = str(tmp_path / "p.bin")
    res = dmc_model.encode_decode_extend(x, dpb, out_path, 64, 64)
    assert res["bit"] > 0

    est = dmc_model.get_inter_layer_information(x, dpb["ref_frame_bl"],
                                                dpb["ref_feature_bl"])
    # decoded recon must match the estimated-path recon (same quantized
    # latents through the same synthesis)
    assert_close_mostly(np.asarray(res["dpb"]["ref_frame_bl"]),
                        np.asarray(jnp.clip(est["recon_image"], 0, 1)),
                        atol=1e-4)
    assert_close_mostly(np.asarray(res["dpb"]["y_hat_bl"]),
                        np.asarray(est["y_hat"]), atol=1e-3)
    assert_close_mostly(np.asarray(res["dpb"]["mv_hat_bl"]),
                        np.asarray(est["mv_hat"]), atol=1e-3)


def test_dmc_decode_profiling(dmc_model, tmp_path):
    """--decoding_profiling parity: the per-stage dict must be populated by
    a real-bitstream decode (reference declares it at
    `dmc_net_extend.py:19-47` but never fills it; we do)."""
    rng = np.random.default_rng(2)
    x = nhwc_rand(rng, (1, 64, 64, 3))
    dpb = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
    }
    dmc_model.profile_decoding = True
    dmc_model.reset_decoding_profiling()
    try:
        dmc_model.encode_decode_extend(x, dpb, str(tmp_path / "p.bin"),
                                       64, 64)
    finally:
        dmc_model.profile_decoding = False
    prof = dmc_model.get_average_decoding_profiling()
    assert prof["frames"] == 1
    assert prof["overall"] > 0
    stages = [k for k in prof if k not in ("frames", "overall")]
    assert sum(prof[k] for k in stages) > 0
    # every stage the fused decoder actually measures is present (the
    # reference's finer y_h_prior_dec / y_t_prior / rec_generation stages
    # are fused into y_prior / res_dec here — declaring keys the timer
    # never fills would report misleading zeros)
    assert set(stages) == {
        "entropy_dec_mv_z", "mv_y_prior_dec", "entropy_dec_mv_y", "mv_dec",
        "motion_compensation_ctx_refine", "entropy_dec_z", "y_prior",
        "entropy_dec_y", "res_dec"}


@pytest.fixture(scope="module")
def lssvc_model():
    import_reference()
    from src.models.LSSVC_net import LSSVC as RefLSSVC

    from lssvc_tpu.models import LSSVCExtend

    torch.manual_seed(0)
    ref = RefLSSVC()
    sd = {k: v for k, v in ref.state_dict().items() if "ms_ssim_loss" not in k}
    m = LSSVCExtend.from_torch_state_dict(sd)
    m.update(force=True)
    return m


def test_lssvc_stream_roundtrip(lssvc_model, tmp_path):
    rng = np.random.default_rng(1)
    m = lssvc_model
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    x_bl = nhwc_rand(rng, (1, 64, 64, 3))
    x_el = nhwc_rand(rng, (1, 128, 128, 3))
    dpb = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
        "ref_frame_el": nhwc_rand(rng, (1, 128, 128, 3)),
        "ref_feature_el": nhwc_rand(rng, (1, 128, 128, 48)),
    }
    res = m.encode_decode_extend(
        x_bl, x_el, dict(dpb),
        output_path_bl=str(tmp_path / "bl.bin"),
        output_path_el=str(tmp_path / "el.bin"),
        pic_width=128, pic_height=128, pic_width_bl=64, pic_height_bl=64)
    assert res["bit_bl"] > 0 and res["bit_el"] > 0

    est = m.forward_one_frame(x_bl, x_el, dpb["ref_frame_bl"],
                              dpb["ref_frame_el"], dpb["ref_feature_bl"],
                              dpb["ref_feature_el"])
    assert_close_mostly(np.asarray(res["dpb"]["ref_frame_el"]),
                        np.asarray(est["dpb"]["ref_frame_el"]), atol=1e-3,
                        max_mismatch_frac=0.01)


def test_lssvc_el_decode_profiling(lssvc_model, tmp_path):
    """--decoding_profiling on the EL stream path: LSSVCExtend carries its
    own per-stage dict (the reference only declares the BL's,
    `dmc_net_extend.py:19-47`; VERDICT r4 flagged the EL gap)."""
    rng = np.random.default_rng(3)
    m = lssvc_model
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    x_bl = nhwc_rand(rng, (1, 64, 64, 3))
    x_el = nhwc_rand(rng, (1, 128, 128, 3))
    dpb = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
        "ref_frame_el": nhwc_rand(rng, (1, 128, 128, 3)),
        "ref_feature_el": nhwc_rand(rng, (1, 128, 128, 48)),
    }
    m.profile_decoding = True
    m.reset_decoding_profiling()
    try:
        m.encode_decode_extend(
            x_bl, x_el, dict(dpb),
            output_path_bl=str(tmp_path / "bl.bin"),
            output_path_el=str(tmp_path / "el.bin"),
            pic_width=128, pic_height=128, pic_width_bl=64, pic_height_bl=64)
    finally:
        m.profile_decoding = False
    prof = m.get_average_decoding_profiling()
    assert prof["frames"] == 1
    assert prof["overall"] > 0
    stages = [k for k in prof if k not in ("frames", "overall")]
    assert set(stages) == set(m.DECODING_STAGES)
    # every declared stage must actually be filled by the timer (non-zero:
    # each bracket spans at least one host rANS call or device dispatch)
    assert all(prof[k] > 0 for k in stages), prof
    # stage sum accounts for (almost) the whole decode wall-clock
    assert sum(prof[k] for k in stages) > 0.5 * prof["overall"]


def test_closed_loop_encoder_dpb_bit_exact(lssvc_model, dmc_model, tmp_path):
    """The staged encoder's DPB must be BIT-identical to what decompress
    reconstructs from the stream — guaranteed by construction since both
    run the same jitted stage executables on the same symbol planes.  Uses
    chaotic random-init weights on purpose: any executable divergence
    (e.g. a separately-fused encoder program) amplifies to visible drift."""
    rng = np.random.default_rng(11)

    # BL alone
    x = nhwc_rand(rng, (1, 64, 64, 3))
    dpb_bl = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
    }
    enc = dmc_model.compress(x, dpb_bl)
    dec = dmc_model.decompress(enc["string"], 64, 64, dpb_bl)
    for k in ("ref_frame_bl", "ref_feature_bl", "y_hat_bl", "mv_hat_bl"):
        np.testing.assert_array_equal(np.asarray(enc["dpb"][k]),
                                      np.asarray(dec["dpb"][k]), err_msg=k)

    # two-layer
    m = lssvc_model
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    dpb = {
        "ref_frame_el": nhwc_rand(rng, (1, 128, 128, 3)),
        "ref_feature_el": nhwc_rand(rng, (1, 128, 128, 48)),
        "texture": enc["dpb"]["ref_feature_bl"],
        "y_hat_bl": enc["dpb"]["y_hat_bl"],
        "mv_hat_bl": enc["dpb"]["mv_hat_bl"],
    }
    x_el = nhwc_rand(rng, (1, 128, 128, 3))
    enc_el = m.compress(x_el, dpb)
    dec_el = m.decompress(enc_el["string"], 128, 128, dpb)
    for k in ("ref_frame_el", "ref_feature_el"):
        np.testing.assert_array_equal(np.asarray(enc_el["dpb"][k]),
                                      np.asarray(dec_el["dpb"][k]), err_msg=k)


@pytest.mark.slow
def test_pipelined_encode_matches_sequential(lssvc_model, tmp_path):
    """encode_sequence (host rANS overlapped, decoder-DPB reproduced on
    device) must produce byte-identical streams to the sequential
    encode_decode_extend loop, and end with the same DPB."""
    from lssvc_tpu.models.pipeline import encode_sequence

    rng = np.random.default_rng(7)
    m = lssvc_model
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    n_frames = 3
    xs_bl = [nhwc_rand(rng, (1, 64, 64, 3)) for _ in range(n_frames)]
    xs_el = [nhwc_rand(rng, (1, 128, 128, 3)) for _ in range(n_frames)]
    dpb0 = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
        "ref_frame_el": nhwc_rand(rng, (1, 128, 128, 3)),
        "ref_feature_el": nhwc_rand(rng, (1, 128, 128, 48)),
    }

    # sequential reference loop
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    dpb = dict(dpb0)
    seq_bits = []
    for t in range(n_frames):
        res = m.encode_decode_extend(
            xs_bl[t], xs_el[t], dict(dpb),
            output_path_bl=str(seq_dir / f"bl{t}.bin"),
            output_path_el=str(seq_dir / f"el{t}.bin"),
            pic_width=128, pic_height=128, pic_width_bl=64, pic_height_bl=64)
        seq_bits.append((res["bit_bl"], res["bit_el"]))
        dpb = dict(res["dpb"])
        # runner-parity inter-frame clamp (reference test.py:249-250) —
        # encode_sequence applies the same
        dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
        dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)

    # pipelined encoder
    pip_dir = tmp_path / "pip"
    pip_dir.mkdir()
    bl_paths = [str(pip_dir / f"bl{t}.bin") for t in range(n_frames)]
    el_paths = [str(pip_dir / f"el{t}.bin") for t in range(n_frames)]
    dpb_pip, bits = encode_sequence(m, xs_bl, xs_el, dict(dpb0),
                                    bl_paths, el_paths)

    for t in range(n_frames):
        seq_bl = (seq_dir / f"bl{t}.bin").read_bytes()
        seq_el = (seq_dir / f"el{t}.bin").read_bytes()
        assert seq_bl == (pip_dir / f"bl{t}.bin").read_bytes(), f"BL frame {t}"
        assert seq_el == (pip_dir / f"el{t}.bin").read_bytes(), f"EL frame {t}"
        assert bits[t] == seq_bits[t]
    np.testing.assert_array_equal(np.asarray(dpb_pip["ref_frame_el"]),
                                  np.asarray(dpb["ref_frame_el"]))
    np.testing.assert_array_equal(np.asarray(dpb_pip["ref_feature_bl"]),
                                  np.asarray(dpb["ref_feature_bl"]))


@pytest.mark.slow
def test_overlapped_decode_matches_serial(lssvc_model, tmp_path):
    """decode_sequence (host rANS overlapped across layers/threads) must
    reproduce the serial decompress chain's DPB bit-exactly — it runs the
    SAME jitted stages in the same per-stream order."""
    from concurrent.futures import ThreadPoolExecutor

    from lssvc_tpu.models.pipeline import (
        decode_frame_overlapped,
        decode_sequence,
    )
    from lssvc_tpu.utils.stream import decode_p

    rng = np.random.default_rng(11)
    m = lssvc_model
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    n_frames = 3
    xs_bl = [nhwc_rand(rng, (1, 64, 64, 3)) for _ in range(n_frames)]
    xs_el = [nhwc_rand(rng, (1, 128, 128, 3)) for _ in range(n_frames)]
    dpb0 = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
        "ref_frame_el": nhwc_rand(rng, (1, 128, 128, 3)),
        "ref_feature_el": nhwc_rand(rng, (1, 128, 128, 48)),
    }

    # encode a chain (sequential path); keep the serial decode DPBs
    bl_paths, el_paths, serial_dpbs = [], [], []
    dpb = dict(dpb0)
    for t in range(n_frames):
        pb = str(tmp_path / f"bl{t}.bin")
        pe = str(tmp_path / f"el{t}.bin")
        res = m.encode_decode_extend(
            xs_bl[t], xs_el[t], dict(dpb), output_path_bl=pb,
            output_path_el=pe, pic_width=128, pic_height=128,
            pic_width_bl=64, pic_height_bl=64)
        serial_dpbs.append(res["dpb"])
        dpb = dict(res["dpb"])
        dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
        dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)
        bl_paths.append(pb)
        el_paths.append(pe)

    # overlapped decode, frame by frame, checking every DPB leaf
    dpb = dict(dpb0)
    with ThreadPoolExecutor(max_workers=1) as pool:
        for t in range(n_frames):
            out = decode_frame_overlapped(
                m, decode_p(bl_paths[t]), decode_p(el_paths[t]),
                64, 64, 128, 128, dpb, pool)
            dpb = dict(out["dpb"])
            for key in ("ref_frame_bl", "ref_feature_bl", "ref_frame_el",
                        "ref_feature_el"):
                np.testing.assert_array_equal(
                    np.asarray(dpb[key]), np.asarray(serial_dpbs[t][key]),
                    err_msg=f"frame {t} {key}")
            assert out["context"] is not None
            dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
            dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)

    # the sequence driver wraps the same per-frame path
    dpb_seq = decode_sequence(m, bl_paths, el_paths, dict(dpb0),
                              64, 64, 128, 128)
    # decode_sequence returns the CLAMPED final DPB (runner parity)
    np.testing.assert_array_equal(
        np.asarray(dpb_seq["ref_frame_el"]),
        np.asarray(jnp.clip(serial_dpbs[-1]["ref_frame_el"], 0.0, 1.0)))


def test_closed_loop_bit_exact_with_decoding_profiling(dmc_model):
    """--decoding_profiling swaps the decoder's fused context stage for the
    split mv_only + mc_only executables; the encoder must run the SAME
    split executables (compress reads model.profile_decoding) or a last-bit
    fusion difference can flip a scale-index bucket and desync the
    y-plane decode."""
    rng = np.random.default_rng(23)
    x = nhwc_rand(rng, (1, 64, 64, 3))
    dpb_bl = {
        "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
        "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
    }
    m = dmc_model
    m.profile_decoding = True
    try:
        m.reset_decoding_profiling()
        enc = m.compress(x, dpb_bl)
        dec = m.decompress(enc["string"], 64, 64, dpb_bl)
    finally:
        m.profile_decoding = False
    for k in ("ref_frame_bl", "ref_feature_bl", "y_hat_bl", "mv_hat_bl"):
        np.testing.assert_array_equal(np.asarray(enc["dpb"][k]),
                                      np.asarray(dec["dpb"][k]), err_msg=k)
    prof = m.get_average_decoding_profiling()
    assert prof and all(v >= 0 for v in prof.values())


@pytest.mark.slow
def test_lssvc_stream_roundtrip_int8(lssvc_model, tmp_path):
    """--precision int8 closed-loop contract: with a calibration table
    installed and int8 mode on, real-bitstream encode/decode must stay
    self-consistent (decoder reproduces the estimated-path recon computed
    in the SAME mode).  Guards the rANS-desync risk of quantized conv
    sites feeding the scale-index planes."""
    from lssvc_tpu.harness.calibrate import calibrate_video
    from lssvc_tpu.ops import int8 as q8
    from lssvc_tpu.ops import set_precision_mode
    from lssvc_tpu.ops.nn import set_packed_width

    import jax

    rng = np.random.default_rng(5)
    m = lssvc_model
    try:
        set_precision_mode("bf16")
        set_packed_width(2)
        q8.set_calibration(calibrate_video(m.params, size=128, frames=2))
        set_precision_mode("int8")
        jax.clear_caches()  # drop fp32-mode executables (aval-keyed)

        m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
        x_bl = nhwc_rand(rng, (1, 64, 64, 3))
        x_el = nhwc_rand(rng, (1, 128, 128, 3))
        dpb = {
            "ref_frame_bl": nhwc_rand(rng, (1, 64, 64, 3)),
            "ref_feature_bl": nhwc_rand(rng, (1, 64, 64, 64)),
            "ref_frame_el": nhwc_rand(rng, (1, 128, 128, 3)),
            "ref_feature_el": nhwc_rand(rng, (1, 128, 128, 48)),
        }
        res = m.encode_decode_extend(
            x_bl, x_el, dict(dpb),
            output_path_bl=str(tmp_path / "bl8.bin"),
            output_path_el=str(tmp_path / "el8.bin"),
            pic_width=128, pic_height=128, pic_width_bl=64, pic_height_bl=64)
        assert res["bit_bl"] > 0 and res["bit_el"] > 0
        assert q8.served_sites(), "int8 sites never fired in stream mode"

        est = m.forward_one_frame(x_bl, x_el, dpb["ref_frame_bl"],
                                  dpb["ref_frame_el"],
                                  dpb["ref_feature_bl"],
                                  dpb["ref_feature_el"])
        # bf16 closed-loop tolerance (matches the bf16 roundtrip bound)
        assert_close_mostly(np.asarray(res["dpb"]["ref_frame_el"],
                                       np.float32),
                            np.asarray(est["dpb"]["ref_frame_el"],
                                       np.float32),
                            atol=2e-2, rtol=1e-2, max_mismatch_frac=0.02)
    finally:
        set_precision_mode("fp32")
        set_packed_width(1)
        q8.set_calibration({})
        jax.clear_caches()


def test_sanitize_dpb_bounds_recurrence():
    """sanitize_dpb: non-finite / exploded DPB entries are bounded (frames
    to [0,1], features to +-1024), healthy entries pass bit-identical, and
    None/meta values survive — the serving guard that keeps reference-
    protocol GOP-32 chains encodable past the trained chain length."""
    import jax.numpy as jnp

    from lssvc_tpu.utils.checks import sanitize_dpb

    poisoned = {
        "ref_frame_el": jnp.array([0.25, 1.5, -50.0, float("nan")]),
        "ref_feature_el": jnp.array([3.0, 1e9, float("-inf"),
                                     float("nan"), -4000.0]),
        "mv_bl_hat": None,
    }
    s = sanitize_dpb(poisoned)
    frame = np.asarray(s["ref_frame_el"])
    feat = np.asarray(s["ref_feature_el"])
    assert np.all(np.isfinite(frame)) and np.all(np.isfinite(feat))
    # frames bound at +-8 (NOT [0,1] -- closed-loop parity at random
    # init; see sanitize_dpb docstring), features at +-1024
    assert np.abs(frame).max() <= 8.0
    assert np.abs(feat).max() <= 65536.0
    # healthy / mildly-out-of-range values untouched
    assert frame[0] == 0.25 and frame[1] == 1.5 and feat[0] == 3.0
    assert feat[4] == -4000.0  # random-init texture range passes through
    assert s["mv_bl_hat"] is None

    healthy = {"ref_frame_el": jnp.array([-1.5, 0.5, 2.0]),
               "ref_feature_el": jnp.array([-512.0, 17.25, 3600.0])}
    s2 = sanitize_dpb(healthy)
    for k in healthy:
        np.testing.assert_array_equal(np.asarray(s2[k]),
                                      np.asarray(healthy[k]))

    import os

    os.environ["LSSVC_DPB_SANITIZE"] = "0"
    try:
        assert sanitize_dpb(poisoned) is poisoned  # opt-out passthrough
    finally:
        del os.environ["LSSVC_DPB_SANITIZE"]
