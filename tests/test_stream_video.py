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
    # every stage key the reference declares is present
    assert set(stages) == {
        "entropy_dec_mv_z", "mv_y_prior_dec", "entropy_dec_mv_y", "mv_dec",
        "motion_compensation_ctx_refine", "entropy_dec_z", "y_h_prior_dec",
        "y_t_prior", "y_prior", "entropy_dec_y", "res_dec", "rec_generation"}


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
