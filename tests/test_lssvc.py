"""Golden parity: LSSVC two-layer P-frame codec vs the reference torch impl."""

import numpy as np

from parity_utils import assert_close_mostly, assert_rel_rms
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.models import LSSVC
from ref_oracle import import_reference


def nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def models():
    import_reference()
    from src.models.LSSVC_net import LSSVC as RefLSSVC

    torch.manual_seed(0)
    ref = RefLSSVC()
    ref.eval()
    sd = {k: v for k, v in ref.state_dict().items() if "ms_ssim_loss" not in k}
    ours = LSSVC.from_torch_state_dict(sd)
    return ref, ours


def test_lssvc_forward_parity(models):
    ref, ours = models
    torch.manual_seed(1)
    x_el = torch.rand(1, 3, 128, 128)
    x_bl = torch.rand(1, 3, 64, 64)
    ref_frame_bl = torch.rand(1, 3, 64, 64)
    ref_frame_el = torch.rand(1, 3, 128, 128)
    ref_feature_bl = torch.rand(1, 64, 64, 64)
    ref_feature_el = torch.rand(1, 48, 128, 128)

    ref.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    with torch.no_grad():
        r = ref.forward_one_frame(x_bl, x_el, ref_frame_bl, ref_frame_el,
                                  ref_feature_bl, ref_feature_el)

    ours.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    o = ours.forward_one_frame(nhwc(x_bl), nhwc(x_el), nhwc(ref_frame_bl),
                               nhwc(ref_frame_el), nhwc(ref_feature_bl),
                               nhwc(ref_feature_el))

    # random-init latents are huge, so a handful of fp32 round-tie flips
    # (each clamped at 50 bits) shift totals by ~1e-3 relative
    assert abs(float(o["bit_bl"]) - r["bit_bl"]) / max(r["bit_bl"], 1) < 3e-3
    assert abs(float(o["bit_el"]) - r["bit_el"]) / max(r["bit_el"], 1) < 3e-3
    # recons pass through random-init decoders with activations in the
    # thousands; torch-CPU vs XLA-CPU op-order flips a few latent round
    # ties, which the chaotic decoders spread over broad regions.  Measured
    # noise floor ~1% relative RMS; wiring bugs give ~100%.
    assert_rel_rms(
        np.asarray(o["dpb"]["ref_frame_el"]).transpose(0, 3, 1, 2),
        r["dpb"]["ref_frame_el"].numpy())
    assert_rel_rms(
        np.asarray(o["dpb"]["ref_frame_bl"]).transpose(0, 3, 1, 2),
        r["dpb"]["ref_frame_bl"].numpy())
    assert_close_mostly(
        np.asarray(o["mv_hat"]).transpose(0, 3, 1, 2),
        r["mv_hat"].numpy())


def test_packed_ctx_path_matches_default(models, monkeypatch):
    """LSSVC_PACKED_CTX=1 (fused packed pair-warp store + permuted-kernel
    OffsetDiversity entry conv) must match the default path.  Only the
    entry conv's channel contraction ORDER differs (plus exact pack
    reshapes), so agreement is tight."""
    import jax

    import lssvc_tpu.models.lssvc as L
    from lssvc_tpu.convert import P
    from lssvc_tpu.ops.nn import set_packed_width

    _, ours = models
    rng = np.random.default_rng(9)
    ref_el = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    feat = jnp.asarray(rng.random((1, 64, 64, 48)), jnp.float32)
    mv = jnp.asarray(rng.uniform(-1.5, 1.5, (1, 64, 64, 2)), jnp.float32)
    p = P(ours.params)
    set_packed_width(2)
    try:
        ctx_a, wf_a = L.el_motion_compensation(p, ref_el, feat, mv)
        monkeypatch.setattr(L, "_PACKED_CTX", True)
        jax.clear_caches()
        ctx_b, wf_b = L.el_motion_compensation(p, ref_el, feat, mv)
    finally:
        set_packed_width(1)
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(wf_b), np.asarray(wf_a),
                               atol=1e-5)
    for i, (a, b) in enumerate(zip(ctx_a, ctx_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=1e-3, err_msg=f"c{i+1}")


@pytest.mark.slow
def test_lssvc_staged_forward_matches_fused(models):
    """forward_one_frame_staged (two XLA programs, low-peak-HBM serving
    path for batch-of-sequences) must track the fused program; exact
    equality is not expected (different fusion), so use the same noise
    floor as the torch parity tests."""
    from lssvc_tpu.models import lssvc as lssvc_mod

    _, ours = models
    rng = np.random.default_rng(21)

    def arr(shape):
        return jnp.asarray(rng.random(shape), dtype=jnp.float32)

    args = (arr((2, 64, 64, 3)), arr((2, 128, 128, 3)),
            arr((2, 64, 64, 3)), arr((2, 128, 128, 3)),
            arr((2, 64, 64, 64)), arr((2, 128, 128, 48)))
    fused = lssvc_mod.forward_one_frame(ours.params, *args, (128, 128), 2.0,
                                        (0, 0, 0, 0))
    staged = lssvc_mod.forward_one_frame_staged(ours.params, *args,
                                                (128, 128), 2.0,
                                                (0, 0, 0, 0))
    assert_rel_rms(np.asarray(staged["dpb"]["ref_frame_el"]),
                   np.asarray(fused["dpb"]["ref_frame_el"]))
    assert_rel_rms(np.asarray(staged["dpb"]["ref_frame_bl"]),
                   np.asarray(fused["dpb"]["ref_frame_bl"]))
    for k in ("bit_bl", "bit_el"):
        a, b = float(staged[k]), float(fused[k])
        assert abs(a - b) / max(abs(b), 1.0) < 3e-3, (k, a, b)


def test_lssvc_first_p_frame(models):
    """After an I-frame: BL feature None, EL feature 64-ch (IntraSS output)."""
    ref, ours = models
    torch.manual_seed(2)
    x_el = torch.rand(1, 3, 128, 128)
    x_bl = torch.rand(1, 3, 64, 64)
    ref_frame_bl = torch.rand(1, 3, 64, 64)
    ref_frame_el = torch.rand(1, 3, 128, 128)
    ref_feature_el = torch.rand(1, 64, 128, 128)  # first-P adaptor path

    ref.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    with torch.no_grad():
        r = ref.forward_one_frame(x_bl, x_el, ref_frame_bl, ref_frame_el,
                                  None, ref_feature_el)

    ours.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    o = ours.forward_one_frame(nhwc(x_bl), nhwc(x_el), nhwc(ref_frame_bl),
                               nhwc(ref_frame_el), None, nhwc(ref_feature_el))

    assert abs(float(o["bit_el"]) - r["bit_el"]) / max(r["bit_el"], 1) < 3e-3
    assert_close_mostly(
        np.asarray(o["dpb"]["ref_frame_el"]).transpose(0, 3, 1, 2),
        r["dpb"]["ref_frame_el"].numpy())

@pytest.mark.slow
def test_staged3_matches_fused(models):
    """Four-program staged forward (BL | EL-ctx | EL-res | EL-recon, the
    batch-of-sequences HBM-fit path) must track the fused program."""
    from lssvc_tpu.models import lssvc as lssvc_mod

    _, ours = models
    rng = np.random.default_rng(23)

    def arr(shape):
        return jnp.asarray(rng.random(shape), dtype=jnp.float32)

    args = (arr((1, 64, 64, 3)), arr((1, 128, 128, 3)),
            arr((1, 64, 64, 3)), arr((1, 128, 128, 3)),
            arr((1, 64, 64, 64)), arr((1, 128, 128, 48)))
    fused = lssvc_mod.forward_one_frame(ours.params, *args, (128, 128), 2.0,
                                        (0, 0, 0, 0))
    staged = lssvc_mod.forward_one_frame_staged3(ours.params, *args,
                                                 (128, 128), 2.0,
                                                 (0, 0, 0, 0))
    assert_rel_rms(np.asarray(staged["dpb"]["ref_frame_el"]),
                   np.asarray(fused["dpb"]["ref_frame_el"]))
    assert_rel_rms(np.asarray(staged["dpb"]["ref_frame_bl"]),
                   np.asarray(fused["dpb"]["ref_frame_bl"]))
    for k in ("bit_bl", "bit_el"):
        a, b = float(staged[k]), float(fused[k])
        assert abs(a - b) / max(abs(b), 1.0) < 3e-3, (k, a, b)
