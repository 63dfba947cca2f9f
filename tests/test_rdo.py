"""Latent-domain RDO (`models/rdo.py`) — VERDICT round-2 weak #5.

Reference contract: `/root/reference/src/models/priors.py:224-331`
(`bits_rdo` / `global_rdo`).  The reference parses `--intra_rdo` but never
plumbs it (its `test.py:45-56` flags are dead); here the flag is functional
(test.py -> scheduler task -> harness/runner.py -> IntraSS/IntraNoAR), so
these tests pin (a) the optimizer strictly improves the RD loss on a fixed
latent, (b) the refined stream still round-trips bit-exactly, and (c) the
harness-level plumbing reaches the optimizer.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lssvc_tpu.models import rdo
from lssvc_tpu.models.init import init_intra_noar, init_intra_ss
from lssvc_tpu.models.intra_noar import IntraNoAR, analysis

RDO_OPT = {"lmbda": 0.01, "max_iter": 25, "iter_to_exit": 6,
           "iter_to_reduce": 3}


@pytest.fixture(scope="module")
def model():
    return IntraNoAR(init_intra_noar(N=32), N=32)


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)


def test_bits_rdo_strictly_reduces_rd_loss(model, x):
    y, z = analysis(model.params, x)
    loss0 = float(rdo._rd_loss(model.params, y, z, x, RDO_OPT["lmbda"]))
    best_y, best_z, best_loss = rdo.bits_rdo(
        model.params, y, z, x, RDO_OPT["lmbda"],
        max_iter=RDO_OPT["max_iter"], iter_to_exit=RDO_OPT["iter_to_exit"],
        iter_to_reduce=RDO_OPT["iter_to_reduce"])
    assert best_loss < loss0, (best_loss, loss0)
    # the refinement actually moved the latents
    assert float(jnp.max(jnp.abs(best_y - y))) > 0
    # reported best_loss is the loss AT the returned latents
    re_loss = float(rdo._rd_loss(model.params, best_y, best_z, x,
                                 RDO_OPT["lmbda"]))
    np.testing.assert_allclose(re_loss, best_loss, rtol=1e-6)


def test_rdo_stream_matches_estimated_path(model, x, tmp_path):
    """encode_decode(rdo=True) with and without a real stream must agree:
    bits_rdo is deterministic, so both paths code the same refined latents;
    the decoded reconstruction must match the estimated one bit-for-bit
    (closed-loop contract) and the real bits must track the estimate."""
    est = model.encode_decode(x, rdo=True, rdo_opt=RDO_OPT)
    model.update(force=True)
    out = str(tmp_path / "rdo.bin")
    res = model.encode_decode(x, output_path=out, pic_width=64,
                              pic_height=64, rdo=True, rdo_opt=RDO_OPT)
    np.testing.assert_allclose(np.asarray(res["x_hat"]),
                               np.asarray(est["x_hat"]), atol=1e-5)
    overhead = 16 * 8 + 2 * 2 * 64
    assert abs(res["bit"] - est["bit"]) < overhead + 0.1 * est["bit"]


def test_rdo_reduces_real_bits_or_distortion(model, x, tmp_path):
    """The RD objective must improve end-to-end: coding the refined
    latents gives a strictly better lmbda*255^2*MSE + bpp than coding the
    analysis latents directly."""
    model.update(force=True)
    lam = RDO_OPT["lmbda"]
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]

    def rd_cost(res):
        mse = float(jnp.mean(jnp.square(res["x_hat"] - x)))
        return lam * 255.0 ** 2 * mse + res["bit"] / num_pixels

    base = model.encode_decode(x, output_path=str(tmp_path / "a.bin"),
                               pic_width=64, pic_height=64)
    refined = model.encode_decode(x, output_path=str(tmp_path / "b.bin"),
                                  pic_width=64, pic_height=64,
                                  rdo=True, rdo_opt=RDO_OPT)
    assert rd_cost(refined) < rd_cost(base), (rd_cost(refined), rd_cost(base))


def test_intra_ss_forward_rdo_plumbing():
    """IntraSS.forward(rdo=True) — the estimated-bpp harness path — must
    run the optimizer and return finite two-layer bits."""
    from lssvc_tpu.models.intra_ss import IntraSS

    m = IntraSS(init_intra_ss(channel_BL=32), channel_BL=32)
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    rng = np.random.default_rng(5)
    # BL must be >= 64px: h_a halves y twice and h_s's x4 upsample must
    # land back on y's grid
    x_bl = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    x_el = jnp.asarray(rng.random((1, 128, 128, 3)), dtype=jnp.float32)
    out = m.forward(x_bl, x_el, rdo=True, rdo_opt=RDO_OPT)
    base = m.forward(x_bl, x_el)
    assert np.isfinite(float(out["bit_bl"]))
    assert np.isfinite(float(out["bit_el"]))
    # RDO only touches BL latents; it must not leave the BL bits worse
    # AND distortion worse simultaneously (the RD objective improved)
    lam = RDO_OPT["lmbda"]
    npix = x_bl.shape[0] * x_bl.shape[1] * x_bl.shape[2]

    def bl_cost(o):
        mse = float(jnp.mean(jnp.square(o["x_hat_bl"] - x_bl)))
        return lam * 255.0 ** 2 * mse + float(o["bit_bl"]) / npix

    assert bl_cost(out) <= bl_cost(base) + 1e-6
