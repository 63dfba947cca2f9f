"""Cheng2020Anchor: forward parity vs the reference + autoregressive stream
round-trip."""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.models.cheng2020 import Cheng2020Anchor
from ref_oracle import import_reference


@pytest.fixture(scope="module")
def models():
    import_reference()
    from src.models.priors import Cheng2020Anchor as RefCheng

    torch.manual_seed(0)
    ref = RefCheng(N=32)
    ref.eval()
    ours = Cheng2020Anchor.from_torch_state_dict(ref.state_dict())
    return ref, ours


def test_cheng2020_forward_parity(models):
    ref, ours = models
    torch.manual_seed(1)
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        r = ref(x)
    y_lik = r["likelihoods"]["y"]
    z_lik = r["likelihoods"]["z"]
    bits_ref = float((torch.log(y_lik).sum() + torch.log(z_lik).sum())
                     / (-math.log(2.0)))

    o = ours.forward(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert abs(float(o["bit"]) - bits_ref) / max(bits_ref, 1) < 3e-3
    np.testing.assert_allclose(
        np.asarray(o["x_hat"]).transpose(0, 3, 1, 2), r["x_hat"].numpy(),
        atol=1e-3, rtol=1e-2)


def test_cheng2020_stream_roundtrip(models):
    _, ours = models
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    ours.update(force=True)
    compressed = ours.compress(x=x)
    dec = ours.decompress(compressed["strings"], compressed["shape"])
    # the causal coder's decoded latents must equal the encoder-side ones
    # (the estimated forward uses context-free round(y), so it is NOT the
    # reference point — same asymmetry as the reference implementation)
    np.testing.assert_allclose(np.asarray(dec["y_hat"])[0],
                               compressed["y_hat"][0], atol=1e-5)
