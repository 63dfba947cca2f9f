"""Golden parity: IntraNoAR (JAX) vs the reference torch implementation."""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.models import IntraNoAR
from ref_oracle import import_reference


@pytest.fixture(scope="module")
def ref_model():
    import_reference()
    from src.models.priors import IntraNoAR as RefIntraNoAR

    torch.manual_seed(0)
    m = RefIntraNoAR(N=32)
    m.eval()
    return m


def test_intra_noar_forward_parity(ref_model):
    torch.manual_seed(1)
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        out = ref_model(x)
    y_lik = out["likelihoods"]["y"]
    z_lik = out["likelihoods"]["z"]
    bits_ref = float((torch.log(y_lik).sum() + torch.log(z_lik).sum())
                     / (-math.log(2.0)))
    x_hat_ref = out["x_hat"].numpy()

    ours = IntraNoAR.from_torch_state_dict(ref_model.state_dict(), N=32)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    res = ours.forward(xj)

    x_hat = np.asarray(res["x_hat"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(x_hat, x_hat_ref, atol=1e-4, rtol=1e-3)
    assert abs(float(res["bit"]) - bits_ref) / max(bits_ref, 1) < 1e-4


def test_intra_noar_layer_information(ref_model):
    torch.manual_seed(2)
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        ref_info = ref_model.get_layer_information(x)

    ours = IntraNoAR.from_torch_state_dict(ref_model.state_dict(), N=32)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    info = ours.get_layer_information(xj)

    np.testing.assert_allclose(
        np.asarray(info["y_hat"]).transpose(0, 3, 1, 2),
        ref_info["y_hat"].numpy(), atol=1e-4, rtol=1e-3)
    assert abs(float(info["bits"]) - float(ref_info["bits"])) \
        / max(float(ref_info["bits"]), 1) < 1e-4
    np.testing.assert_allclose(float(info["mse"]), float(ref_info["mse"]),
                               rtol=1e-3)
