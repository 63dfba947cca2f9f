"""Golden parity: IntraSS (JAX) vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.models import IntraSS
from ref_oracle import import_reference


def nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def models():
    import_reference()
    from src.models.IntraSS import IntraSS as RefIntraSS

    torch.manual_seed(0)
    ref = RefIntraSS(channel_BL=32)
    ref.eval()
    ours = IntraSS.from_torch_state_dict(ref.state_dict())
    return ref, ours


def test_intra_ss_forward_parity(models):
    ref, ours = models
    torch.manual_seed(1)
    # EL 128x128, BL 64x64 (x2), already padded
    x_el = torch.rand(1, 3, 128, 128)
    x_bl = torch.rand(1, 3, 64, 64)
    ref.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    with torch.no_grad():
        ref_out = ref.forward(x_bl, x_el)

    ours.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    out = ours.forward(nhwc(x_bl), nhwc(x_el))

    assert abs(float(out["bit_bl"]) - ref_out["bit_bl"]) \
        / max(ref_out["bit_bl"], 1) < 1e-4
    assert abs(float(out["bit_el"]) - ref_out["bit_el"]) \
        / max(ref_out["bit_el"], 1) < 2e-4
    np.testing.assert_allclose(
        np.asarray(out["x_hat_el"]).transpose(0, 3, 1, 2),
        ref_out["x_hat_el"].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["x_hat_bl"]).transpose(0, 3, 1, 2),
        ref_out["x_hat_bl"].numpy(), atol=2e-4, rtol=1e-3)


def test_intra_ss_with_padding(models):
    """Nonzero inter-layer pad: depadding must crop before context mining."""
    ref, ours = models
    torch.manual_seed(2)
    x_el = torch.rand(1, 3, 128, 128)
    x_bl = torch.rand(1, 3, 128, 64)
    pad = (0, 0, 0, -64)  # negative = crop BL 128x64 -> 64x64 before mining
    ref.set_scale_information(2.0, (128, 128), pad)
    with torch.no_grad():
        ref_out = ref.forward(x_bl, x_el)

    ours.set_scale_information(2.0, (128, 128), pad)
    out = ours.forward(nhwc(x_bl), nhwc(x_el))

    assert abs(float(out["bit_el"]) - ref_out["bit_el"]) \
        / max(ref_out["bit_el"], 1) < 2e-4
    np.testing.assert_allclose(
        np.asarray(out["x_hat_el"]).transpose(0, 3, 1, 2),
        ref_out["x_hat_el"].numpy(), atol=2e-4, rtol=1e-3)
