"""Golden parity: DMC base-layer P-frame codec vs the reference torch impl."""

import numpy as np

from parity_utils import assert_close_mostly
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.models import DMC
from ref_oracle import import_reference


def nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def models():
    import_reference()
    from src.models.dmc_net import DMC as RefDMC

    torch.manual_seed(0)
    ref = RefDMC()
    ref.eval()
    ours = DMC.from_torch_state_dict(
        {k: v for k, v in ref.state_dict().items()
         if not k.startswith("ms_ssim_loss")})
    return ref, ours


def test_dmc_inter_parity_with_feature(models):
    ref, ours = models
    torch.manual_seed(1)
    x = torch.rand(1, 3, 64, 64)
    ref_frame = torch.rand(1, 3, 64, 64)
    ref_feature = torch.rand(1, 64, 64, 64)
    with torch.no_grad():
        r = ref.get_inter_layer_information(x, ref_frame, ref_feature)

    o = ours.get_inter_layer_information(nhwc(x), nhwc(ref_frame),
                                         nhwc(ref_feature))
    assert abs(float(o["bits"]) - float(r["bits"])) / max(float(r["bits"]), 1) < 3e-4
    assert_close_mostly(
        np.asarray(o["recon_image"]).transpose(0, 3, 1, 2),
        r["recon_image"].numpy())
    assert_close_mostly(
        np.asarray(o["mv_hat"]).transpose(0, 3, 1, 2),
        r["mv_hat"].numpy())
    assert_close_mostly(
        np.asarray(o["y_hat"]).transpose(0, 3, 1, 2),
        r["y_hat"].numpy())


def test_dmc_inter_parity_i_reference(models):
    """ref_feature=None: I-frame reference goes through feature_adaptor_I."""
    ref, ours = models
    torch.manual_seed(2)
    x = torch.rand(1, 3, 64, 64)
    ref_frame = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        r = ref.get_inter_layer_information(x, ref_frame, None)

    o = ours.get_inter_layer_information(nhwc(x), nhwc(ref_frame), None)
    assert abs(float(o["bits"]) - float(r["bits"])) / max(float(r["bits"]), 1) < 3e-4
    assert_close_mostly(
        np.asarray(o["recon_image"]).transpose(0, 3, 1, 2),
        r["recon_image"].numpy())
