"""OffsetDiversity parity: the grouped-gather formulation must match the
reference's 32-view grid_sample formulation exactly."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from lssvc_tpu.convert import convert_state_dict, P
from lssvc_tpu.models.lssvc_blocks import offset_diversity
from lssvc_tpu.ops import flow_warp_grouped
from ref_oracle import import_reference


def nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_flow_warp_grouped_matches_per_group_grid_sample():
    torch.manual_seed(0)
    b, h, w, g, r = 2, 10, 12, 4, 3
    x = torch.randn(b, g * r, h, w)
    flows = torch.randn(b, g, 2, h, w) * 3

    # oracle: warp each 3-channel group with its own flow via grid_sample
    outs = []
    for gi in range(g):
        fl = flows[:, gi]
        tensor_hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(b, -1, h, -1)
        tensor_ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(b, -1, -1, w)
        grid = torch.cat([tensor_hor, tensor_ver], 1)
        fln = torch.cat([fl[:, 0:1] / ((w - 1) / 2), fl[:, 1:2] / ((h - 1) / 2)], 1)
        out = TF.grid_sample(x[:, gi * r:(gi + 1) * r], (grid + fln).permute(0, 2, 3, 1),
                             mode="bilinear", padding_mode="border",
                             align_corners=True)
        outs.append(out)
    ref = torch.cat(outs, dim=1).numpy()

    fx = jnp.asarray(flows[:, :, 0].permute(0, 2, 3, 1).numpy())
    fy = jnp.asarray(flows[:, :, 1].permute(0, 2, 3, 1).numpy())
    # flow_warp_grouped uses block layout c' = k*G + g; permute in and out
    to_block = np.array([gi * r + k for k in range(r) for gi in range(g)])
    from_block = np.argsort(to_block)
    got_blk = flow_warp_grouped(nhwc(x)[..., to_block], fx, fy)
    got = np.asarray(got_blk)[..., from_block]
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=1e-4)


def test_offset_diversity_matches_reference():
    import_reference()
    from src.InterModules.lssvc_modules import OffsetDiversity as RefOD

    torch.manual_seed(1)
    ref = RefOD()
    ref.eval()
    x = torch.randn(1, 48, 16, 16)
    aux = torch.randn(1, 48 + 3 + 2, 16, 16)
    flow = torch.randn(1, 2, 16, 16) * 2
    with torch.no_grad():
        out_ref = ref(x, aux, flow).numpy()

    params = convert_state_dict(ref.state_dict())
    out = offset_diversity(P(params), nhwc(x), nhwc(aux), nhwc(flow))
    # 40*tanh offset amplitudes make sample positions ulp-sensitive; allow
    # sub-1e-3 absolute deviations
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               out_ref, atol=1e-3, rtol=1e-2)


def test_offset_diversity_serving_cap_bounds_flows():
    """set_od_offset_cap clamps diversity offsets at serving (mid warp
    tier eligibility); uncapped training path is unchanged."""
    import_reference()
    from src.InterModules.lssvc_modules import OffsetDiversity as RefOD

    from lssvc_tpu.ops.nn import set_od_offset_cap

    torch.manual_seed(3)
    ref = RefOD()
    ref.eval()
    x = torch.randn(1, 48, 16, 16)
    aux = torch.randn(1, 48 + 3 + 2, 16, 16) * 30  # drive tanh saturation
    flow = torch.randn(1, 2, 16, 16)

    params = convert_state_dict(ref.state_dict())
    base = np.asarray(offset_diversity(P(params), nhwc(x), nhwc(aux),
                                       nhwc(flow)))
    try:
        set_od_offset_cap(0.5)  # tight cap => output must change
        capped = np.asarray(offset_diversity(P(params), nhwc(x), nhwc(aux),
                                             nhwc(flow)))
    finally:
        set_od_offset_cap(None)
    assert not np.allclose(base, capped), \
        "cap had no effect despite saturated offsets"
    # and with the cap off again, the original result reproduces
    again = np.asarray(offset_diversity(P(params), nhwc(x), nhwc(aux),
                                        nhwc(flow)))
    np.testing.assert_array_equal(base, again)
