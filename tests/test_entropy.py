"""Entropy-model math + CDF table builders."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from lssvc_tpu.convert import P, convert_state_dict
from lssvc_tpu.entropy.models import (
    bit_estimator_forward,
    build_indexes_img,
    build_indexes_video,
    factorized_bits,
    laplace_bits,
    gaussian_conditional_likelihood,
)
from lssvc_tpu.entropy.coder import (
    build_entropy_bottleneck_table,
    build_bit_estimator_table,
    build_laplace_table,
    build_gaussian_conditional_table,
)


def _torch_bitparm(x, h, b, a=None):
    if a is None:
        return torch.sigmoid(x * TF.softplus(h) + b)
    x = x * TF.softplus(h) + b
    return x + torch.tanh(x) * torch.tanh(a)


def test_bit_estimator_matches_torch_formula():
    torch.manual_seed(0)
    ch = 8
    params = {}
    tp = {}
    for layer in ("f1", "f2", "f3", "f4"):
        for name in (("h", "b") if layer == "f4" else ("h", "b", "a")):
            t = torch.randn(1, ch, 1, 1) * 0.1
            tp[f"{layer}.{name}"] = t
            params[f"{layer}.{name}"] = jnp.asarray(
                t.numpy().reshape(1, 1, 1, ch))

    x = torch.randn(1, ch, 4, 5)
    v = x
    for layer in ("f1", "f2", "f3"):
        v = _torch_bitparm(v, tp[f"{layer}.h"], tp[f"{layer}.b"],
                           tp[f"{layer}.a"])
    ref = _torch_bitparm(v, tp["f4.h"], tp["f4.b"]).numpy()

    out = bit_estimator_forward(P(params),
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-6, rtol=1e-5)


def test_laplace_bits_matches_torch():
    torch.manual_seed(1)
    y = torch.round(torch.randn(1, 4, 8, 8) * 3)
    sigma = torch.rand(1, 4, 8, 8) * 2 + 0.01
    mu = torch.zeros_like(sigma)
    s = sigma.clamp(1e-5, 1e10)
    lap = torch.distributions.laplace.Laplace(mu, s)
    probs = lap.cdf(y + 0.5) - lap.cdf(y - 0.5)
    ref_bits = torch.sum(torch.clamp(
        -1.0 * torch.log(probs + 1e-5) / math.log(2.0), 0, 50)).item()

    bits, _ = laplace_bits(jnp.asarray(y.numpy().transpose(0, 2, 3, 1)),
                           jnp.asarray(sigma.numpy().transpose(0, 2, 3, 1)))
    assert abs(float(bits) - ref_bits) < 1e-2


def test_gaussian_conditional_likelihood_matches_torch():
    torch.manual_seed(2)
    y = torch.round(torch.randn(1, 4, 8, 8) * 2)
    scales = torch.rand(1, 4, 8, 8) * 3 + 0.05
    means = torch.randn(1, 4, 8, 8) * 0.1

    def std_cum(v):
        return 0.5 * torch.erfc(-(2 ** -0.5) * v)

    values = torch.abs(y - means)
    sc = torch.clamp(scales, min=0.11)
    ref = (std_cum((0.5 - values) / sc) - std_cum((-0.5 - values) / sc))
    ref = torch.clamp(ref, min=1e-9).numpy()

    out = gaussian_conditional_likelihood(
        jnp.asarray(y.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(scales.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(means.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-6, rtol=1e-4)


def test_build_indexes_ranges():
    scales = jnp.asarray(np.array([[[[1e-9, 0.01, 0.5, 64.0, 100.0]]]]))
    vi = np.asarray(build_indexes_video(scales)).ravel()
    assert vi[0] == 0 and vi[1] == 0 and vi[3] == 255 and vi[4] == 255
    ii = np.asarray(build_indexes_img(scales)).ravel()
    assert ii.min() >= 0 and ii.max() <= 63


@pytest.fixture(scope="module")
def bitparm_params():
    torch.manual_seed(3)
    params = {}
    for layer in ("f1", "f2", "f3", "f4"):
        for name in (("h", "b") if layer == "f4" else ("h", "b", "a")):
            params[f"be.{layer}.{name}"] = jnp.asarray(
                (torch.randn(1, 1, 1, 6) * 0.1).numpy())
    return params


def test_bit_estimator_table_properties(bitparm_params):
    table = build_bit_estimator_table(bitparm_params, "be.")
    assert table.cdfs.shape[0] == 6
    for i in range(6):
        row = table.cdfs[i, :table.sizes[i]]
        assert row[0] == 0
        assert row[-1] == 1 << 16
        assert np.all(np.diff(row) >= 1)


def test_laplace_table_properties():
    table = build_laplace_table()
    assert table.cdfs.shape[0] == 256
    for i in (0, 100, 255):
        row = table.cdfs[i, :table.sizes[i]]
        assert row[0] == 0 and row[-1] == 1 << 16
        assert np.all(np.diff(row) >= 1)
    # tiny scales concentrate mass at 0 -> short support
    assert table.sizes[0] < table.sizes[255]


def test_gaussian_conditional_table_properties():
    table = build_gaussian_conditional_table()
    assert table.cdfs.shape[0] == 64
    for i in (0, 32, 63):
        row = table.cdfs[i, :table.sizes[i]]
        assert row[0] == 0 and row[-1] == 1 << 16
        assert np.all(np.diff(row) >= 1)


# --- golden cross-implementation CDF-table tests ---------------------------
# The tables must be BIT-EXACT with the reference's update() output or
# cross-implementation streams desync at the first narrow-support channel
# (caught late in round 2: the tail mass was evaluated at the per-channel
# support end instead of the reference's global last sample column).

def _stub_quantize(prob_tensor):
    from lssvc_tpu.native.rans import pmf_to_quantized_cdf

    q = pmf_to_quantized_cdf(
        np.asarray(prob_tensor.detach(), dtype=np.float32), 16)
    return torch.tensor(np.asarray(q), dtype=torch.int32)


def test_bit_estimator_table_bit_exact_with_reference_update():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_oracle import import_reference

    import_reference()
    from src.entropy_models.video_entropy_models import BitEstimator as RefBE

    torch.manual_seed(3)
    ch = 6
    ref = RefBE(ch)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.add_(torch.randn_like(p_) * 0.3)

    class _StubCoder:
        entropy_coder_precision = 16

        def pmf_to_cdf(self, pmf, tail_mass, pmf_length, max_length):
            cdf = torch.zeros((len(pmf_length), max_length + 2),
                              dtype=torch.int32)
            for i, p_ in enumerate(pmf):
                prob = torch.cat((p_[: pmf_length[i]], tail_mass[i]), dim=0)
                q = _stub_quantize(prob)
                cdf[i, : q.size(0)] = q
            return cdf

    ref.update(force=True, entropy_coder=_StubCoder())
    ref_cdf, ref_len, ref_off = ref.cdf_helper.get_cdf_info_list()

    params = {}
    for layer in ("f1", "f2", "f3", "f4"):
        mod = getattr(ref, layer)
        for name in (("h", "b") if layer == "f4" else ("h", "b", "a")):
            t = getattr(mod, name).detach().numpy()  # (1, C, 1, 1)
            params[f"be.{layer}.{name}"] = jnp.asarray(
                t.reshape(1, 1, 1, ch))
    table = build_bit_estimator_table(params, "be.")

    assert list(np.asarray(table.offsets).reshape(-1)) == ref_off
    for i in range(ch):
        assert int(table.sizes[i]) == ref_len[i]
        assert list(table.cdfs[i][: table.sizes[i]]) == ref_cdf[i][: ref_len[i]], f"ch {i}"


def test_entropy_bottleneck_table_bit_exact_with_reference_update():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_oracle import import_reference

    import_reference()
    import src.entropy_models.img_entropy_models as ref_img

    torch.manual_seed(4)
    ch = 5
    # the reference's _EntropyCoder imports the py36-era prebuilt rANS .so;
    # update() never touches it, so stub the constructor out
    ref_img._EntropyCoder = lambda *a, **k: None
    ref = ref_img.EntropyBottleneck(ch)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.add_(torch.randn_like(p_) * 0.2)
        # spread the quantiles so per-channel supports differ
        ref.quantiles[:, 0, 0] = -torch.arange(2.0, 2.0 + ch)
        ref.quantiles[:, 0, 1] = 0.0
        ref.quantiles[:, 0, 2] = torch.arange(3.0, 3.0 + ch)

    ref_img.pmf_to_quantized_cdf = lambda prob, precision=16: _stub_quantize(prob)
    ref.update(force=True)
    ref_cdf = ref._quantized_cdf.numpy()
    ref_len = ref._cdf_length.reshape(-1).int().tolist()
    ref_off = ref._offset.reshape(-1).int().tolist()

    params = {"eb.quantiles": jnp.asarray(ref.quantiles.detach().numpy())}
    for i in range(5):
        params[f"eb._matrices.{i}"] = jnp.asarray(
            ref._matrices[i].detach().numpy())
        params[f"eb._biases.{i}"] = jnp.asarray(
            ref._biases[i].detach().numpy())
        if i < 4:
            params[f"eb._factors.{i}"] = jnp.asarray(
                ref._factors[i].detach().numpy())
    table = build_entropy_bottleneck_table(params, "eb.")

    assert list(np.asarray(table.offsets).reshape(-1)) == ref_off
    for i in range(ch):
        assert int(table.sizes[i]) == ref_len[i]
        assert list(table.cdfs[i][: table.sizes[i]]) == list(ref_cdf[i][: ref_len[i]]), f"ch {i}"


def test_bf16_symbol_boundary_is_f32_exact():
    """The closed-loop stream contract requires ONE canonical symbol
    value per element: round(f32(y) - f32(means)).  In bf16 serving mode
    y/means arrive as bfloat16, and a bf16-domain subtract (numpy ml_dtypes
    rounds per op; XLA may keep excess precision) rounds knife-edge
    values differently — round 4's bf16 intra-EL rANS desync (decoded
    |y_hat| ~1.4e4 -> NaN recon).  Locks BOTH the host coder and the
    device `_y_roundtrip` to the f32 boundary, on inputs engineered to
    include bf16/f32 disagreement points."""
    import jax.numpy as jnp
    import ml_dtypes

    from lssvc_tpu.entropy.coder import IntraCoder
    from lssvc_tpu.models.init import init_intra_noar
    from lssvc_tpu.models.intra_noar import _y_roundtrip_jit

    rng = np.random.default_rng(7)
    n = 4096
    y32 = rng.uniform(-3, 3, n).astype(np.float32)
    # differences clustered tightly around half-integers: after bf16
    # rounding of y/means many (y - means) land on rounding knife edges
    d = (rng.integers(-2, 3, n) + 0.5
         + rng.uniform(-2e-3, 2e-3, n)).astype(np.float32)
    y_bf = y32.astype(ml_dtypes.bfloat16)
    m_bf = (y32 - d).astype(ml_dtypes.bfloat16)

    sym_f32 = np.round(y_bf.astype(np.float32)
                       - m_bf.astype(np.float32)).astype(np.int32)
    sym_bf16 = np.round((y_bf - m_bf).astype(np.float32)).astype(np.int32)
    # the engineered inputs must actually exercise disagreement points,
    # or this test proves nothing
    assert (sym_f32 != sym_bf16).sum() > 0

    y = jnp.asarray(y_bf).reshape(1, 8, n // 64, 8)
    means = jnp.asarray(m_bf).reshape(1, 8, n // 64, 8)

    coder = IntraCoder(init_intra_noar(N=8, seed=0))
    idx = jnp.full(y.shape, 16, jnp.int32)
    strings = coder.gc_compress(y, idx, means)
    y_hat_host = coder.gc_decompress(strings, idx, means)
    y_hat_dev = np.asarray(_y_roundtrip_jit(y, means))

    want = sym_f32.reshape(y.shape).astype(np.float32) + np.asarray(
        means, np.float32)
    np.testing.assert_array_equal(np.asarray(y_hat_host, np.float32), want)
    np.testing.assert_array_equal(y_hat_dev.astype(np.float32), want)
