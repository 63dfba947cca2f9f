"""Real-bitstream round-trip for IntraNoAR: encoder -> bytes -> decoder must
reproduce the estimated-bpp path's quantized reconstruction, and the real
bitrate must track the estimate (the reference asserts this equivalence,
README.md:22)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.models import IntraNoAR
from ref_oracle import import_reference


@pytest.fixture(scope="module")
def model():
    import_reference()
    from src.models.priors import IntraNoAR as RefIntraNoAR

    torch.manual_seed(0)
    ref = RefIntraNoAR(N=32)
    ref.eval()
    return IntraNoAR.from_torch_state_dict(ref.state_dict(), N=32)


def test_intra_stream_roundtrip(model, tmp_path):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)

    est = model.forward(x)
    model.update(force=True)
    out_path = str(tmp_path / "frame.bin")
    res = model.encode_decode(x, output_path=out_path, pic_width=64,
                              pic_height=64)

    # decoded latents must match the estimated path bit-for-bit
    np.testing.assert_allclose(np.asarray(res["y_hat"]),
                               np.asarray(est["y_hat"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["x_hat"]),
                               np.asarray(est["x_hat"]), atol=1e-5)

    # real bits should track the estimate up to fixed overhead (16-byte
    # container header + two rANS flush words per stream)
    est_bits = float(est["bit"])
    real_bits = res["bit"]
    assert real_bits > 0
    overhead = 16 * 8 + 2 * 2 * 64
    assert abs(real_bits - est_bits) < overhead + 0.1 * est_bits, \
        (real_bits, est_bits)


def test_intra_compress_decompress_api(model):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    model.update(force=True)
    compressed = model.compress(x=x)
    assert len(compressed["strings"]) == 2
    dec = model.decompress(compressed["strings"], compressed["shape"])
    est = model.forward(x)
    np.testing.assert_allclose(np.asarray(dec["y_hat"]),
                               np.asarray(est["y_hat"]), atol=1e-5)


def test_intra_compress_with_recon_decoder_exact(model):
    """compress(with_recon=True) must hand back BIT-identical tensors to a
    real decompress of its own streams — the closed-loop guarantee the
    IntraSS EL conditioning relies on."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    model.update(force=True)
    compressed = model.compress(x=x, with_recon=True)
    dec = model.decompress(compressed["strings"], compressed["shape"])
    np.testing.assert_array_equal(np.asarray(compressed["y_hat"]),
                                  np.asarray(dec["y_hat"]))
    np.testing.assert_array_equal(np.asarray(compressed["x_hat"]),
                                  np.asarray(dec["x_hat"]))


@pytest.fixture(scope="module")
def intra_ss_model():
    import_reference()
    from src.models.IntraSS import IntraSS as RefIntraSS

    from lssvc_tpu.models import IntraSS

    torch.manual_seed(1)
    ref = RefIntraSS(channel_BL=32)
    m = IntraSS.from_torch_state_dict(ref.state_dict())
    m.set_scale_information(2.0, (128, 128), (0, 0, 0, 0))
    return m


def test_intra_ss_compress_stream_decoder_exact(intra_ss_model, tmp_path):
    """Encode-only compress_stream must return BIT-identical recons to the
    real decode of its own streams (closed-loop guarantee for GOP serving:
    the P-chain conditions on the I-frame recon)."""
    from lssvc_tpu.models.intra_ss_stream import compress_stream

    m = intra_ss_model
    rng = np.random.default_rng(9)
    x_bl = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    x_el = jnp.asarray(rng.random((1, 128, 128, 3)), dtype=jnp.float32)
    m.update(force=True)
    enc = compress_stream(m, x_bl, x_el,
                          str(tmp_path / "bl.bin"), str(tmp_path / "el.bin"),
                          64, 64, 128, 128)
    dec = m.encode_decode(x_bl, x_el,
                          str(tmp_path / "bl2.bin"), str(tmp_path / "el2.bin"),
                          pic_height_bl=64, pic_width_bl=64,
                          pic_height_el=128, pic_width_el=128)
    assert (tmp_path / "bl.bin").read_bytes() == \
        (tmp_path / "bl2.bin").read_bytes()
    assert (tmp_path / "el.bin").read_bytes() == \
        (tmp_path / "el2.bin").read_bytes()
    for k in ("x_hat_bl", "x_hat_el", "feature_el"):
        np.testing.assert_array_equal(np.asarray(enc[k]),
                                      np.asarray(dec[k]), err_msg=k)


def test_intra_ss_stream_roundtrip(intra_ss_model, tmp_path):
    """Two-file (BL+EL) IntraSS stream: encode -> decode must reproduce the
    estimated-path reconstructions (`IntraSS.py:245-302` contract)."""
    m = intra_ss_model

    rng = np.random.default_rng(3)
    x_bl = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    x_el = jnp.asarray(rng.random((1, 128, 128, 3)), dtype=jnp.float32)

    est = m.forward(x_bl, x_el)
    m.update(force=True)
    res = m.encode_decode(x_bl, x_el,
                          str(tmp_path / "bl.bin"), str(tmp_path / "el.bin"),
                          pic_height_bl=64, pic_width_bl=64,
                          pic_height_el=128, pic_width_el=128)
    assert res["bit_bl"] > 0 and res["bit_el"] > 0
    np.testing.assert_allclose(np.asarray(res["x_hat_el"]),
                               np.asarray(est["x_hat_el"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res["x_hat_bl"]),
                               np.asarray(est["x_hat_bl"]), atol=1e-4)
