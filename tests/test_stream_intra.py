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
