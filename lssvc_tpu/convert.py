"""Torch-checkpoint -> JAX pytree conversion.

Parameters are stored as a flat dict keyed by the torch state_dict names
(e.g. "g_a.0.conv1.weight") with values converted to TPU layouts:

  * Conv2d weight  (O, I, kH, kW)      -> HWIO (kH, kW, I, O)
  * ConvTranspose2d weight (I, O, kH, kW) -> spatially flipped HWIO
    (the conv-equivalent kernel for the lhs-dilated formulation in
    ops.nn.conv_transpose2d)
  * (1, C, 1, 1) broadcast params (Bitparm h/b/a) -> (1, 1, 1, C) for NHWC
  * everything else (biases, GDN beta/gamma, bottleneck matrices, CDF
    buffers) kept as-is.

Transposed-conv parameter names cannot be distinguished from regular convs
by shape alone, so each model architecture declares its set (see
models/*.TRANSPOSED_CONV_KEYS).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def strip_module_prefix(state_dict: dict) -> dict:
    """Drop DataParallel's 'module.' prefix (reference `LSSVC_net.py:141-149`)."""
    return {k[7:] if k.startswith("module.") else k: v for k, v in state_dict.items()}


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def convert_state_dict(state_dict: dict, transposed_keys=frozenset(),
                       dtype=jnp.float32) -> dict:
    """Convert a torch state_dict to the flat JAX parameter dict."""
    state_dict = strip_module_prefix(state_dict)
    out = {}
    for key, val in state_dict.items():
        a = _to_numpy(val)
        if a.ndim == 4 and key in transposed_keys:
            # (I, O, kH, kW) -> flip spatial -> (kH, kW, I, O)
            a = a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        elif a.ndim == 4 and a.shape[0] == 1 and a.shape[2] == 1 and a.shape[3] == 1:
            a = a.reshape(1, 1, 1, -1)
        elif a.ndim == 4:
            # OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        if np.issubdtype(a.dtype, np.floating):
            out[key] = jnp.asarray(np.ascontiguousarray(a), dtype=dtype)
        else:
            out[key] = jnp.asarray(np.ascontiguousarray(a))
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.ckpt file into a name->numpy dict (host side)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


class P:
    """Scoped view over the flat parameter dict: P(params, 'g_a.0.')('weight')."""

    __slots__ = ("d", "prefix")

    def __init__(self, d, prefix: str = ""):
        self.d = d
        self.prefix = prefix

    def __call__(self, name: str):
        return self.d[self.prefix + name]

    def sub(self, name: str) -> "P":
        return P(self.d, self.prefix + name + ".")

    def __contains__(self, name: str) -> bool:
        return self.prefix + name in self.d
