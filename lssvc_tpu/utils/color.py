"""BT.709 color conversion and 4:2:0 <-> 4:4:4 chroma resampling (host side).

Numerics match the reference (`/root/reference/src/utils/functional.py`):
RGB<->YCbCr uses ITU-R BT.709 coefficients; 444->420 is a 2x2 mean; 420->444
upsampling uses spline interpolation of the requested order (1 = bilinear via
scipy.ndimage.zoom, matching the reference's choice).

Attribution: the conversion conventions (BT.709 full-range equations, 2x2
mean subsampling, clip placement) follow the DCVC color utilities
(Microsoft, MIT license; vendored by the reference as
`src/utils/functional.py`).  They are a behavioral contract — result JSONs
are only comparable if the YUV<->RGB round trip is numerically identical —
so the equations are the same; the code is factored around shared
plane-space helpers rather than ported per function.

These run on the host (numpy) because they sit at the file-I/O boundary; the
in-network tensor variants live alongside as jnp-compatible pure functions.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage

YCBCR_WEIGHTS = {
    # (K_r, K_g, K_b) with K_g = 1 - K_r - K_b
    "ITU-R_BT.709": (0.2126, 0.7152, 0.0722),
}


def _to_ycbcr_planes(r, g, b):
    """BT.709 full-range forward equations on separate planes (any array
    library: used with numpy slabs here and jnp slices in rgb2ycbcr)."""
    Kr, Kg, Kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    y = Kr * r + Kg * g + Kb * b
    cb = 0.5 * (b - y) / (1 - Kb) + 0.5
    cr = 0.5 * (r - y) / (1 - Kr) + 0.5
    return y, cb, cr


def _to_rgb_planes(y, cb, cr):
    """Inverse of `_to_ycbcr_planes` (exact algebraic inverse: G is
    recovered from the luma equation, not an independent matrix row)."""
    Kr, Kg, Kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    r = y + (2 - 2 * Kr) * (cr - 0.5)
    b = y + (2 - 2 * Kb) * (cb - 0.5)
    g = (y - Kr * r - Kb * b) / Kg
    return r, g, b


def _mean_2x2(plane: np.ndarray) -> np.ndarray:
    """1xHxW -> 1x(H/2)x(W/2) by 2x2 arithmetic mean (420 subsampling)."""
    _, h, w = plane.shape
    return plane.reshape(1, h // 2, 2, w // 2, 2).mean(axis=(-1, -3))


def rgb_to_ycbcr420(rgb: np.ndarray):
    """3xHxW RGB float [0,1] -> (y: 1xHxW, uv: 2x(H/2)x(W/2))."""
    c, h, w = rgb.shape
    assert c == 3
    assert h % 2 == 0 and w % 2 == 0
    y, cb, cr = _to_ycbcr_planes(*np.split(rgb, 3, axis=0))
    # subsample chroma BEFORE clipping (the mean of out-of-gamut values
    # differs from the mean of clipped ones; reference clip placement)
    uv = np.concatenate((_mean_2x2(cb), _mean_2x2(cr)), axis=0)
    return np.clip(y, 0.0, 1.0), np.clip(uv, 0.0, 1.0)


def ycbcr420_to_rgb(y: np.ndarray, uv: np.ndarray, order: int = 1) -> np.ndarray:
    """(y: 1xHxW, uv: 2x(H/2)x(W/2)) float [0,1] -> 3xHxW RGB float [0,1].

    order: 0 nearest neighbour, 1 bilinear (default).
    """
    uv = scipy.ndimage.zoom(uv, (1, 2, 2), order=order)
    r, g, b = _to_rgb_planes(y, uv[0:1], uv[1:2])
    return np.clip(np.concatenate((r, g, b), axis=0), 0.0, 1.0)


def ycbcr420_to_444(y: np.ndarray, uv: np.ndarray, order: int = 1) -> np.ndarray:
    uv = scipy.ndimage.zoom(uv, (1, 2, 2), order=order)
    return np.concatenate((y, uv), axis=0)


def ycbcr444_to_420(yuv: np.ndarray):
    c, h, w = yuv.shape
    assert c == 3
    assert h % 2 == 0 and w % 2 == 0
    y, u, v = np.split(yuv, 3, axis=0)
    uv = np.concatenate((_mean_2x2(u), _mean_2x2(v)), axis=0)
    return np.clip(y, 0.0, 1.0), np.clip(uv, 0.0, 1.0)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """3xHxW RGB float [0,1] -> 3xHxW YCbCr float [0,1] (no subsampling)."""
    y, cb, cr = _to_ycbcr_planes(*np.split(rgb, 3, axis=0))
    return np.clip(np.concatenate((y, cb, cr), axis=0), 0.0, 1.0)


def ycbcr_to_rgb(yuv: np.ndarray) -> np.ndarray:
    r, g, b = _to_rgb_planes(*np.split(yuv, 3, axis=0))
    return np.clip(np.concatenate((r, g, b), axis=0), 0.0, 1.0)


# ---------------------------------------------------------------------------
# On-device (jnp, NHWC) variants — differentiable, used in training losses
# (reference tensor variants: `functional.py:141-250`)

def rgb2ycbcr(rgb):
    """NHWC RGB [0,1] -> YCbCr, BT.709, on device."""
    import jax.numpy as jnp

    y, cb, cr = _to_ycbcr_planes(rgb[..., 0:1], rgb[..., 1:2], rgb[..., 2:3])
    return jnp.concatenate((y, cb, cr), axis=-1)


def ycbcr2rgb(ycbcr):
    """NHWC YCbCr [0,1] -> RGB, BT.709, on device."""
    import jax.numpy as jnp

    r, g, b = _to_rgb_planes(ycbcr[..., 0:1], ycbcr[..., 1:2],
                             ycbcr[..., 2:3])
    return jnp.concatenate((r, g, b), axis=-1)


def yuv_444_to_420(yuv):
    """NHWC 444 -> (y, u_half, v_half) via 2x2 average pooling."""
    from ..ops import avg_pool2d

    y = yuv[..., 0:1]
    u = avg_pool2d(yuv[..., 1:2], 2)
    v = avg_pool2d(yuv[..., 2:3], 2)
    return y, u, v


def yuv_420_to_444(y, u, v, mode: str = "bilinear"):
    """(y, u_half, v_half) NHWC -> 444 tensor."""
    import jax.numpy as jnp

    from ..ops import bilinear_resize

    target = (y.shape[1], y.shape[2])
    if mode == "bilinear":
        u = bilinear_resize(u, target)
        v = bilinear_resize(v, target)
    elif mode == "nearest":
        u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
        v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    else:
        raise ValueError(mode)
    return jnp.concatenate((y, u, v), axis=-1)
