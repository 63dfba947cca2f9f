"""Four-part quadtree-checkerboard spatial prior.

Behavioral contract: `/root/reference/src/models/LSSVC_net.py:288-443` — the
EL latent is split into 4 channel quarters x 4 checkerboard spatial masks
and coded in 4 passes; each pass re-estimates (scales, means) for the
not-yet-coded positions from everything decoded so far via a shared
spatial-prior network.

The pass schedule (which mask each channel quarter uses per pass):
    pass 0: quarters (0,1,2,3) use masks (0,1,2,3)
    pass 1:                     masks (3,2,1,0)
    pass 2:                     masks (2,3,0,1)
    pass 3:                     masks (1,0,3,2)

Masks are built from static shapes at trace time (no caching dict needed —
XLA constant-folds them).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import ste_round
from .components import depth_conv_block
from .lssvc_blocks import conv

# mask index per (pass, quarter)
PASS_MASKS = ((0, 1, 2, 3), (3, 2, 1, 0), (2, 3, 0, 1), (1, 0, 3, 2))


def checkerboard_masks(h: int, w: int, dtype=np.float32):
    """Four (1,H,W,1) quad-phase masks: mask k selects (row%2, col%2) phase."""
    rows = np.arange(h) % 2
    cols = np.arange(w) % 2
    masks = []
    for (r, c) in ((0, 0), (0, 1), (1, 0), (1, 1)):
        m = ((rows[:, None] == r) & (cols[None, :] == c)).astype(dtype)
        masks.append(jnp.asarray(m[None, :, :, None]))
    return masks


def spatial_prior_net(p, adaptor_scope, x):
    """1x1 adaptor + 3 DepthConvBlocks (`LSSVC_net.py:44-48`)."""
    f = conv(adaptor_scope, x)
    f = depth_conv_block(p.sub("y_spatial_prior.0"), f)
    f = depth_conv_block(p.sub("y_spatial_prior.1"), f)
    return depth_conv_block(p.sub("y_spatial_prior.2"), f)


def _split4(t):
    return jnp.split(t, 4, axis=-1)


def _process(y_q_quarter, scales_q, means_q, mask):
    """One (quarter, mask) coding step: returns (y_res, y_q, y_hat, s_hat)."""
    scales_hat = scales_q * mask
    means_hat = means_q * mask
    y_res = (y_q_quarter - means_hat) * mask
    y_q = ste_round(y_res)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


def forward_four_part_prior(p, y, common_params, write=False):
    """Forward all 4 passes. Returns (y_res, y_q, y_hat, scales_hat), or the
    per-pass write planes when `write` (symbols + scales per pass, plus
    y_hat) for the real-bitstream encoder."""
    _, h, w, _ = y.shape
    masks = checkerboard_masks(h, w)

    half = common_params.shape[-1] // 2
    scales, means = common_params[..., :half], common_params[..., half:]
    y_4 = _split4(y)
    scales_4 = _split4(scales)
    means_4 = _split4(means)

    # per-quarter accumulators indexed [quarter][mask]
    res_acc = [[None] * 4 for _ in range(4)]
    q_acc = [[None] * 4 for _ in range(4)]
    hat_acc = [[None] * 4 for _ in range(4)]
    s_acc = [[None] * 4 for _ in range(4)]

    write_syms, write_scales = [], []
    y_hat_so_far = None

    for pass_idx, mask_ids in enumerate(PASS_MASKS):
        if pass_idx > 0:
            params = jnp.concatenate([y_hat_so_far, common_params], axis=-1)
            pr = spatial_prior_net(
                p, p.sub(f"y_spatial_prior_adaptor_{pass_idx}"), params)
            parts = jnp.split(pr, 8, axis=-1)
            scales_4 = parts[:4]
            means_4 = parts[4:]

        step_hats = []
        step_syms = None
        step_scales = None
        for quarter, mask_id in enumerate(mask_ids):
            y_res, y_q, y_hat, s_hat = _process(
                y_4[quarter], scales_4[quarter], means_4[quarter], masks[mask_id])
            res_acc[quarter][mask_id] = y_res
            q_acc[quarter][mask_id] = y_q
            hat_acc[quarter][mask_id] = y_hat
            s_acc[quarter][mask_id] = s_hat
            step_hats.append(y_hat)
            if write:
                step_syms = y_q if step_syms is None else step_syms + y_q
                step_scales = s_hat if step_scales is None else step_scales + s_hat
        step = jnp.concatenate(step_hats, axis=-1)
        y_hat_so_far = step if y_hat_so_far is None else y_hat_so_far + step
        if write:
            write_syms.append(step_syms)
            write_scales.append(step_scales)

    def combine(acc):
        return jnp.concatenate(
            [sum(acc[q][m] for m in range(4)) for q in range(4)], axis=-1)

    y_hat = y_hat_so_far
    if write:
        return write_syms, write_scales, y_hat
    return combine(res_acc), combine(q_acc), y_hat, combine(s_acc)


def decode_pass_scales(scales_4, mask_ids, masks):
    """Composite scale plane for one decode pass: sum_q scales_q * mask."""
    out = None
    for quarter, mask_id in enumerate(mask_ids):
        t = scales_4[quarter] * masks[mask_id]
        out = t if out is None else out + t
    return out
