"""Latent-domain rate-distortion optimization for the intra codec.

Behavioral contract: `/root/reference/src/models/priors.py:224-331`
(`bits_rdo` / `global_rdo`) — iterative sign-gradient refinement of the
latents (y, z) against lambda*255^2*MSE + bpp, updating only elements whose
gradient magnitude exceeds a threshold fraction of the max, with a staged
schedule that shrinks steps and raises thresholds after plateaus.

The loss/grad evaluation is one jitted program; only the (scalar) plateau
bookkeeping runs on the host.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..convert import P
from .intra_noar import g_s, hyper_synthesis_quantize

LOG2 = math.log(2.0)


def _rd_loss(params, y, z, x_padded, lmbda):
    y_hat, z_hat, y_lik, z_lik, _, _ = hyper_synthesis_quantize(params, y, z)
    x_hat = g_s(P(params).sub("g_s"), y_hat)
    num_pixels = x_padded.shape[0] * x_padded.shape[1] * x_padded.shape[2]
    bpp = (jnp.sum(jnp.log(z_lik)) + jnp.sum(jnp.log(y_lik))) / (
        -LOG2 * num_pixels)
    mse = jnp.mean(jnp.square(x_hat - x_padded))
    return lmbda * (255.0 ** 2) * mse + bpp


@partial(jax.jit, static_argnums=())
def _loss_and_grads(params, y, z, x_padded, lmbda):
    loss, (gy, gz) = jax.value_and_grad(_rd_loss, argnums=(1, 2))(
        params, y, z, x_padded, lmbda)
    return loss, gy, gz


@jax.jit
def _masked_update(v, grad, threshold, step):
    gmax = jnp.max(jnp.abs(grad))
    upd = jnp.where(jnp.abs(grad) > gmax * threshold,
                    grad / jnp.maximum(gmax, 1e-30) * step,
                    jnp.zeros_like(grad))
    return jnp.where(gmax > 0, v - upd, v)


def bits_rdo(params, y, z, x_padded, lmbda, max_iter=3000, iter_to_exit=50,
             iter_to_reduce=25):
    """Refine (y, z); returns (best_y, best_z, best_loss)."""
    best_loss = float("inf")
    best_y, best_z = y, z
    stalled = 0
    reduce_counter = 0
    # staged (threshold_y, step_y, threshold_z, step_z) schedule
    stages = [(0.25, 0.8, 0.25, 0.1), (0.5, 0.2, 0.5, 0.05),
              (0.75, 0.1, 0.75, 0.05)]
    stage = 0

    for _ in range(max_iter):
        loss, gy, gz = _loss_and_grads(params, y, z, x_padded, lmbda)
        loss = float(loss)
        if loss < best_loss:
            best_loss = loss
            best_y, best_z = y, z
            stalled = 0
            reduce_counter = 0
        else:
            stalled += 1
            reduce_counter += 1

        if stage < 2 and reduce_counter > iter_to_reduce:
            stage += 1
            reduce_counter = 0
            y, z = best_y, best_z
            continue

        ty, sy, tz, sz = stages[stage]
        y = _masked_update(y, gy, ty, sy)
        z = _masked_update(z, gz, tz, sz)

        if stalled >= iter_to_exit:
            break
    return best_y, best_z, best_loss


def global_rdo(params, y, z, x_padded, rdo_opt):
    """Reference `global_rdo` (`priors.py:315-331`): one bits_rdo run from
    the analysis latents."""
    rdo_opt = rdo_opt or {}
    best_y, best_z, _ = bits_rdo(
        params, y, z, x_padded, rdo_opt.get("lmbda", 0.01),
        max_iter=rdo_opt.get("max_iter", 3000),
        iter_to_exit=rdo_opt.get("iter_to_exit", 60),
        iter_to_reduce=rdo_opt.get("iter_to_reduce", 20))
    return best_y, best_z
