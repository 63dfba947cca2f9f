"""Data-parallel RD training for the LSSVC two-layer codec.

The reference ships no training loop (only cluster scaffolding,
`src/utils/job_submitter.py`); this module provides the missing piece,
TPU-native: a jitted rate-distortion train step with the batch sharded over
a 1-D device mesh and parameters replicated — XLA inserts the gradient
all-reduce over ICI from the shardings.

Quantization uses straight-through rounding (ops.ste_round) so the same
forward serves eval and training; the RD objective mirrors the reference's
loss shape (lambda * 255^2 * MSE + bpp, `rd_loss_intra.py:6-37`) applied to
both layers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models import lssvc as lssvc_model
from .mesh import make_mesh, replicate, shard_batch


def rd_loss(params, batch, lmbda: float, shape_hr, scale_factor, pad_size):
    """Two-frame conditional-coding loss: code frame t against frame t-1.

    batch: dict with x_bl, x_el, ref_bl, ref_el — all NHWC, batch-major.
    """
    out = lssvc_model.forward_one_frame(
        params, batch["x_bl"], batch["x_el"], batch["ref_bl"],
        batch["ref_el"], None, None, shape_hr, scale_factor, pad_size)
    n_el = batch["x_el"].shape[0] * batch["x_el"].shape[1] * batch["x_el"].shape[2]
    n_bl = batch["x_bl"].shape[0] * batch["x_bl"].shape[1] * batch["x_bl"].shape[2]
    mse_el = jnp.mean(jnp.square(out["dpb"]["ref_frame_el"] - batch["x_el"]))
    mse_bl = jnp.mean(jnp.square(out["dpb"]["ref_frame_bl"] - batch["x_bl"]))
    bpp = out["bit_el"] / n_el + out["bit_bl"] / n_bl
    loss = lmbda * (255.0 ** 2) * (mse_el + mse_bl) + bpp
    return loss, {"loss": loss, "bpp": bpp, "mse_el": mse_el, "mse_bl": mse_bl}


def make_optimizer(learning_rate: float = 1e-4):
    return optax.adam(learning_rate)


def make_train_step(optimizer, lmbda: float, shape_hr, scale_factor=2.0,
                    pad_size=(0, 0, 0, 0)):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    metrics); jit-able and shardable."""

    def train_step(params, opt_state, batch):
        grad_fn = jax.value_and_grad(rd_loss, has_aux=True)
        (_, metrics), grads = grad_fn(params, batch, lmbda, shape_hr,
                                      scale_factor, pad_size)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_sharded_train_step(mesh, optimizer, lmbda: float, shape_hr,
                            scale_factor=2.0, pad_size=(0, 0, 0, 0)):
    """Data-parallel train step: batch sharded on axis 0, params replicated.
    XLA lowers the parameter-gradient reduction to an all-reduce over the
    mesh's ICI links."""
    step = make_train_step(optimizer, lmbda, shape_hr, scale_factor, pad_size)
    repl = replicate(mesh)
    data = shard_batch(mesh)
    batch_sharding = {"x_bl": data, "x_el": data, "ref_bl": data,
                      "ref_el": data}
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_sharding),
        out_shardings=(repl, repl, repl),
    )
