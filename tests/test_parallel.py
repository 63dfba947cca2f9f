"""Mesh/sharding unit tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lssvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_data_parallel_grad_matches_single_device():
    """Sharded data-parallel step == unsharded step (XLA-inserted
    all-reduce over the batch shards)."""
    mesh = make_mesh()
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)

    def loss_fn(params, batch):
        pred = batch["x"] @ params["w"] + params["b"]
        return jnp.mean(jnp.square(pred - batch["y"]))

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(rng.random((16, 4, 4)), dtype=jnp.float32),
             "y": jnp.asarray(rng.random((16, 4, 4)), dtype=jnp.float32)}

    repl = replicate(mesh)
    data = shard_batch(mesh)
    sharded_step = jax.jit(step, in_shardings=(repl, repl, {"x": data, "y": data}),
                           out_shardings=(repl, repl, repl))
    p1, _, l1 = sharded_step(params, opt_state, batch)
    p2, _, l2 = jax.jit(step)(params, opt_state, batch)

    assert abs(float(l1) - float(l2)) < 1e-6
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               atol=1e-6)
