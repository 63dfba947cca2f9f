import pytest
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


@pytest.mark.slow
def test_sharded_serving_matches_sequential():
    """8 concurrent streams on the CPU mesh == 8 independent single-stream
    forwards: recon frames identical, per-stream bits identical."""
    from lssvc_tpu.models import lssvc as lssvc_model
    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.parallel.serve import make_serving_step

    mesh = make_mesh()
    params = init_lssvc(0)
    b, hw = 8, (64, 64)
    shape_hr = (hw[0] * 2, hw[1] * 2)
    rng = np.random.default_rng(0)
    r = lambda s: jnp.asarray(rng.random(s), dtype=jnp.float32)
    x_bl = r((b, *hw, 3))
    x_el = r((b, shape_hr[0], shape_hr[1], 3))
    dpb = {
        "ref_frame_bl": r((b, *hw, 3)),
        "ref_feature_bl": r((b, *hw, 64)),
        "ref_frame_el": r((b, shape_hr[0], shape_hr[1], 3)),
        "ref_feature_el": r((b, shape_hr[0], shape_hr[1], 48)),
    }

    step = make_serving_step(mesh, shape_hr=shape_hr)
    dpb_out, bits = step(params, x_bl, x_el, dpb)
    assert bits.shape == (b, 2)

    for i in (0, 3, 7):  # spot-check streams
        out = lssvc_model.forward_one_frame(
            params, x_bl[i:i + 1], x_el[i:i + 1],
            dpb["ref_frame_bl"][i:i + 1], dpb["ref_frame_el"][i:i + 1],
            dpb["ref_feature_bl"][i:i + 1], dpb["ref_feature_el"][i:i + 1],
            shape_hr, 2.0, (0, 0, 0, 0))
        # random-init recons reach +-50; compare relatively (fp32 reduction
        # order differs between the shard_map program and the plain jit)
        np.testing.assert_allclose(
            np.asarray(dpb_out["ref_frame_el"][i]),
            np.asarray(out["dpb"]["ref_frame_el"][0]), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(bits[i, 0]), float(out["bit_bl"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bits[i, 1]), float(out["bit_el"]), rtol=1e-5)
