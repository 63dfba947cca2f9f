"""Native checkpoint round-trips."""

import numpy as np

import jax.numpy as jnp
import optax

from lssvc_tpu.checkpoint import (
    load_params, load_train_state, save_params, save_train_state,
)


def test_params_roundtrip(tmp_path):
    params = {"a.weight": jnp.ones((3, 3, 4, 8)),
              "b.bias": jnp.arange(8, dtype=jnp.float32)}
    p = str(tmp_path / "ckpt.npz")
    save_params(p, params, metadata={"step": 7})
    loaded, meta = load_params(p)
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      np.asarray(params[k]))
    assert int(meta["step"]) == 7


def test_train_state_roundtrip(tmp_path):
    params = {"w": jnp.ones((4, 4))}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    p = str(tmp_path / "train.npz")
    save_train_state(p, params, opt_state, step=42)
    params2, opt_state2, step = load_train_state(p, opt.init(params))
    assert step == 42
    np.testing.assert_array_equal(np.asarray(params2["w"]),
                                  np.asarray(params["w"]))
    import jax

    flat1, _ = jax.tree.flatten(opt_state)
    flat2, _ = jax.tree.flatten(opt_state2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
