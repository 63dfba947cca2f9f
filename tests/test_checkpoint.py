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


def test_train_state_out_tag_roundtrip(tmp_path):
    """out_tag (the producing run's --out prefix) survives the npz and is
    readable without loading weights."""
    from lssvc_tpu.checkpoint import read_ckpt_meta

    params = {"w": jnp.ones((4, 4))}
    opt = optax.adam(1e-3)
    p = str(tmp_path / "train.state.npz")
    save_train_state(p, params, opt.init(params), step=7,
                     out_tag="runs/rd/base_full")
    meta = read_ckpt_meta(p)
    assert str(meta["out_tag"]) == "runs/rd/base_full"
    assert int(meta["step"]) == 7
    # untagged files read back with no out_tag key (legacy compat)
    p2 = str(tmp_path / "legacy.state.npz")
    save_train_state(p2, params, opt.init(params), step=3)
    assert "out_tag" not in read_ckpt_meta(p2)


def test_resume_policy_cross_stage_resets():
    """The round-3 RD deadlock class: a later stage resuming a finished
    earlier stage's state must NOT inherit its step counter."""
    from train import resume_policy

    # tagged: tag match = crash resume, mismatch = stage handoff,
    # regardless of step counts
    assert resume_policy("runs/rd/full", 2400, "runs/rd/full", 2400) == "crash"
    assert resume_policy("runs/rd/full", 500, "runs/rd/full", 2400) == "crash"
    assert resume_policy("runs/rd/full", 2400, "runs/rd/cascade", 1200) == "stage"
    assert resume_policy("runs/rd/full", 100, "runs/rd/cascade", 1200) == "stage"
    # untagged legacy: step >= steps can only be a finished other stage
    assert resume_policy("", 2400, "runs/rd/cascade", 1200) == "stage"
    assert resume_policy("", 1200, "runs/rd/ft", 600) == "stage"
    assert resume_policy("", 500, "runs/rd/full", 2400) == "crash"


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
