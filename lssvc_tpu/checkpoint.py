"""Native checkpoint format: flat param dicts in a single .npz.

The reference only consumes torch .pth files (weights-only,
`test.py:541-557`); this adds a torch-free native format plus conversion
helpers in both directions.  Keys are the torch-style names, values are the
TPU-layout arrays (HWIO convs etc.), so save(load(x)) round-trips exactly
and `convert.py` remains the single source of layout truth.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_params(path: str, params: dict, metadata: dict | None = None):
    arrays = {k: np.asarray(v) for k, v in params.items()}
    if metadata:
        for mk, mv in metadata.items():
            arrays[f"__meta__{mk}"] = np.asarray(mv)
    np.savez(path, **arrays)


def load_params(path: str, device_put: bool = True):
    """Returns (params, metadata)."""
    data = np.load(path, allow_pickle=False)
    params = {}
    metadata = {}
    for k in data.files:
        if k.startswith("__meta__"):
            metadata[k[len("__meta__"):]] = data[k]
        elif k.startswith("__opt__"):
            pass  # a .state.npz passed as a weights file: skip Adam moments
        else:
            params[k] = jnp.asarray(data[k]) if device_put else data[k]
    return params, metadata


def save_train_state(path: str, params: dict, opt_state, step: int,
                     out_tag: str | None = None):
    """Training checkpoint: params + flattened optimizer state.

    ``out_tag`` identifies the producing run (train.py passes its --out
    prefix).  Resume logic uses it to distinguish a same-stage crash
    resume (restore moments + step) from a cross-stage handoff (fresh
    optimizer, step 0) — the round-3 RD pipeline deadlocked because all
    video stages share the optimizer *structure*, so a structure-mismatch
    exception could not tell the stages apart and a cascade stage resumed
    at the full stage's step count, ran zero steps, and saved nothing.
    """
    import jax

    flat, treedef = jax.tree.flatten(opt_state)
    arrays = {f"__opt__{i}": np.asarray(a) for i, a in enumerate(flat)}
    arrays.update({k: np.asarray(v) for k, v in params.items()})
    arrays["__meta__step"] = np.asarray(step)
    arrays["__meta__n_opt"] = np.asarray(len(flat))
    if out_tag is not None:
        arrays["__meta__out_tag"] = np.asarray(out_tag)
    np.savez(path, **arrays)


def read_ckpt_meta(path: str) -> dict:
    """Read only the ``__meta__*`` entries of a checkpoint (np.load is
    lazy per-key, so this never materializes the weight arrays)."""
    data = np.load(path, allow_pickle=False)
    return {k[len("__meta__"):]: data[k] for k in data.files
            if k.startswith("__meta__")}


def load_train_state(path: str, opt_state_template):
    """Restore (params, opt_state, step); opt_state_template provides the
    pytree structure (e.g. optimizer.init(params))."""
    import jax

    data = np.load(path, allow_pickle=False)
    n_opt = int(data["__meta__n_opt"])
    flat = [jnp.asarray(data[f"__opt__{i}"]) for i in range(n_opt)]
    _, treedef = jax.tree.flatten(opt_state_template)
    opt_state = jax.tree.unflatten(treedef, flat)
    params = {k: jnp.asarray(data[k]) for k in data.files
              if not k.startswith(("__opt__", "__meta__"))}
    return params, opt_state, int(data["__meta__step"])
