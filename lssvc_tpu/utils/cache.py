"""Persistent-compile-cache setup.

The cache directory is qualified by backend platform.  A single shared
directory is NOT safe: XLA:CPU AOT entries written by a process whose
target config differs (e.g. the TPU compile-helper environment sets
`+prefer-no-gather/+prefer-no-scatter` machine features) are loaded by
later CPU processes anyway — jax's cache key does not cover those target
features — so a run executes a mix of fresh and foreign-flag executables.
That breaks cross-process bit-reproducibility of the codec (observed:
byte-different rANS streams for identical inputs/weights per process) and
risks SIGILL on feature-mismatched hosts.

Per-platform directories keep every entry self-consistent with the
processes that read it.  Cross-MACHINE float portability is a separate,
fundamental caveat documented in docs/PERFORMANCE.md.

Round-2 addendum: per-platform alone is insufficient.  A process pinned
to the CPU platform but launched inside the remote-compile environment
(PALLAS_AXON_REMOTE_COMPILE set) produces XLA:CPU AOT entries targeting
the *helper machine's* features; a plain-CPU process sharing the same
`-cpu` directory then loads them with a machine-feature-mismatch warning
("could lead to execution errors such as SIGILL").  The directory is now
additionally qualified with `-rc` when the remote-compile marker is
present, so each compile environment owns its entries.
"""

from __future__ import annotations

import os


def enable_compile_cache(base: str | None = None):
    import jax

    base = base or os.environ.get("LSSVC_COMPILE_CACHE", "/tmp/jaxcache")
    path = f"{base}-{jax.default_backend()}"
    if (jax.default_backend() == "cpu"
            and os.environ.get("PALLAS_AXON_REMOTE_COMPILE")):
        # TPU compiles always ride the helper, so the TPU dir is already
        # self-consistent; only the CPU dir mixes environments.
        path += "-rc"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
