"""Honor JAX_PLATFORMS=cpu in entry points.

The deployment terminal's sitecustomize registers the TPU backend at
interpreter start, so the JAX_PLATFORMS environment variable alone does
not keep a process off the chip — `jax.config.update("jax_platforms",
...)` must also run before the first JAX use (tests/conftest.py applies
the same fix for the suite).  Entry points (train.py, test.py, tools/*)
call `pin_platform_from_env()` first thing so `JAX_PLATFORMS=cpu python
train.py ...` reliably runs on CPU — required for host-only runs while
the single tunneled chip is busy, and for hermetic CI.
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
