"""Shared chained-dependency timing harness for the tools/ microbenches.

The methodology is load-bearing for every number in docs/PERFORMANCE.md:

- K-deep data-dependent chains with one scalar fetch at the end (forces
  serial device execution; sidesteps remote-execution timing artifacts);
- a 1-iteration run subtracted to cancel fixed sync overheads;
- re-measure until two consecutive readings agree within 10% and report
  the best (a reading right after a fresh remote-helper compile can be
  10-20x slow — docs/PERFORMANCE.md §measurement-hazard).

bench.py keeps its own copy inline (it must stay a dependency-free
single-file driver entry point); every tools/ microbench imports this.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def stable_measure(run_chain, k: int, retries: int = 4) -> float:
    """Seconds per iteration of `run_chain(n)` (which must execute n
    chained iterations and block on the result)."""
    def measure():
        t0 = time.time(); run_chain(1); t1 = time.time() - t0
        t0 = time.time(); run_chain(1 + k); tm = time.time() - t0
        return (tm - t1) / k

    run_chain(1)  # compile + warm
    best = measure()
    for _ in range(retries):
        dt = measure()
        stable = abs(dt - best) <= 0.1 * min(dt, best)
        best = min(best, dt)
        if stable:
            break
    return best


def bench_step(name: str, step, x0, k: int, width: int = 52) -> float:
    """Time a jitted NHWC step function via an epsilon-feedback chain (the
    zero-scaled output scalar forces the data dependence without changing
    the computed values)."""
    def run_chain(n):
        eps = jnp.zeros((), dtype=x0.dtype)
        for _ in range(n):
            y = step(x0 + eps)
            eps = 0.0 * jnp.sum(y[0, 0, 0, :1]).astype(x0.dtype)
        return float(np.asarray(eps))

    dt = stable_measure(run_chain, k)
    print(f"{name:{width}s} {dt * 1e3:9.2f} ms", flush=True)
    return dt
