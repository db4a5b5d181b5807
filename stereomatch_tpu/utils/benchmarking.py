"""Timing utilities that survive hostile PJRT transports.

Some transports (e.g. remote-relay TPU plugins) add a large, noisy host
round-trip to every result fetch and make per-call ``block_until_ready``
unreliable, so naive timing is off by orders of magnitude.  The robust
measurement is the *marginal* cost of one iteration between two
data-dependent chain lengths compiled as one program, fetching a single
scalar:

    t_op = (t(chain_3k) - t(chain_k)) / 2k

which cancels dispatch/transfer constants exactly.  ``bench.py`` and
``benchmarks/suite.py`` are built on this.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def chain_runner(body_fn: Callable):
    """Wrap ``body_fn(carry) -> carry`` into ``run(args, n)`` returning a
    scalar after n chained iterations (one compiled program)."""

    @jax.jit
    def run(args, n):
        out = lax.fori_loop(0, n, lambda _, c: body_fn(c), args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)

    return run


def best_of(run, args, n, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        float(run(args, n))
        best = min(best, time.perf_counter() - start)
    return best


def marginal_ms(body_fn: Callable, args, chain_k: int = 8,
                repeats: int = 5) -> float:
    """Marginal per-iteration milliseconds of ``body_fn`` (see module doc)."""
    run = chain_runner(body_fn)
    float(run(args, 1))                  # compile
    ta = best_of(run, args, chain_k, repeats)
    tb = best_of(run, args, 3 * chain_k, repeats)
    return max(tb - ta, 0.0) / (2 * chain_k) * 1e3
