"""Dispatch-amortized op timing for remote-TPU tunnels.

Micro-benchmarks through the axon tunnel carry a ~30 ms per-call dispatch
floor that swamps ops in the 20-60 ms range (PERF.md round 1 mistook a tied
attention A/B for this reason). `chain_time` runs CHAIN dependent copies of
the op inside ONE jitted program (`lax.fori_loop`, output feeds the next
input), so the floor divides by CHAIN and the per-op number reflects on-chip
time.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np

import jax

__all__ = ["chain_time"]


def chain_time(
    fn: Callable,
    x0,
    *consts,
    chain: int = 8,
    reps: int = 3,
    cast=None,
) -> dict:
    """Time `fn(x, *consts) -> x'` chained `chain` times inside one jit.

    `fn` must map its first argument to an output of the same shape (an
    attention op, an encoder layer, ...). `cast` optionally coerces the
    output dtype back to the input's between links. Returns
    {"per_op_ms": best, "times_ms": all reps, "compile_s": first-call}.
    """

    # consts enter as jit *arguments* — closing over device arrays would bake
    # them into the HLO as constants (CLAUDE.md: a 1.8 GB closure constant
    # once made a compile take 25 min over the tunnel).
    @jax.jit
    def run(x, *cs):
        def body(_, acc):
            y = fn(acc, *cs)
            return y.astype(cast) if cast is not None else y

        return jax.lax.fori_loop(0, chain, body, x)

    def sync(out):
        # device->host copy of one element: block_until_ready is a no-op on
        # the remote-TPU backend (CLAUDE.md)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    t0 = time.perf_counter()
    sync(run(x0, *consts))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(x0, *consts))
        times.append((time.perf_counter() - t0) / chain * 1000)
    return {
        "per_op_ms": min(times),
        "times_ms": times,
        "compile_s": compile_s,
    }
