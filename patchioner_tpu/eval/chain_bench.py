"""Dispatch-amortized op timing for remote-TPU tunnels.

Micro-benchmarks through the axon tunnel carry a ~30 ms per-call dispatch
floor that swamps ops in the 20-60 ms range (PERF.md round 1 mistook a tied
attention A/B for this reason). `chain_time` runs CHAIN dependent copies of
the op inside ONE jitted program (`lax.fori_loop`, output feeds the next
input), so the floor divides by CHAIN — and since round 4 the residual
floor/CHAIN is measured directly (an identical zero-link program with the
same dispatch + one-element sync) and subtracted, so the per-op number
reflects on-chip time rather than ~(dispatch+sync)/CHAIN of phantom RPC.
"""

from __future__ import annotations

import time
from typing import Callable

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
    subtract_floor: bool = True,
) -> dict:
    """Time `fn(x, *consts) -> x'` chained `chain` times inside one jit.

    `fn` must map its first argument to an output of the same shape (an
    attention op, an encoder layer, ...). `cast` optionally coerces the
    output dtype back to the input's between links.

    `subtract_floor` (default) also times a ZERO-link program with the same
    jit-dispatch and one-element sync, and subtracts its best span before
    dividing by `chain` — on the tunnel the dispatch+sync floor is tens of
    ms and would otherwise survive as floor/chain per op. Returns
    {"per_op_ms": best, "times_ms": all reps (floor-corrected),
     "floor_ms": best zero-link span, "compile_s": first-call}.
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

    @jax.jit
    def run_floor(x, *cs):
        # same signature/output tree, zero op links: measures exactly the
        # dispatch + sync overhead the real spans carry
        return x

    def sync(out):
        # ONE device op (indexing) + host copy: block_until_ready is a
        # no-op on the remote-TPU backend (CLAUDE.md), and a ravel()[0]
        # pair would pay two dispatches per sync
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    t0 = time.perf_counter()
    sync(run(x0, *consts))
    compile_s = time.perf_counter() - t0
    floor_s = 0.0
    if subtract_floor:
        sync(run_floor(x0, *consts))  # absorb its (trivial) compile
        floors = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run_floor(x0, *consts))
            floors.append(time.perf_counter() - t0)
        floor_s = min(floors)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(x0, *consts))
        span = time.perf_counter() - t0
        times.append(max(span - floor_s, 0.0) / chain * 1000)
    return {
        "per_op_ms": min(times),
        "times_ms": times,
        "floor_ms": floor_s * 1000,
        "compile_s": compile_s,
    }
