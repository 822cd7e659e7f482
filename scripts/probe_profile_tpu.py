"""TPU probe: jax.profiler timeline of the flagship caption step.

Round-3 discovery: `jax.profiler.trace` WORKS through the axon tunnel
(device pid with "XLA Ops" events lands in the trace.json.gz). This
script warms the flagship caption step, profiles a few steady-state
iterations, and aggregates device-op durations by name — the direct
answer to "where do the 331 ms/batch actually go", replacing the
round-1/2 indirect accounting (chain timers + analytic rooflines).

Usage: python -m scripts.probe_profile_tpu [iters] [batch]
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

PROFILE_DIR = "/tmp/patchioner_profile_flagship"


def aggregate(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    # device pid: process named /device:TPU:*
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU" in str(e.get("args", {}).get("name", ""))
    }
    tid_names = {
        (e["pid"], e.get("tid")): e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    by_op = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if tid_names.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        # strip uniquifying suffixes: fusion.123 -> fusion
        base = name.split(".")[0]
        by_op[base] += dur
        calls[base] += 1
        total += dur
    return by_op, calls, total


def main():
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as entry_mod

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "batch": batch or "entry-default(4)"}))
    sys.stdout.flush()
    fn, args = entry_mod.entry()
    if batch:  # rebuild the example args at the bench batch
        state = args[0]
        rng = np.random.default_rng(0)
        args = (
            state,
            jnp.asarray(rng.standard_normal((batch, 518, 518, 3)),
                        jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (batch, 64, 2)), jnp.float32),
            jnp.ones((batch, 64), jnp.float32),
        )
    jfn = jax.jit(fn)

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    t0 = time.time()
    sync(jfn(*args))
    print(json.dumps({"warmup_s": round(time.time() - t0, 1)}))
    sys.stdout.flush()

    with jax.profiler.trace(PROFILE_DIR):
        for _ in range(iters):
            out = jfn(*args)
        sync(out)

    by_op, calls, total = aggregate(PROFILE_DIR)
    print(json.dumps({"device_total_ms": round(total, 1),
                      "per_iter_ms": round(total / iters, 1),
                      "iters": iters}))
    for op, ms in by_op.most_common(20):
        print(json.dumps({"op": op, "ms_total": round(ms, 1),
                          "ms_per_iter": round(ms / iters, 2),
                          "calls": calls[op]}))


if __name__ == "__main__":
    main()
