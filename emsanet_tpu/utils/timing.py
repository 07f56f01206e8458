"""Device timing utilities for the tunneled TPU backend.

On the 'axon' relay backend, `jax.block_until_ready` returns without
waiting for execution, and every device->host readback carries ~100ms
tunnel latency. `queue_difference_timing` therefore:

1. makes the timed function return a 4-byte scalar depending on all
   outputs (caller's responsibility),
2. enqueues N async calls and forces one readback at the end (device
   executes the queue serially),
3. times two queue lengths and divides the difference — the constant
   dispatch + readback overhead cancels, leaving pure device time.

On a normal backend this methodology is still valid (just conservative).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple


def scalar_probe(tree) -> "jax.Array":
    """Reduce an output pytree to one f32 scalar, honestly.

    `optimization_barrier` first: without it XLA dead-code-eliminates
    everything a [0]-element probe does not touch, and even a full-sum
    probe gets algebraically pushed through linear upsamplers, skipping
    real full-resolution head work (53.6 vs 71.5 ms at b32,
    tools/pipeline_bench.py). After the barrier every leaf must
    materialize; the [0] reads then cost nothing extra.
    """
    import jax
    import jax.numpy as jnp

    arrays = [
        leaf for leaf in jax.tree.leaves(tree) if hasattr(leaf, "astype")
    ]
    arrays = jax.lax.optimization_barrier(arrays)
    return sum(leaf.astype(jnp.float32).reshape(-1)[0] for leaf in arrays)


def queue_difference_timing(
    fn: Callable[[], "jax.Array"],
    n_long: int = 80,
    n_short: int = 16,
    repeats: int = 3,
    warmup: int = 2,
) -> Tuple[float, float]:
    """Returns (seconds_per_call_best, seconds_per_call_std).

    fn: zero-arg callable returning a small array whose float() forces
    the whole computation (call `scalar_probe` inside your jit).
    """
    import numpy as np

    for _ in range(max(warmup, 1)):
        float(fn())

    def timed(n_runs: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n_runs - 1):
            fn()
        float(fn())
        return time.perf_counter() - t0

    per_call = []
    for _ in range(repeats):
        ts = timed(n_short)
        tl = timed(n_long)
        per_call.append((tl - ts) / (n_long - n_short))
    return float(min(per_call)), float(np.std(per_call))
