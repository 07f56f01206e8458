"""Bounded diagnosis of the Pallas-DMA timing bimodality (VERDICT r3 #5).

Observed (tools/decode_ab.py, round 3): the SAME semantic-decode kernel
code measured 3.96 vs 7.24-7.28 ms standalone in different processes
(and 5.5-5.7 ms minutes later within one process), while pure-XLA
programs are stable +-1% across processes. Hypotheses:

  H1 compile lottery — the remote compiler (no persistent cache works
     here) makes different scheduling decisions per compilation of
     identical code. Test: compile N IDENTICAL copies of the kernel
     program in ONE process (distinct Python closures force distinct
     jit cache entries) and compare. Copies disagreeing > ~10% confirms
     H1; mitigation = compile several, deploy the fastest.
  H2 time-varying environment (time-shared tunnel / thermal / HBM
     contention) — the same COMPILED executable drifts over time.
     Test: re-measure copy #0 after every other copy, interleaved with
     the XLA anchor. Drift in copy0 while the anchor holds confirms H2
     for kernel programs specifically.
  H3 memory placement — buffer addresses differ per allocation; DMA
     efficiency depends on them. Test: re-allocate fresh inputs and
     re-measure the same executable (new buffers, no recompile).

Run this N times across sessions and compare: one process cannot see
cross-process regime changes, so the tool prints a single JSON-ish line
per measurement for easy aggregation.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bimodal_probe.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=50):
    from emsanet_tpu.utils.timing import queue_difference_timing

    float(fn(*args))
    t, _ = queue_difference_timing(
        lambda: fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=4)
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from emsanet_tpu.ops.semantic_decode import semantic_decode_fused

    n, hh, wh, c = args.batch, 240, 320, 40
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, hh, wh, c), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)

    # stable pure-XLA anchor: a bandwidth-bound elementwise+reduce
    # program of comparable footprint
    @jax.jit
    def anchor(x):
        y = x.astype(jnp.float32)
        return (y * 1.0001 + 0.5).sum() + (y * y).sum()

    def make_copy(i):
        # distinct closure -> distinct jit cache entry -> fresh compile
        @jax.jit
        def run(x, kernel, _i=i):
            idx, score = semantic_decode_fused(x, kernel)
            out = jax.lax.optimization_barrier((idx, score))
            return out[0].astype(jnp.float32).sum() + out[1].sum()

        return run

    t0 = time.time()
    copies = [make_copy(i) for i in range(args.copies)]
    print(f"device={jax.devices()[0].device_kind} b={args.batch} "
          f"copies={args.copies}", flush=True)

    a0 = probe(anchor, x, runs=args.runs)
    print(f"t={time.time()-t0:7.1f}s anchor      {a0*1e3:7.3f} ms",
          flush=True)

    times = []
    for i, fn in enumerate(copies):
        t = probe(fn, x, kernel, runs=args.runs)
        times.append(t)
        print(f"t={time.time()-t0:7.1f}s copy{i} (fresh compile) "
              f"{t*1e3:7.3f} ms", flush=True)
        # H2: re-measure copy0's executable after each new compile
        t00 = probe(copies[0], x, kernel, runs=args.runs)
        print(f"t={time.time()-t0:7.1f}s copy0 (re-measure)    "
              f"{t00*1e3:7.3f} ms", flush=True)

    # H3: same executables, fresh buffers
    x2 = jnp.asarray(rng.randn(n, hh, wh, c), jnp.bfloat16)
    k2 = jnp.asarray(kernel) + 0.0
    t03 = probe(copies[0], x2, k2, runs=args.runs)
    print(f"t={time.time()-t0:7.1f}s copy0 (fresh buffers) "
          f"{t03*1e3:7.3f} ms", flush=True)

    a1 = probe(anchor, x, runs=args.runs)
    print(f"t={time.time()-t0:7.1f}s anchor (end)          "
          f"{a1*1e3:7.3f} ms", flush=True)

    spread = (max(times) - min(times)) / min(times)
    print(f"RESULT copies spread={spread*100:.1f}% "
          f"min={min(times)*1e3:.3f} max={max(times)*1e3:.3f} "
          f"anchor_drift={(a1-a0)/a0*100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
