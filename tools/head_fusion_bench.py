"""Honest (materialization-barrier) timing of the full-res head chains.

The round-2 pipeline bench exposed that sum-probes let XLA push the
reduction through the linear upsamplers and skip full-res head work
entirely (53.6 vs 71.5 ms at b32). Every probe here wraps outputs in
`jax.lax.optimization_barrier` so the numbers reflect the deployed path.

One process, one TPU job. Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/head_fusion_bench.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from emsanet_tpu.ops.polyphase_upsample import upsample2x_depthwise_polyphase
from emsanet_tpu.postprocessing import postprocess_semantic
from emsanet_tpu.utils.timing import queue_difference_timing

BF = jnp.bfloat16


def time_fn(name, fn, *args, runs=40):
    jfn = jax.jit(
        lambda *a: jax.tree.map(
            lambda t: t.astype(jnp.float32).sum(),
            jax.lax.optimization_barrier(fn(*a)),
        )
    )
    probe = jax.jit(lambda *a: sum(jax.tree.leaves(jfn(*a))))
    float(probe(*args))
    t, _ = queue_difference_timing(
        lambda: probe(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    print(f"{name:58s} {t*1e3:8.3f} ms", flush=True)
    return t


def _dev(key, shape, dtype=BF):
    return jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(dtype)
    )(jax.random.PRNGKey(key))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} batch={n}", flush=True)

    k3 = _dev(100, (3, 3, 1, 40))
    k3b = _dev(101, (3, 3, 1, 40))

    def chain(x, k1, k2):
        return upsample2x_depthwise_polyphase(
            upsample2x_depthwise_polyphase(x, k1), k2
        )

    x40 = _dev(0, (n, 120, 160, 40))
    time_fn("semantic poly-up x4 chain 40ch (materialized)",
            chain, x40, k3, k3b)
    time_fn("semantic chain + argmax/score (current path)",
            lambda x, a, b: postprocess_semantic(chain(x, a, b)),
            x40, k3, k3b)
    time_fn("argmax/score on premade fullres 40ch",
            postprocess_semantic, _dev(1, (n, 480, 640, 40)))

    for c, key in ((1, 2), (2, 3)):
        kc = _dev(110 + c, (3, 3, 1, c))
        kc2 = _dev(120 + c, (3, 3, 1, c))
        xc = _dev(key, (n, 120, 160, c))
        time_fn(f"instance-head poly-up x4 chain {c}ch (materialized)",
                chain, xc, kc, kc2)


if __name__ == "__main__":
    main()
