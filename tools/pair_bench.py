"""Microbench: train-mode NBt1D pair kernels vs the flax path, per site.

Times, in ONE process on the real TPU, for each flagship chain site
(C, H, W, K) at b8:
  - fused chain_train forward
  - fused value_and_grad (custom VJP backward)
  - flax per-block forward (train mode, BN batch stats)
  - flax value_and_grad
This locates where tools/train_ab.py's small net win (101.5 -> 99.4 ms)
diverges from the traffic model (the kernels should win ~40% per site).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/pair_bench.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=40):
    from emsanet_tpu.utils.timing import queue_difference_timing

    float(fn(*args))
    t, _ = queue_difference_timing(
        lambda: fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def build_blocks(c, k, rng):
    from emsanet_tpu.models.layers import NonBottleneck1D
    import flax.linen as nn

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(k):
                x = NonBottleneck1D(
                    features=c, dropout_p=0.0, name=f"b{i}"
                )(x, train=train, deterministic=not train)
            return x

    return Tail()


def main():
    from emsanet_tpu.ops.nbt1d_train import (
        chain_train, stack_chain_train_params,
    )

    print(f"device={jax.devices()[0].device_kind} b8 bf16", flush=True)
    sites = [(64, 120, 160, 3), (128, 60, 80, 4), (256, 30, 40, 6)]
    rng = np.random.RandomState(0)

    for c, h, w, k in sites:
        x = jnp.asarray(rng.randn(8, h, w, c), jnp.bfloat16)
        tail = build_blocks(c, k, rng)
        variables = tail.init(jax.random.PRNGKey(0), x, train=True)
        params = variables["params"]
        bp = [params[f"b{i}"] for i in range(k)]
        stacked = stack_chain_train_params(bp)
        stacked = jax.tree.map(jnp.asarray, stacked)

        @jax.jit
        def fused_fwd(x, stacked):
            out, m, v = chain_train(x, stacked)
            out = jax.lax.optimization_barrier(out)
            return out.astype(jnp.float32).sum() + m.sum() + v.sum()

        @jax.jit
        def fused_grad(x, stacked):
            g = jax.grad(
                lambda x, s: fused_fwd(x, s), argnums=(0, 1)
            )(x, stacked)
            leaves = jax.tree.leaves(g)
            leaves = jax.lax.optimization_barrier(leaves)
            return sum(l.astype(jnp.float32).sum() for l in leaves)

        @jax.jit
        def flax_fwd(params, x):
            out, mut = tail.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            out = jax.lax.optimization_barrier(out)
            return out.astype(jnp.float32).sum() + sum(
                l.astype(jnp.float32).sum()
                for l in jax.tree.leaves(mut)
            )

        @jax.jit
        def flax_grad(params, x):
            g = jax.grad(
                lambda p, x: flax_fwd(p, x), argnums=(0, 1)
            )(params, x)
            leaves = jax.tree.leaves(g)
            leaves = jax.lax.optimization_barrier(leaves)
            return sum(l.astype(jnp.float32).sum() for l in leaves)

        tf_f = probe(fused_fwd, x, stacked)
        tg_f = probe(fused_grad, x, stacked)
        tf_x = probe(flax_fwd, params, x)
        tg_x = probe(flax_grad, params, x)
        print(
            f"C={c:3d} {h}x{w} K={k}: "
            f"fwd fused {tf_f*1e3:7.3f} ms vs flax {tf_x*1e3:7.3f} ms | "
            f"grad fused {tg_f*1e3:7.3f} ms vs flax {tg_x*1e3:7.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
