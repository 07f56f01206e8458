"""On-device A/B: XLA NBt1D chain vs fused Pallas chain (ops/nbt1d_chain).

Runs on the real TPU (axon backend), one process, queue-difference
timing (CLAUDE.md). Prints per-shape ms and the projected full-forward
saving. Usage: python tools/chain_bench.py [--batch 32]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from emsanet_tpu.models.layers import NonBottleneck1D
from emsanet_tpu.ops.nbt1d_chain import nbt1d_chain, stack_chain_params
from emsanet_tpu.utils.timing import queue_difference_timing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=60)
    args = ap.parse_args()
    n = args.batch

    # (K, H, W, C, count-in-flagship-graph)
    shapes = [
        (3, 120, 160, 64, 2),    # enc stage0 x2 modalities
        (3, 60, 80, 128, 2),     # enc stage1 tail x2
        (5, 30, 40, 256, 2),     # enc stage2 tail x2
        (3, 60, 80, 256, 2),     # dec module1 x2 decoders
        (3, 120, 160, 128, 2),   # dec module2 x2 decoders
    ]
    print(f"device={jax.devices()[0].device_kind} batch={n}")
    total_xla = total_fused = 0.0
    for k, h, w, c, count in shapes:
        class Chain(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = x
                for i in range(k):
                    y = NonBottleneck1D(
                        features=c, dtype=jnp.bfloat16, name=f"block{i}"
                    )(y, train=train)
                return y

        m = Chain()
        rng = jax.random.PRNGKey(0)
        xs = jax.random.normal(rng, (1, 8, 16, c), jnp.bfloat16)
        v = m.init(rng, xs)
        stacked = stack_chain_params(
            [v["params"][f"block{i}"] for i in range(k)],
            [v["batch_stats"][f"block{i}"] for i in range(k)],
        )
        stacked = jax.tree.map(jnp.asarray, stacked)
        x = jax.random.normal(rng, (n, h, w, c), jnp.bfloat16)

        xla_fn = jax.jit(lambda v, x: m.apply(v, x, train=False)
                         .astype(jnp.float32).sum())
        fused_fn = jax.jit(lambda x, s: nbt1d_chain(x, s)
                           .astype(jnp.float32).sum())

        t_xla, _ = queue_difference_timing(
            lambda: xla_fn(v, x), n_long=args.runs, n_short=args.runs // 4)
        t_fused, _ = queue_difference_timing(
            lambda: fused_fn(x, stacked), n_long=args.runs,
            n_short=args.runs // 4)
        total_xla += t_xla * count
        total_fused += t_fused * count
        gbytes = 2 * n * h * w * c * 2 / 1e9
        print(
            f"K={k} ({n},{h},{w},{c}) x{count}: "
            f"xla {t_xla*1e3:7.3f} ms  fused {t_fused*1e3:7.3f} ms  "
            f"speedup {t_xla/t_fused:5.2f}x  "
            f"(min-traffic bound ~{gbytes/0.8*1e3:.3f} ms @0.8TB/s)"
        )
    print(
        f"TOTAL over flagship chains: xla {total_xla*1e3:.2f} ms  "
        f"fused {total_fused*1e3:.2f} ms  "
        f"saving {1e3*(total_xla-total_fused):.2f} ms/batch"
    )


if __name__ == "__main__":
    main()
