"""Fast compile-and-time probe for the fused train-head loss kernel.

Compiles just loss + grad at the production shape (b8, 240x320, C40)
instead of the whole train step — iterate on Mosaic lowering errors in
~1 min instead of ~8.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/train_head_compile_probe.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=40)
    ap.add_argument("--time", action="store_true",
                    help="also time loss-only and loss+grad vs the "
                    "unfused reference")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    from emsanet_tpu.ops.semantic_train_head import (
        _fused_loss,
        semantic_head_loss_reference,
    )
    from emsanet_tpu.utils.timing import queue_difference_timing

    n, h2, w2, c = args.batch, 240, 320, 40
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h2, w2, c), jnp.float32).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.randn(3, 3, 1, c) * 0.3, jnp.float32)
    tgt = jnp.asarray(
        rng.randint(0, c + 1, (n, 2 * h2, 2 * w2)), jnp.int32
    )
    cw = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)

    def fused(x, k):
        return _fused_loss(0.0, False, x, k, tgt, cw)

    def ref(x, k):
        return semantic_head_loss_reference(x, k, tgt, cw, 0.0)

    print("compiling fused loss fwd...", flush=True)
    lf = jax.jit(fused).lower(x, k).compile()
    print("fwd OK", flush=True)

    def fused_vg(x, k):
        val, (gx, gk) = jax.value_and_grad(fused, argnums=(0, 1))(x, k)
        return val + jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gk)

    def ref_vg(x, k):
        val, (gx, gk) = jax.value_and_grad(ref, argnums=(0, 1))(x, k)
        return val + jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gk)

    print("compiling fused loss+grad...", flush=True)
    gf = jax.jit(fused_vg).lower(x, k).compile()
    print("bwd OK", flush=True)

    lv = float(lf(x, k))
    rv = float(jax.jit(ref)(x, k))
    print(f"loss fused={lv:.6f} ref={rv:.6f} (|d|={abs(lv-rv):.2e})",
          flush=True)
    gv = float(gf(x, k))
    rgv = float(jax.jit(ref_vg)(x, k))
    print(f"loss+gradsum fused={gv:.6f} ref={rgv:.6f}", flush=True)

    if args.time:
        def probe(fn):
            float(fn(x, k))
            t, _ = queue_difference_timing(
                lambda: fn(x, k), n_long=args.runs,
                n_short=max(args.runs // 4, 2),
            )
            return t

        rg = jax.jit(ref_vg)
        print(f"fused loss fwd:      {probe(lf)*1e3:8.2f} ms", flush=True)
        print(f"fused loss+grad:     {probe(gf)*1e3:8.2f} ms", flush=True)
        print(f"ref   loss+grad:     {probe(rg)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
