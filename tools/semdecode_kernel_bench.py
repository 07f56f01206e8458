"""Bench the fused semantic conv+decode Pallas kernel vs production.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/semdecode_kernel_bench.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

BF = jnp.bfloat16


def probe(name, fn, *args, runs=50):
    from emsanet_tpu.utils.timing import queue_difference_timing

    jfn = jax.jit(fn)
    float(jfn(*args))
    t, _ = queue_difference_timing(
        lambda: jfn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    print(f"{name:52s} {t*1e3:8.3f} ms", flush=True)
    return t


def scalar(tree):
    tree = jax.lax.optimization_barrier(tree)
    return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    args = ap.parse_args()
    n, h2, w2, c = args.batch, 240, 320, 40
    print(f"device={jax.devices()[0].device_kind} b{n} ({h2}x{w2} C{c})",
          flush=True)

    from emsanet_tpu.ops.polyphase_upsample import (
        upsample2x_depthwise_polyphase_deferred,
    )
    from emsanet_tpu.ops.semantic_decode import (
        semantic_decode_fused,
        semantic_decode_reference,
    )
    from emsanet_tpu.postprocessing import postprocess_semantic_polyphase

    x = jax.jit(
        lambda k: jax.random.normal(k, (n, h2, w2, c), jnp.float32).astype(BF)
    )(jax.random.PRNGKey(9))
    kern = jnp.asarray(np.random.RandomState(0).randn(3, 3, 1, c), jnp.float32)

    # numerics on a 1-sample slice vs the jnp oracle on the SAME bf16 data
    xs = x[:1]
    ki, ks = jax.jit(semantic_decode_fused)(xs, kern)
    ri, rs = jax.jit(semantic_decode_reference)(xs, kern)
    mism = np.mean(np.asarray(ki) != np.asarray(ri))
    sdiff = np.abs(np.asarray(ks) - np.asarray(rs, np.float32))
    print(f"numerics: idx mismatch {mism:.2e} (bf16 reorder ties), "
          f"median |dscore| {np.median(sdiff):.2e}", flush=True)
    assert mism < 0.02

    probe("PALLAS fused conv+decode",
          lambda xx: scalar(semantic_decode_fused(xx, kern)),
          x, runs=args.runs)

    probe("REF grouped conv + c-major decode",
          lambda xx: scalar(postprocess_semantic_polyphase(
              upsample2x_depthwise_polyphase_deferred(xx, kern))),
          x, runs=args.runs)


if __name__ == "__main__":
    main()
