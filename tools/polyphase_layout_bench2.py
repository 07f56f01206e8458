"""Round 2 of the deferred-decode layout A/B (see polyphase_layout_bench).

Variants (all include producer + decode in ONE jit on real shapes):
  A. grouped conv (c-major) + lane-permute to parity-major + pmajor decode
  B. shifted-add producer building a parity-major (N,H/2,W/2,4,C)
     accumulator, barriered (materialized), then pmajor decode
  C. same as B without the barrier (XLA free to fuse producer into the
     three reductions)
  REF. grouped conv + c-major decode (current production, for scale)

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/polyphase_layout_bench2.py
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


def interleave22(a):
    n, h2, w2, _, _ = a.shape
    a = jnp.transpose(a, (0, 1, 3, 2, 4))
    return a.reshape(n, 2 * h2, 2 * w2)


def decode_rank5(y):
    """y: (N, H/2, W/2, 4, C) parity-major planes."""
    idx = jnp.argmax(y, axis=-1).astype(jnp.int32)
    mx = jnp.max(y, axis=-1)
    sumexp = jnp.sum(jnp.exp((y - mx[..., None]).astype(jnp.float32)), axis=-1)
    score = 1.0 / sumexp
    n, h2, w2, _ = idx.shape
    return {
        "segmentation_idx": interleave22(idx.reshape(n, h2, w2, 2, 2)),
        "score": interleave22(score.reshape(n, h2, w2, 2, 2)),
    }


def shifted_parity_major(x, kernel):
    """(N,H,W,C) -> (N,H,W,4,C) parity-major via 9 shifted MACs."""
    from emsanet_tpu.ops.polyphase_upsample import polyphase_kernels

    n, h, w, c = x.shape
    kp = polyphase_kernels(kernel).astype(x.dtype)  # (3,3,1,4C) c-major
    kp = kp.reshape(3, 3, c, 4)  # [di, dj, c, parity]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, h, w, 4, c), x.dtype)
    for di in range(3):
        for dj in range(3):
            tap = xp[:, di : di + h, dj : dj + w, :]  # (N,H,W,C)
            acc = acc + tap[:, :, :, None, :] * jnp.transpose(
                kp[di, dj], (1, 0)
            )[None, None, None, :, :]
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    args = ap.parse_args()
    n, h2, w2, c = args.batch, 240, 320, 40
    print(f"device={jax.devices()[0].device_kind} b{n} ({h2}x{w2} C{c})",
          flush=True)

    from emsanet_tpu.ops.polyphase_upsample import (
        depth_to_space,
        upsample2x_depthwise_polyphase_deferred,
    )
    from emsanet_tpu.postprocessing import postprocess_semantic_polyphase

    x = jax.jit(
        lambda k: jax.random.normal(k, (n, h2, w2, c), jnp.float32).astype(BF)
    )(jax.random.PRNGKey(9))
    kern = jnp.asarray(np.random.RandomState(0).randn(3, 3, 1, c), jnp.float32)

    perm = jnp.asarray(
        np.arange(4 * c).reshape(c, 4).T.reshape(-1), jnp.int32
    )  # cmajor -> pmajor channel order

    # numerics on a 1-sample slice (multi-GB readbacks stall the tunnel)
    xs = x[:1]
    yg = jax.jit(
        lambda xx: upsample2x_depthwise_polyphase_deferred(xx, kern)
    )(xs)
    ys = jax.jit(lambda xx: shifted_parity_major(xx, kern))(xs)
    a = np.asarray(yg, np.float32).reshape(1, h2, w2, c, 4)
    b = np.asarray(ys, np.float32).transpose(0, 1, 2, 4, 3)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    da = jax.jit(lambda y: postprocess_semantic_polyphase(y))(yg)
    db = jax.jit(decode_rank5)(ys)
    same = np.mean(
        np.asarray(da["segmentation_idx"]) == np.asarray(db["segmentation_idx"])
    )
    print(f"numerics ok (idx agreement {same:.6f})", flush=True)

    probe("REF grouped conv + c-major decode",
          lambda xx: scalar(postprocess_semantic_polyphase(
              upsample2x_depthwise_polyphase_deferred(xx, kern))),
          x, runs=args.runs)

    def variant_a(xx):
        y = upsample2x_depthwise_polyphase_deferred(xx, kern)
        yp = y[..., perm].reshape(n, h2, w2, 4, c)
        return scalar(decode_rank5(yp))

    probe("A grouped conv + permute + pmajor decode", variant_a, x,
          runs=args.runs)

    def variant_b(xx):
        y = jax.lax.optimization_barrier(shifted_parity_major(xx, kern))
        return scalar(decode_rank5(y))

    probe("B shifted-add pmajor (materialized) + decode", variant_b, x,
          runs=args.runs)

    def variant_c(xx):
        return scalar(decode_rank5(shifted_parity_major(xx, kern)))

    probe("C shifted-add pmajor (fused) + decode", variant_c, x,
          runs=args.runs)

    # for scale: full-res interleave path
    probe("OLD interleave + fullres decode",
          lambda xx: scalar(__import__(
              "emsanet_tpu.postprocessing", fromlist=["postprocess_semantic"]
          ).postprocess_semantic(depth_to_space(
              upsample2x_depthwise_polyphase_deferred(xx, kern)))),
          x, runs=args.runs)


if __name__ == "__main__":
    main()
