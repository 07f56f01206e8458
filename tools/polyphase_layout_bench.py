"""A/B the channel layout of the deferred polyphase semantic decode.

CONCLUDED (round 3; this file is the surviving generation of three —
bench2 tested permute/shifted-add parity-major producers, bench3 tested
NCHW-domain decode; both deleted, conclusions here and in CLAUDE.md):
XLA canonicalizes EVERY logical-layout variant (c-major, parity-major
permute, shifted-add accumulator, NCHW conv out + major-axis slices,
four depthwise convs) back to the same ~14.4 ms conv+decode program at
b32 — layout games at the XLA level are a dead end. Only a Pallas
kernel that owns the layout wins: ops/semantic_decode.py (channel-major
input, classes on sublanes, W on lanes) runs conv+decode in 7.3 ms.

tools/postproc_real_probe.py measured the c-major decode
(postprocess_semantic_polyphase on the grouped-conv (N,H/2,W/2,4C)
output, channel = c*4 + parity) at 10.9 ms b32 — the argmax/max/sumexp
reduce over a stride-4 lane axis, which XLA lowers via relayouts. This
bench compares, in one process on the real chip:

  1. c-major decode (current production path)
  2. parity-major decode: channel = parity*C + c, reductions over the
     lane-contiguous minor class dim
  3. four separate (N,H/2,W/2,C) parity planes decoded independently
  4. producer cost: one grouped conv (fgc=C, 4 outputs/group) vs four
     depthwise convs (one per parity)
  5. fused producer+decode for the winning pair

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/polyphase_layout_bench.py
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
    print(f"{name:46s} {t*1e3:8.3f} ms", flush=True)
    return t


def scalar(tree):
    tree = jax.lax.optimization_barrier(tree)
    return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(tree))


def interleave22(a):
    """(N, H/2, W/2, 2, 2) -> (N, H, W)."""
    n, h2, w2, _, _ = a.shape
    a = jnp.transpose(a, (0, 1, 3, 2, 4))
    return a.reshape(n, 2 * h2, 2 * w2)


def decode_cmajor(y4c):
    from emsanet_tpu.postprocessing import postprocess_semantic_polyphase

    return postprocess_semantic_polyphase(y4c)


def decode_pmajor(y4c):
    """channel = parity*C + c."""
    n, h2, w2, c4 = y4c.shape
    c = c4 // 4
    y = y4c.reshape(n, h2, w2, 2, 2, c)  # [..., p, q, class]
    idx = jnp.argmax(y, axis=-1).astype(jnp.int32)  # (N,H/2,W/2,2,2)
    mx = jnp.max(y, axis=-1)
    sumexp = jnp.sum(jnp.exp((y - mx[..., None]).astype(jnp.float32)), axis=-1)
    score = 1.0 / sumexp
    return {"segmentation_idx": interleave22(idx), "score": interleave22(score)}


def decode_planes(y00, y01, y10, y11):
    """four (N, H/2, W/2, C) parity planes."""
    idxs, scores = [], []
    for y in (y00, y01, y10, y11):
        idxs.append(jnp.argmax(y, axis=-1).astype(jnp.int32))
        mx = jnp.max(y, axis=-1)
        sumexp = jnp.sum(
            jnp.exp((y - mx[..., None]).astype(jnp.float32)), axis=-1
        )
        scores.append(1.0 / sumexp)
    n, h2, w2 = idxs[0].shape
    idx = jnp.stack(idxs, axis=-1).reshape(n, h2, w2, 2, 2)
    score = jnp.stack(scores, axis=-1).reshape(n, h2, w2, 2, 2)
    return {"segmentation_idx": interleave22(idx), "score": interleave22(score)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    args = ap.parse_args()
    n, h2, w2, c = args.batch, 240, 320, 40
    print(f"device={jax.devices()[0].device_kind} b{n} ({h2}x{w2} C{c})",
          flush=True)

    key = jax.random.PRNGKey(0)
    y4c = jax.jit(
        lambda k: jax.random.normal(k, (n, h2, w2, 4 * c), jnp.float32)
        .astype(BF)
    )(key)
    planes = [
        jax.jit(
            lambda k: jax.random.normal(k, (n, h2, w2, c), jnp.float32)
            .astype(BF)
        )(jax.random.PRNGKey(i))
        for i in range(4)
    ]
    x = jax.jit(
        lambda k: jax.random.normal(k, (n, h2, w2, c), jnp.float32).astype(BF)
    )(jax.random.PRNGKey(9))
    kern = jnp.asarray(np.random.RandomState(0).randn(3, 3, 1, c), jnp.float32)

    # numerics: pmajor decode == cmajor decode under the permutation
    perm = np.arange(4 * c).reshape(c, 4).T.reshape(-1)  # cmajor->pmajor
    a = jax.jit(decode_cmajor)(y4c)
    b = jax.jit(decode_pmajor)(y4c[..., perm])
    np.testing.assert_array_equal(np.asarray(a["segmentation_idx"]),
                                  np.asarray(b["segmentation_idx"]))
    np.testing.assert_allclose(np.asarray(a["score"], np.float32),
                               np.asarray(b["score"], np.float32), rtol=1e-6)
    print("numerics: pmajor == cmajor under permutation", flush=True)

    probe("decode c-major (current)", lambda y: scalar(decode_cmajor(y)),
          y4c, runs=args.runs)
    probe("decode parity-major", lambda y: scalar(decode_pmajor(y)),
          y4c, runs=args.runs)
    probe("decode 4 planes",
          lambda a0, a1, a2, a3: scalar(decode_planes(a0, a1, a2, a3)),
          *planes, runs=args.runs)

    # producer side
    from emsanet_tpu.ops.polyphase_upsample import (
        polyphase_kernels,
        upsample2x_depthwise_polyphase_deferred,
    )

    probe("grouped conv (fgc=C, 4C out)",
          lambda xx: scalar(
              upsample2x_depthwise_polyphase_deferred(xx, kern)
          ),
          x, runs=args.runs)

    kp = polyphase_kernels(kern)  # (3,3,1,4C), c-major
    kplanes = [kp[..., p::4] for p in range(4)]  # each (3,3,1,C)

    def four_convs(xx):
        return [
            jax.lax.conv_general_dilated(
                xx, k.astype(xx.dtype), (1, 1), "SAME",
                feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            for k in kplanes
        ]

    probe("4 depthwise convs (parity planes)",
          lambda xx: scalar(four_convs(xx)), x, runs=args.runs)

    # end-to-end: producer + decode fused in one jit
    probe("E2E grouped conv + c-major decode",
          lambda xx: scalar(decode_cmajor(
              upsample2x_depthwise_polyphase_deferred(xx, kern))),
          x, runs=args.runs)
    probe("E2E 4 convs + plane decode",
          lambda xx: scalar(decode_planes(*four_convs(xx))),
          x, runs=args.runs)


if __name__ == "__main__":
    main()
