"""Round 3 of the deferred-decode layout A/B: NCHW-domain decode.

The c-major NHWC decode relayouts 786 MB (10.8 ms); parity-major NHWC
is 3.5 ms but the producer can't emit it cheaply. This round tests
keeping the grouped conv but emitting NCHW — the class axis becomes a
MAJOR dim, so argmax/max/sumexp are plain elementwise trees over
(H/2, W/2) lane-major planes and XLA never relayouts the big tensor.

Variants (producer + decode in ONE jit):
  H1. grouped conv -> NCHW out; strided major-axis slices per parity;
      reductions over the class axis; tiny interleave at the end.
  H2. same but conv emits NHWC and a single transpose to NCHW feeds the
      decode (isolates the conv-native-layout question).
  REF grouped conv NHWC + c-major decode (current production).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/polyphase_layout_bench3.py
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


def conv_nchw(x, kp):
    """(N,H,W,C) NHWC input -> (N,4C,H,W) grouped-conv output."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kp.astype(x.dtype), (1, 1), "SAME",
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NCHW"),
    )


def decode_nchw(y):
    """y: (N, 4C, H/2, W/2), channel = c*4 + (p*2+q).

    Returns interleaved (N, H, W) idx/score, bitwise-equal to
    postprocess_semantic_polyphase on the NHWC layout.
    """
    n, c4, h2, w2 = y.shape
    c = c4 // 4
    yr = y.reshape(n, c, 2, 2, h2, w2)  # [n, class, p, q, i, j]
    idx = jnp.argmax(yr, axis=1).astype(jnp.int32)  # (n,2,2,h2,w2)
    mx = jnp.max(yr, axis=1)
    sumexp = jnp.sum(
        jnp.exp((yr - mx[:, None]).astype(jnp.float32)), axis=1
    )
    score = 1.0 / sumexp

    def interleave(a):  # (n,2,2,h2,w2) -> (n, 2*h2, 2*w2)
        a = jnp.transpose(a, (0, 3, 1, 4, 2))
        return a.reshape(n, 2 * h2, 2 * w2)

    return {"segmentation_idx": interleave(idx), "score": interleave(score)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    args = ap.parse_args()
    n, h2, w2, c = args.batch, 240, 320, 40
    print(f"device={jax.devices()[0].device_kind} b{n} ({h2}x{w2} C{c})",
          flush=True)

    from emsanet_tpu.ops.polyphase_upsample import (
        polyphase_kernels,
        upsample2x_depthwise_polyphase_deferred,
    )
    from emsanet_tpu.postprocessing import postprocess_semantic_polyphase

    x = jax.jit(
        lambda k: jax.random.normal(k, (n, h2, w2, c), jnp.float32).astype(BF)
    )(jax.random.PRNGKey(9))
    kern = jnp.asarray(np.random.RandomState(0).randn(3, 3, 1, c), jnp.float32)
    kp = polyphase_kernels(kern)

    # numerics on a small f32 slice (bf16 conv reorders flip near-tie
    # argmaxes on random data; f32 isolates real layout bugs)
    xs = x[:1].astype(jnp.float32)
    da = jax.jit(lambda xx: postprocess_semantic_polyphase(
        upsample2x_depthwise_polyphase_deferred(xx, kern)))(xs)
    db = jax.jit(lambda xx: decode_nchw(conv_nchw(xx, kp)))(xs)
    # TPU "f32" convs still multiply in bf16 at default precision, so the
    # two lowering orders flip near-tie argmaxes at ~0.4% on random data.
    # A layout/permutation bug would mismatch ~97%; gate on 2%.
    mism = np.mean(np.asarray(da["segmentation_idx"])
                   != np.asarray(db["segmentation_idx"]))
    assert mism < 0.02, f"idx mismatch fraction {mism} — layout bug"
    sa = np.asarray(da["score"], np.float32)
    sb = np.asarray(db["score"], np.float32)
    med = np.median(np.abs(sa - sb))
    print(f"numerics: NCHW decode ~= production decode "
          f"(idx mismatch {mism:.2e} [bf16 ties], median |dscore| {med:.2e})",
          flush=True)

    probe("REF grouped conv NHWC + c-major decode",
          lambda xx: scalar(postprocess_semantic_polyphase(
              upsample2x_depthwise_polyphase_deferred(xx, kern))),
          x, runs=args.runs)

    probe("H1 grouped conv NCHW + major-axis decode",
          lambda xx: scalar(decode_nchw(conv_nchw(xx, kp))),
          x, runs=args.runs)

    def h2_fn(xx):
        y = upsample2x_depthwise_polyphase_deferred(xx, kern)
        y = jnp.transpose(y, (0, 3, 1, 2))
        return scalar(decode_nchw(y))

    probe("H2 grouped conv NHWC + transpose + decode", h2_fn, x,
          runs=args.runs)

    # conv alone for attribution
    probe("conv NCHW alone", lambda xx: scalar(conv_nchw(xx, kp)), x,
          runs=args.runs)


if __name__ == "__main__":
    main()
