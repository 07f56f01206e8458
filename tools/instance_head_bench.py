"""A/B the instance head's final x2 stage + postproc consumption.

The semantic head's d2s relayout was worth 14.4 -> 7.3 ms (ops/
semantic_decode.py). The instance head has the same structure at C=5
(center 1 + offset 2 + orientation 2): grouped polyphase conv
(N,240,320,20) -> depth-to-space -> (N,480,640,5) -> channel slices ->
sigmoid/tanh -> NMS / grouping / segment passes. This bench isolates:

  1. the final-stage production cost (conv + d2s + encode) on real-ish
     inputs,
  2. the instance postprocessing on its outputs,
  3. a plane-layout alternative: the same conv but consumers read
     parity planes interleaved per-channel into rank-3 (N,H,W) maps
     (what an instance-head Pallas kernel would emit).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/instance_head_bench.py
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
    print(f"{name:56s} {t*1e3:8.3f} ms", flush=True)
    return t


def scalar(tree):
    tree = jax.lax.optimization_barrier(tree)
    return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--skip-xla", action="store_true",
                    help="only run the Pallas kernel probes")
    args = ap.parse_args()
    n, h2, w2, c = args.batch, 240, 320, 5
    print(f"device={jax.devices()[0].device_kind} b{n} ({h2}x{w2} C{c})",
          flush=True)

    from emsanet_tpu.config import ModelConfig
    from emsanet_tpu.ops.polyphase_upsample import (
        depth_to_space,
        upsample2x_depthwise_polyphase_deferred,
    )
    from emsanet_tpu.ops.segment_ops import small_table_lookup
    from emsanet_tpu.postprocessing import postprocess_instance

    cfg = ModelConfig()
    x = jax.jit(
        lambda k: jax.random.normal(k, (n, h2, w2, c), jnp.float32).astype(BF)
    )(jax.random.PRNGKey(9))
    kern = jnp.asarray(np.random.RandomState(0).randn(3, 3, 1, c), jnp.float32)
    fg = jax.jit(
        lambda k: jax.random.uniform(k, (n, 2 * h2, 2 * w2)) > 0.5
    )(jax.random.PRNGKey(3))

    def encode(pred):
        center = jax.nn.sigmoid(pred[..., 0:1])
        offset = jnp.tanh(pred[..., 1:3])
        return jnp.concatenate([center, offset, pred[..., 3:5]], axis=-1)

    def stage(xx):
        y = upsample2x_depthwise_polyphase_deferred(xx, kern)
        return encode(depth_to_space(y))

    # production consumption: full instance postproc on the staged maps
    def inst_of(xx, m):
        pred = stage(xx)
        return scalar(postprocess_instance(
            pred[..., 0:1], pred[..., 1:3], m,
            threshold=cfg.instance_center_heatmap_threshold,
            nms_kernel_size=cfg.instance_center_heatmap_nms_kernel_size,
            top_k=cfg.instance_center_heatmap_top_k,
            normalized_offset=cfg.instance_normalized_offset,
        ))

    if not args.skip_xla:
        probe("final stage (conv+d2s+encode)",
              lambda xx: scalar(stage(xx)), x, runs=args.runs)
        probe("stage + instance postproc (production)", inst_of, x, fg,
              runs=args.runs)

    # Pallas kernel variants (ops/instance_head.py)
    from emsanet_tpu.ops.instance_head import (
        instance_head_upsample,
        interleave_channel,
    )

    probe("PALLAS head kernel (parity planes)",
          lambda xx: scalar(instance_head_upsample(xx, kern)),
          x, runs=args.runs)

    def kernel_maps(xx):
        planes = instance_head_upsample(xx, kern)
        return [interleave_channel(planes, ch) for ch in range(c)]

    probe("PALLAS kernel + interleaved maps",
          lambda xx: scalar(kernel_maps(xx)), x, runs=args.runs)

    def inst_kernel(xx, m):
        maps = kernel_maps(xx)
        offset = jnp.stack(maps[1:3], axis=-1)
        inst = postprocess_instance(
            maps[0][..., None], offset, m,
            threshold=cfg.instance_center_heatmap_threshold,
            nms_kernel_size=cfg.instance_center_heatmap_nms_kernel_size,
            top_k=cfg.instance_center_heatmap_top_k,
            normalized_offset=cfg.instance_normalized_offset,
        )
        return scalar((inst, maps[3], maps[4]))

    probe("PALLAS kernel + instance postproc", inst_kernel, x, fg,
          runs=args.runs)


if __name__ == "__main__":
    main()
