"""b32 e2e scoping: roofline position + merge-copy sizing (VERDICT r3 #8).

One process, 'decode' mode (the measured-best b32 deployment):
  1. e2e / fwd / postproc-alone / boundary times + compiled GB/TFLOP,
  2. the C=64 pixel-pair-merge reshapes around the stage-1 chain kernels
     ((N,H,W,64) <-> (N,H,W/2,128)) timed standalone — the round-3
     roadmap sized them at ~0.6 GB/batch.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/b32_scope.py
"""

from __future__ import annotations

import argparse

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


def scalar(outputs):
    outputs = jax.lax.optimization_barrier(outputs)
    return sum(
        leaf.astype(jnp.float32).sum() for leaf in jax.tree.leaves(outputs)
    )


def cost(jfn, *args):
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return (ca.get("bytes accessed", 0) / 1e9,
                ca.get("flops", 0) / 1e12)
    except Exception as e:
        print(f"  (cost_analysis unavailable: {e})", flush=True)
        return (float("nan"), float("nan"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} b{n}", flush=True)

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.postprocessing import postprocess

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            fused_inference=True,
            head_decode_fusion="decode",
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(n, 480, 640, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(n, 480, 640, 1), jnp.float32)

    @jax.jit
    def fwd(v, r, d):
        return scalar(model.apply(v, {"rgb": r, "depth": d}, train=False))

    @jax.jit
    def e2e(v, r, d):
        out = model.apply(v, {"rgb": r, "depth": d}, train=False)
        return scalar(postprocess(out, is_thing, cfg.model))

    raw = jax.jit(
        lambda v, r, d: model.apply(v, {"rgb": r, "depth": d}, train=False)
    )(variables, rgb, depth)
    raw = jax.tree.map(lambda x: x.block_until_ready(), raw)

    @jax.jit
    def post_alone(raw):
        return scalar(postprocess(raw, is_thing, cfg.model))

    tf = probe(fwd, variables, rgb, depth, runs=args.runs)
    gbf, tff = cost(fwd, variables, rgb, depth)
    te = probe(e2e, variables, rgb, depth, runs=args.runs)
    gbe, tfe = cost(e2e, variables, rgb, depth)
    tp = probe(post_alone, raw, runs=args.runs)
    bw = 819.0  # v5e HBM GB/s
    print(f"fwd  {tf*1e3:7.2f} ms  [{gbf:.1f} GB -> roofline "
          f"{gbf/bw*1e3:.1f} ms, {tff:.2f} TFLOP]", flush=True)
    print(f"e2e  {te*1e3:7.2f} ms  [{gbe:.1f} GB -> roofline "
          f"{gbe/bw*1e3:.1f} ms, {tfe:.2f} TFLOP]  ({n/te:.1f} fps)",
          flush=True)
    print(f"post {tp*1e3:7.2f} ms   boundary {(te-tf-tp)*1e3:7.2f} ms",
          flush=True)

    # --- pair-merge reshape sizing ----------------------------------------
    x64 = jnp.asarray(rng.randn(n, 120, 160, 64), jnp.bfloat16)

    @jax.jit
    def merge_roundtrip(x):
        m = x.reshape(n, 120, 80, 128)
        m = jax.lax.optimization_barrier(m)
        back = m.reshape(n, 120, 160, 64)
        return scalar(back)

    t = probe(merge_roundtrip, x64, runs=args.runs)
    print(f"pair-merge reshape roundtrip (1 site): {t*1e3:7.3f} ms "
          f"(x2 sites per fwd)", flush=True)


if __name__ == "__main__":
    main()
