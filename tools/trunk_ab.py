"""In-process A/B: whole-trunk decoder megakernel vs the XLA decoder path.

One process, one TPU job (CLAUDE.md rules: only same-process numbers are
comparable). Measures, per batch size:
  - e2e (fwd + postprocessing) with decoder_megakernel on vs off
  - fwd-only on vs off
The decode mode is the measured-best for the batch (bench.py policy).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/trunk_ab.py \
      [--batches 1 2 4 8] [--runs 60]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def scalar(outputs):
    outputs = jax.lax.optimization_barrier(outputs)
    return sum(
        leaf.astype(jnp.float32).sum() for leaf in jax.tree.leaves(outputs)
    )


def probe(fn, *args, runs=60):
    from emsanet_tpu.utils.timing import queue_difference_timing

    float(fn(*args))  # compile + warm
    t, _ = queue_difference_timing(
        lambda: fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def build(batch, megakernel, decode_fusion):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            fused_inference=True,
            decoder_megakernel=megakernel,
            head_decode_fusion=decode_fusion,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(batch, 480, 640, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(batch, 480, 640, 1), jnp.float32)
    return cfg, model, variables, is_thing, rgb, depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--force-mode", default=None,
                    help="override head_decode_fusion")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="decoder megakernel modes, e.g. off on auto")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    from emsanet_tpu.config import best_head_decode_fusion
    from emsanet_tpu.postprocessing import postprocess

    variants = ["off", "on"]
    if args.variants:
        variants = list(args.variants)
    for b in args.batches:
        mode = args.force_mode or best_head_decode_fusion(b, True)
        results = {}
        for mk in variants:
            cfg, model, var, is_thing, rgb, depth = build(b, mk, mode)
            p, s = var["params"], var.get("batch_stats")

            @jax.jit
            def fwd(p, s, r, d):
                return scalar(model.apply(
                    {"params": p, "batch_stats": s},
                    {"rgb": r, "depth": d}, train=False))

            @jax.jit
            def e2e(p, s, r, d):
                out = model.apply(
                    {"params": p, "batch_stats": s},
                    {"rgb": r, "depth": d}, train=False)
                return scalar(postprocess(out, is_thing, cfg.model))

            tf = probe(fwd, p, s, rgb, depth, runs=args.runs)
            te = probe(e2e, p, s, rgb, depth, runs=args.runs)
            results[mk] = (tf, te)
            print(f"b{b} [{mode}] dec={mk}: "
                  f"fwd {tf*1e3:7.2f} ms   e2e {te*1e3:7.2f} ms "
                  f"({b/te:.1f} fps)", flush=True)
        base = variants[0]
        tf0, te0 = results[base]
        for v in variants[1:]:
            tf1, te1 = results[v]
            print(f"b{b} delta {v} vs {base}: "
                  f"fwd {100*(tf0-tf1)/tf0:+.1f}%  "
                  f"e2e {100*(te0-te1)/te0:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
