"""In-process A/B: space-to-depth stem vs strided 7x7 (b1 + b32 e2e).

XLA:TPU lowers the strided 7x7 conv over the 3/1-channel inputs
pathologically (6.1 ms of the 52 ms b32 forward vs ~0.6 ms roofline —
tools/fwd_breakdown.py). The stem's exact space-to-depth form
(models/backbone.py::ResNetStem) packs 2x2 pixels into channels and runs
a stride-1 4x4 conv on the SAME parameters (zero-pad + reshape).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/stem_ab.py
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

    float(fn(*args))
    t, _ = queue_difference_timing(
        lambda: fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def train_ab(args):
    """Train-mode leg: packed stems in the TRAINING graph (b8 fused).

    Measured (one process, v5e): 72.48 -> 71.47 ms/step — the depth stem
    wins under autodiff too (the rgb stem stays strided at train batch
    sizes via the production c/n gate).
    """
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import emsanet_tpu.models.backbone as bb
    from train_ab import build
    from train_breakdown import synth_batch
    from train_remat_ab import time_train

    n = args.train_batch
    print(f"device={jax.devices()[0].device_kind} b{n} 480x640 bf16",
          flush=True)
    batch = None
    for s2d_train in (False, True):
        bb.STEM_SPACE_TO_DEPTH_TRAIN = s2d_train
        cfg, model, variables = build(n, 480, 640, fused_training=True)
        if batch is None:
            batch = synth_batch(cfg, n)
        time_train(f"fused train step stem-s2d={s2d_train}", cfg, model,
                   variables, batch, max(args.runs // 2, 10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 1])
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--train", action="store_true",
                    help="run the train-step stem A/B instead")
    ap.add_argument("--train-batch", type=int, default=8)
    args = ap.parse_args()
    if args.train:
        return train_ab(args)
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    import emsanet_tpu.models.backbone as bb
    from emsanet_tpu.config import (DataConfig, EMSANetConfig, ModelConfig,
                                    best_head_decode_fusion)
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.models.backbone import ResNetStem
    from emsanet_tpu.postprocessing import postprocess

    # --- standalone stem at b32 (space_to_depth FORCED per variant so the
    # measurement bypasses the production c/n auto-gate) -------------------
    rng = np.random.RandomState(0)
    for c in (3, 1):
        x = jnp.asarray(rng.randn(32, 480, 640, c), jnp.bfloat16)
        for s2d in (False, True):
            stem = ResNetStem(space_to_depth=s2d, dtype=jnp.bfloat16)
            v = stem.init(jax.random.PRNGKey(0), x)

            @jax.jit
            def f(v, x):
                return scalar(stem.apply(v, x))

            t = probe(f, v, x, runs=args.runs)
            print(f"stem c{c} b32 s2d={s2d}: {t*1e3:7.3f} ms", flush=True)

    # --- whole-model e2e ----------------------------------------------------
    for b in args.batches:
        mode = best_head_decode_fusion(b, True)
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "orientation", "scene"),
                enable_panoptic=True,
                input_height=480, input_width=640,
                compute_dtype="bfloat16",
                fused_inference=True,
                decoder_megakernel="auto",
                head_decode_fusion=mode,
            ),
            data=DataConfig(dataset="synthetic"),
        ).validate()
        ds = get_dataset_config(cfg.data)
        model = EMSANet(cfg=cfg.model, dataset_config=ds)
        variables = init_model(model, jax.random.PRNGKey(0))
        is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
        rgb = jnp.asarray(rng.randn(b, 480, 640, 3), jnp.float32)
        depth = jnp.asarray(rng.randn(b, 480, 640, 1), jnp.float32)

        times = {}
        for s2d in (False, True):
            bb.STEM_SPACE_TO_DEPTH = s2d

            @jax.jit
            def e2e(v, r, d):
                out = model.apply(v, {"rgb": r, "depth": d}, train=False)
                return scalar(postprocess(out, is_thing, cfg.model))

            t = probe(e2e, variables, rgb, depth, runs=args.runs)
            times[s2d] = t
            print(f"b{b} [{mode}] s2d={s2d}: e2e {t*1e3:7.2f} ms "
                  f"({b/t:.1f} fps)", flush=True)
        d0, d1 = times[False], times[True]
        print(f"b{b} delta: {100*(d0-d1)/d0:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
