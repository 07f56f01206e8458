"""In-process whole-model A/B: fused stem megakernel vs XLA stem paths.

Toggles models/encoder.STEM_MEGAKERNEL (off-leg keeps the production
space-to-depth auto-gate) and times the full e2e deployed path
(forward + on-device postprocessing) at b32 and b1.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/stem_mk_ab.py
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 1])
    ap.add_argument("--runs", type=int, default=60)
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    import emsanet_tpu.models.encoder as enc
    from emsanet_tpu.config import (DataConfig, EMSANetConfig, ModelConfig,
                                    best_head_decode_fusion)
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.postprocessing import postprocess

    rng = np.random.RandomState(0)
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
        for mk in (False, True):
            enc.STEM_MEGAKERNEL = mk

            @jax.jit
            def e2e(v, r, d):
                out = model.apply(v, {"rgb": r, "depth": d}, train=False)
                return scalar(postprocess(out, is_thing, cfg.model))

            @jax.jit
            def fwd(v, r, d):
                return scalar(
                    model.apply(v, {"rgb": r, "depth": d}, train=False)
                )

            tf = probe(fwd, variables, rgb, depth, runs=args.runs)
            te = probe(e2e, variables, rgb, depth, runs=args.runs)
            times[mk] = te
            print(f"b{b} [{mode}] stem-mk={mk}: fwd {tf*1e3:7.2f}  "
                  f"e2e {te*1e3:7.2f} ms ({b/te:.1f} fps)", flush=True)
        d0, d1 = times[False], times[True]
        print(f"b{b} delta: {100*(d0-d1)/d0:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
