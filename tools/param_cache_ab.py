"""In-process A/B: fused_params cache (hoisted chain weight prep).

Round-3's latency_ab found that fusing all b1 chain sites LOST (fwd
5.51 -> 6.36 ms) and implicated the in-graph weight prep (stacking /
C=64 merge / casts re-run every forward call). build_fused_params now
hoists all of it into a one-time cache collection. This tool measures,
in ONE process on the real chip:

  1. e2e (fwd + postprocessing) with in-graph prep vs the cache, at
     --batches (default 1 and 32)
  2. at b1, the cache combined with latency-mode chain fusion
     (LATENCY_MAX_PIXELS) — re-testing the round-3 negative result now
     that the implicated overhead is gone

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/param_cache_ab.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=60):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 32])
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--latency-gates", type=int, nargs="+",
                    default=[4800], help="b1-only LATENCY_MAX_PIXELS "
                    "values to try on top of the cache")
    args = ap.parse_args()

    from emsanet_tpu.config import (DataConfig, EMSANetConfig, ModelConfig,
                                    best_head_decode_fusion)
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, build_fused_params, init_model
    from emsanet_tpu.ops import nbt1d_chain as nch
    from emsanet_tpu.postprocessing import postprocess

    print(f"device={jax.devices()[0].device_kind}", flush=True)

    for batch in args.batches:
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "orientation", "scene"),
                enable_panoptic=True,
                input_height=480, input_width=640,
                compute_dtype="bfloat16",
                fused_inference=True,
                head_decode_fusion=best_head_decode_fusion(batch, True),
            ),
            data=DataConfig(dataset="synthetic"),
        ).validate()
        ds = get_dataset_config(cfg.data)
        model = EMSANet(cfg=cfg.model, dataset_config=ds)
        variables = init_model(model, jax.random.PRNGKey(0))
        prepared = build_fused_params(model, variables)
        params, stats = variables["params"], variables["batch_stats"]
        fusedp = prepared["fused_params"]
        is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
        rng = np.random.RandomState(0)
        rgb = jnp.asarray(rng.randn(batch, 480, 640, 3), jnp.float32)
        depth = jnp.asarray(rng.randn(batch, 480, 640, 1), jnp.float32)

        gates = [0] if batch > 1 else [0] + list(args.latency_gates)
        for use_cache in (False, True):
            for gate in gates:
                if gate and not use_cache:
                    continue  # round-3 already measured this: a loss
                nch.LATENCY_MAX_PIXELS = gate

                @jax.jit
                def e2e(params, stats, fusedp, rgb, depth):
                    v = {"params": params, "batch_stats": stats}
                    if use_cache:
                        v["fused_params"] = fusedp
                    out = model.apply(
                        v, {"rgb": rgb, "depth": depth}, train=False
                    )
                    return scalar(postprocess(out, is_thing, cfg.model))

                t = probe(e2e, params, stats, fusedp, rgb, depth,
                          runs=args.runs)
                print(
                    f"b{batch} e2e cache={int(use_cache)} "
                    f"latency_gate={gate}: {t*1e3:7.3f} ms "
                    f"({batch/t:7.1f} fps)", flush=True,
                )
        nch.LATENCY_MAX_PIXELS = 0


if __name__ == "__main__":
    main()
