"""In-process A/B: batched final-map interleave vs per-map relayouts.

Measures e2e (fwd + decode-planes postprocessing) with
postprocessing._BATCHED_INTERLEAVE toggled at trace time. One process.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/interleave_ab.py \
      [--batches 1 32]
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
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 32])
    ap.add_argument("--runs", type=int, default=60)
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    import emsanet_tpu.postprocessing as pp
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    for b in args.batches:
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "orientation", "scene"),
                enable_panoptic=True,
                input_height=480, input_width=640,
                compute_dtype="bfloat16",
                fused_inference=True,
                decoder_megakernel="auto",
                head_decode_fusion="decode-planes",
            ),
            data=DataConfig(dataset="synthetic"),
        ).validate()
        ds = get_dataset_config(cfg.data)
        model = EMSANet(cfg=cfg.model, dataset_config=ds)
        variables = init_model(model, jax.random.PRNGKey(0))
        is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
        rng = np.random.RandomState(0)
        rgb = jnp.asarray(rng.randn(b, 480, 640, 3), jnp.float32)
        depth = jnp.asarray(rng.randn(b, 480, 640, 1), jnp.float32)

        times = {}
        for batched in (False, True):
            pp._BATCHED_INTERLEAVE = batched

            @jax.jit
            def e2e(v, r, d):
                out = model.apply(v, {"rgb": r, "depth": d}, train=False)
                return scalar(pp.postprocess(out, is_thing, cfg.model))

            t = probe(e2e, variables, rgb, depth, runs=args.runs)
            times[batched] = t
            print(f"b{b} [decode-planes] batched={batched}: e2e "
                  f"{t*1e3:7.2f} ms ({b/t:.1f} fps)", flush=True)
        d0, d1 = times[False], times[True]
        print(f"b{b} delta: {100*(d0-d1)/d0:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
