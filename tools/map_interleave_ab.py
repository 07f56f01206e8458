"""In-process A/B: 'decode'-mode instance-head final-map interleave.

Three ways to produce the 5 full-res instance maps (VERDICT r4 #2 —
the b32 e2e attack):
  per-channel — C separate XLA relayouts (round-3 baseline)
  batched     — ONE all-channel transpose of the stacked planes
  kernel      — the head kernel emits interleaved maps directly
                (ops/instance_head.instance_head_upsample_interleaved)

Also times the head kernel standalone in both output layouts (the
in-kernel interleave's own cost) before the whole-graph numbers
(CLAUDE.md rule: integration decisions need the whole-graph A/B).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/map_interleave_ab.py \
      [--batches 32 1] [--runs 60]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def standalone(batch, runs):
    """Head kernel alone: planes layout vs interleaved layout."""
    from emsanet_tpu.ops.instance_head import (
        encodings_for,
        instance_head_upsample,
        instance_head_upsample_interleaved,
        interleave_channel,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 240, 320, 5), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 1, 5), jnp.float32)
    enc = encodings_for(5, True, True)

    @jax.jit
    def planes_then_xla(x, k):
        p = instance_head_upsample(x, k, enc)
        return scalar([interleave_channel(p, ch) for ch in range(5)])

    @jax.jit
    def planes_only(x, k):
        return scalar(instance_head_upsample(x, k, enc))

    @jax.jit
    def fused(x, k):
        return scalar(instance_head_upsample_interleaved(x, k, enc))

    tp = probe(planes_only, x, k, runs=runs)
    tx = probe(planes_then_xla, x, k, runs=runs)
    tk = probe(fused, x, k, runs=runs)
    print(f"b{batch} standalone: planes {tp*1e3:6.2f}  "
          f"planes+5xXLA {tx*1e3:6.2f}  kernel-interleaved {tk*1e3:6.2f} ms",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 1])
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--skip-standalone", action="store_true")
    ap.add_argument("--xla-only", action="store_true",
                    help="skip the in-kernel-interleave arms (they fail "
                    "Mosaic lowering on real TPU as of round 5)")
    ap.add_argument("--sections", default="decode,planes",
                    help="comma list of A/B sections to run: 'decode' "
                    "(the 4 interleave combos in decode mode) and/or "
                    "'planes' (the decode-planes Pallas weave) — remote "
                    "compiles are 1-10 min each, so trim per deployment "
                    "(b1 deploys decode-planes, b32 deploys decode)")
    args = ap.parse_args()
    sections = set(args.sections.split(","))
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    from emsanet_tpu import postprocessing
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    if not args.skip_standalone:
        for b in args.batches:
            standalone(b, args.runs)

    for b in args.batches if "decode" in sections else []:
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
        rgb = jnp.asarray(rng.randn(b, 480, 640, 3), jnp.float32)
        depth = jnp.asarray(rng.randn(b, 480, 640, 1), jnp.float32)
        p, s = variables["params"], variables.get("batch_stats")

        results = {}
        combos = [
            ("per-channel", "xla"),   # round-3 baseline
            ("batched", "xla"),
            ("kernel", "xla"),
            ("kernel", "kernel"),
        ]
        if args.xla_only:
            combos = combos[:2]
        for inst_knob, sem_knob in combos:
            postprocessing._INSTANCE_MAP_INTERLEAVE = inst_knob
            postprocessing._SEMANTIC_MAP_INTERLEAVE = sem_knob

            @jax.jit
            def e2e(p, s, r, d):
                out = model.apply(
                    {"params": p, "batch_stats": s},
                    {"rgb": r, "depth": d}, train=False)
                return scalar(
                    postprocessing.postprocess(out, is_thing, cfg.model))

            te = probe(e2e, p, s, rgb, depth, runs=args.runs)
            results[(inst_knob, sem_knob)] = te
            print(f"b{b} [decode] inst={inst_knob:12s} sem={sem_knob:6s}: "
                  f"e2e {te*1e3:7.2f} ms ({b/te:.1f} fps)", flush=True)
        t0 = results[combos[0]]
        for combo in combos[1:]:
            print(f"b{b} delta {combo} vs baseline: "
                  f"{100*(t0-results[combo])/t0:+.1f}%", flush=True)
    postprocessing._INSTANCE_MAP_INTERLEAVE = "per-channel"
    postprocessing._SEMANTIC_MAP_INTERLEAVE = "xla"

    # --- decode-planes final-map weave: XLA per-map vs Pallas batched ---
    for b in args.batches if "planes" in sections else []:
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "orientation", "scene"),
                enable_panoptic=True,
                input_height=480, input_width=640,
                compute_dtype="bfloat16",
                fused_inference=True,
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
        p, s = variables["params"], variables.get("batch_stats")

        times = {}
        for pallas_weave in (False, True):
            postprocessing._PLANE_INTERLEAVE_PALLAS = pallas_weave

            @jax.jit
            def e2e(p, s, r, d):
                out = model.apply(
                    {"params": p, "batch_stats": s},
                    {"rgb": r, "depth": d}, train=False)
                return scalar(
                    postprocessing.postprocess(out, is_thing, cfg.model))

            te = probe(e2e, p, s, rgb, depth, runs=args.runs)
            times[pallas_weave] = te
            print(f"b{b} [decode-planes] pallas_weave={pallas_weave}: "
                  f"e2e {te*1e3:7.2f} ms ({b/te:.1f} fps)", flush=True)
        print(f"b{b} delta pallas-weave vs xla: "
              f"{100*(times[False]-times[True])/times[False]:+.1f}%",
              flush=True)
    postprocessing._PLANE_INTERLEAVE_PALLAS = False


if __name__ == "__main__":
    main()
