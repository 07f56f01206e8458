"""Round-3 perf probes: b1 latency breakdown + deferred-interleave A/B.

Batches every round-3 measurement into ONE process / ONE TPU job
(CLAUDE.md: concurrent jobs give flaky timings; only compare numbers
from the same process).

Probes:
  1. e2e (fwd + postprocess) A/B at b32: deferred-interleave semantic
     decode (new) vs interleave-then-decode (old), same weights/program
     structure otherwise.
  2. b1: fwd-only, e2e, and isolated postprocessing — locates the
     batch-independent overheads behind the 7.95 ms b1 e2e.
  3. batch sweep of e2e latency (1/2/4/8/32) for the latency curve.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/r3_perf_probe.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=60):
    """Honest device time via queue-difference (CLAUDE.md timing rules)."""
    from emsanet_tpu.utils.timing import queue_difference_timing

    float(fn(*args))  # compile + warm
    t, _ = queue_difference_timing(
        lambda: fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def scalar(outputs):
    outputs = jax.lax.optimization_barrier(outputs)
    return sum(
        leaf.astype(jnp.float32).sum() for leaf in jax.tree.leaves(outputs)
    )


def build(batch, fused=True, decode_fusion="decode"):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            fused_inference=fused,
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
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-ab", action="store_true",
                    help="skip probe 1 (deferred-interleave A/B)")
    ap.add_argument("--breakdown-batches", type=int, nargs="*",
                    default=[1],
                    help="batch sizes for the fwd/e2e/postproc/boundary "
                    "breakdown (probe 2)")
    ap.add_argument("--decode-fusion", default="decode",
                    help="head_decode_fusion for probes 2/3")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    from emsanet_tpu.ops.polyphase_upsample import depth_to_space
    from emsanet_tpu.postprocessing import (
        postprocess,
        postprocess_semantic,
        postprocess_semantic_polyphase,
    )

    # ---- probe 1: deferred-interleave A/B at b32 ------------------------
    if not args.skip_ab:
        _probe1(args)

    # ---- probe 2: per-batch breakdown -----------------------------------
    for b in args.breakdown_batches:
        cfg1, model1, var1, is_thing1, rgb1, depth1 = build(
            b, decode_fusion=args.decode_fusion)
        p1, s1 = var1["params"], var1.get("batch_stats")

        @jax.jit
        def b_fwd(p, s, r, d):
            return scalar(model1.apply(
                {"params": p, "batch_stats": s},
                {"rgb": r, "depth": d}, train=False))

        @jax.jit
        def b_e2e(p, s, r, d):
            out = model1.apply(
                {"params": p, "batch_stats": s},
                {"rgb": r, "depth": d}, train=False)
            return scalar(postprocess(out, is_thing1, cfg1.model))

        # isolated postproc: raw outputs precomputed on device
        raw = jax.jit(
            lambda p, s, r, d: model1.apply(
                {"params": p, "batch_stats": s},
                {"rgb": r, "depth": d}, train=False)
        )(p1, s1, rgb1, depth1)
        raw = jax.tree.map(lambda x: x.block_until_ready(), raw)

        @jax.jit
        def b_post(raw):
            return scalar(postprocess(raw, is_thing1, cfg1.model))

        tf = probe(b_fwd, p1, s1, rgb1, depth1, runs=args.runs)
        te = probe(b_e2e, p1, s1, rgb1, depth1, runs=args.runs)
        tp = probe(b_post, raw, runs=args.runs)
        print(f"b{b} fwd-only:        {tf*1e3:8.2f} ms", flush=True)
        print(f"b{b} e2e:             {te*1e3:8.2f} ms", flush=True)
        print(f"b{b} postproc alone:  {tp*1e3:8.2f} ms "
              f"(boundary = {(te-tf-tp)*1e3:.2f} ms)", flush=True)

    # ---- probe 3: batch sweep -------------------------------------------
    if not args.skip_sweep:
        for b in (2, 4, 8):
            cfgb, modelb, varb, thingb, rgbb, depthb = build(
                b, decode_fusion=args.decode_fusion)
            pb, sb = varb["params"], varb.get("batch_stats")

            @jax.jit
            def bb_e2e(p, s, r, d):
                out = modelb.apply(
                    {"params": p, "batch_stats": s},
                    {"rgb": r, "depth": d}, train=False)
                return scalar(postprocess(out, thingb, cfgb.model))

            tb = probe(bb_e2e, pb, sb, rgbb, depthb, runs=args.runs)
            print(f"b{b} e2e:             {tb*1e3:8.2f} ms "
                  f"({b/tb:.1f} fps, {tb/b*1e3:.2f} ms/frame)", flush=True)


def _probe1(args):
    from emsanet_tpu.ops.polyphase_upsample import depth_to_space
    from emsanet_tpu.postprocessing import postprocess

    # four e2e generations in one process:
    #   r2: interleave -> full-res decode
    #   r3: deferred-interleave polyphase decode
    #   r4: semantic Pallas upsample+decode megakernel ('decode')
    #   r5: both heads deferred + parity-plane postproc ('decode-planes')
    cfg, model, variables, is_thing, rgb, depth = build(
        32, decode_fusion="interleave"
    )
    cfg_k, model_k, var_k, _, _, _ = build(32, decode_fusion="decode")
    cfg_p, model_p, var_p, _, _, _ = build(
        32, decode_fusion="decode-planes"
    )
    params, stats = variables["params"], variables.get("batch_stats")
    params_k, stats_k = var_k["params"], var_k.get("batch_stats")
    params_p, stats_p = var_p["params"], var_p.get("batch_stats")

    def fwd(m, params, stats, rgb, depth):
        return m.apply(
            {"params": params, "batch_stats": stats},
            {"rgb": rgb, "depth": depth}, train=False,
        )

    @jax.jit
    def e2e_kernel(params, stats, rgb, depth):
        out = fwd(model_k, params, stats, rgb, depth)
        return scalar(postprocess(out, is_thing, cfg_k.model))

    @jax.jit
    def e2e_planes(params, stats, rgb, depth):
        out = fwd(model_p, params, stats, rgb, depth)
        return scalar(postprocess(out, is_thing, cfg_p.model))

    @jax.jit
    def e2e_new(params, stats, rgb, depth):
        out = fwd(model, params, stats, rgb, depth)
        return scalar(postprocess(out, is_thing, cfg.model))

    @jax.jit
    def e2e_old(params, stats, rgb, depth):
        out = fwd(model, params, stats, rgb, depth)
        if "logits_polyphase" in out["semantic"]:
            # reconstruct the round-2 path: interleave, then decode
            out = dict(out)
            sem = dict(out["semantic"])
            sem["logits"] = depth_to_space(sem.pop("logits_polyphase"))
            out["semantic"] = sem
        return scalar(postprocess(out, is_thing, cfg.model))

    @jax.jit
    def fwd_only(params, stats, rgb, depth):
        return scalar(fwd(model, params, stats, rgb, depth))

    t_old = probe(e2e_old, params, stats, rgb, depth, runs=args.runs)
    t_new = probe(e2e_new, params, stats, rgb, depth, runs=args.runs)
    t_ker = probe(e2e_kernel, params_k, stats_k, rgb, depth, runs=args.runs)
    t_pln = probe(e2e_planes, params_p, stats_p, rgb, depth,
                  runs=args.runs)
    t_fwd = probe(fwd_only, params, stats, rgb, depth, runs=args.runs)
    print(f"b32 e2e r2 (interleave->decode):   {t_old*1e3:8.2f} ms "
          f"({32/t_old:.1f} fps)", flush=True)
    print(f"b32 e2e r3 (deferred decode):      {t_new*1e3:8.2f} ms "
          f"({32/t_new:.1f} fps)", flush=True)
    print(f"b32 e2e r4 (semantic kernel):      {t_ker*1e3:8.2f} ms "
          f"({32/t_ker:.1f} fps)", flush=True)
    print(f"b32 e2e r5 (parity-plane postproc):{t_pln*1e3:8.2f} ms "
          f"({32/t_pln:.1f} fps)", flush=True)
    print(f"b32 fwd-only (fused, interleave):  {t_fwd*1e3:8.2f} ms "
          f"({32/t_fwd:.1f} fps)", flush=True)

    # compiled-HLO traffic of the new e2e program
    try:
        comp = e2e_new.lower(params, stats, rgb, depth).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"b32 e2e NEW cost: {ca.get('bytes accessed', 0)/1e9:.1f} GB "
              f"accessed, {ca.get('flops', 0)/1e12:.2f} TFLOP", flush=True)
    except Exception as e:  # cost analysis is best-effort on this backend
        print(f"cost_analysis unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
