"""In-process whole-model A/B: fused stem megakernel vs XLA stem paths.

Toggles models/encoder.STEM_MEGAKERNEL (off-leg keeps the production
space-to-depth auto-gate) and times the full e2e deployed path
(forward + on-device postprocessing) at b32 and b1.

`--standalone` instead times the dual stem pair in isolation (fused
kernel vs strided-7x7 flax vs space-to-depth XLA rewrite) with an
on-device correctness check — the former tools/stem_kernel_bench.py.

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


def standalone(batches, runs=40):
    """Dual-stem pair in isolation: kernel vs strided flax vs s2d XLA."""
    from emsanet_tpu.models.backbone import ResNetStem
    from emsanet_tpu.ops.stem import fused_stems

    BF = jnp.bfloat16
    rng = np.random.RandomState(0)

    def stem_probe(fn, *args, runs=runs):
        out = jax.jit(fn)
        probe_fn = jax.jit(
            lambda *a: sum(
                x.astype(jnp.float32).sum()
                for x in jax.tree.leaves(jax.lax.optimization_barrier(out(*a)))
            )
        )
        return probe(probe_fn, *args, runs=runs)

    def stem_vars(c, seed):
        stem = ResNetStem(dtype=BF)
        v = stem.init(jax.random.PRNGKey(seed), jnp.zeros((1, 480, 640, c), BF))
        p = {
            "scale": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
            "bias": jnp.asarray(rng.randn(64), jnp.float32),
        }
        s = {
            "mean": jnp.asarray(rng.randn(64) * 0.1, jnp.float32),
            "var": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
        }
        return {
            "params": {"Conv_0": v["params"]["Conv_0"],
                       "Norm_0": {"BatchNorm_0": p}},
            "batch_stats": {"Norm_0": {"BatchNorm_0": s}},
        }

    v_rgb, v_d = stem_vars(3, 0), stem_vars(1, 1)

    def flax_pair(s2d):
        def fn(vr, vd, xr, xd):
            a = ResNetStem(dtype=BF, space_to_depth=s2d).apply(vr, xr)
            b = ResNetStem(dtype=BF, space_to_depth=s2d).apply(vd, xd)
            return a, b
        return fn

    def kernel_pair(vr, vd, xr, xd):
        def bn(v):
            p = v["params"]["Norm_0"]["BatchNorm_0"]
            s = v["batch_stats"]["Norm_0"]["BatchNorm_0"]
            return (p["scale"], p["bias"], s["mean"], s["var"])
        return fused_stems(
            (xr, xd),
            (vr["params"]["Conv_0"]["kernel"],
             vd["params"]["Conv_0"]["kernel"]),
            (bn(vr), bn(vd)),
        )

    for n in batches:
        xr = jnp.asarray(rng.randn(n, 480, 640, 3), BF)
        xd = jnp.asarray(rng.randn(n, 480, 640, 1), BF)
        ref = jax.jit(flax_pair(False))(v_rgb, v_d, xr, xd)
        got = jax.jit(kernel_pair)(v_rgb, v_d, xr, xd)
        for name, r, g in [("rgb", ref[0], got[0]), ("d", ref[1], got[1])]:
            err = float(jnp.max(jnp.abs(
                r.astype(jnp.float32) - g.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(r.astype(jnp.float32))))
            print(f"  b{n} {name}: maxabs {err:.3e} (scale {scale:.2f})")
        t_str = stem_probe(flax_pair(False), v_rgb, v_d, xr, xd)
        t_s2d = stem_probe(flax_pair(True), v_rgb, v_d, xr, xd)
        t_ker = stem_probe(kernel_pair, v_rgb, v_d, xr, xd)
        print(
            f"b{n}: strided {t_str*1e3:7.3f}  s2d {t_s2d*1e3:7.3f}  "
            f"kernel {t_ker*1e3:7.3f} ms", flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 1])
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--standalone", action="store_true",
                    help="time the dual stem pair in isolation instead "
                    "of the whole model")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    if args.standalone:
        standalone(args.batches, runs=min(args.runs, 40))
        return

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
