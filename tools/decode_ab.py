"""One-process perf probes for the fused head-decode kernels.

Findings so far (this tool, v5e):
  - The 55f5d2b review fixes did NOT regress the kernel: e2e b32
    'decode' measured 73.48 (current) vs 73.33 ms (pre-rounding block)
    in one process; standalone kernel 7.24 vs 7.26 ms.
  - 'decode-both' (instance head kernel + interleaved postproc) ties
    'decode' at b32: 73.43 vs 73.48 ms.
  - Pallas-kernel-containing programs are BIMODAL across processes on
    this tunneled chip (standalone kernel 3.96 vs 7.24 ms, identical
    code; e2e 58.8-64.5 vs 72.7-73.5) while pure-XLA paths are stable
    (r3 anchor 78.0-78.75 over 4 processes). Only compare within one
    process, and treat kernel-path absolutes as regime-dependent.

This revision A/Bs the structural-zero tap skip (5 of 9 polyphase tap
weights per parity are exactly zero) and sweeps the row-tile size to
probe per-grid-step overhead.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/decode_ab.py
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


def build(batch, decode_fusion):
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
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--skip-standalone", action="store_true")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--b1", action="store_true",
                    help="also time b1 e2e for 'decode'/'decode-both'")
    args = ap.parse_args()
    b = args.batch
    print(f"device={jax.devices()[0].device_kind} b{b}", flush=True)

    from emsanet_tpu.ops import semantic_decode as sd
    from emsanet_tpu.postprocessing import postprocess

    # ---- standalone kernel: tap-skip A/B + tile sweep -------------------
    n, h2, w2, c = b, 240, 320, 40
    x = jax.jit(
        lambda k: jax.random.normal(
            k, (n, h2, w2, c), jnp.float32
        ).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(9))
    kern = jnp.asarray(
        np.random.RandomState(0).randn(3, 3, 1, c), jnp.float32
    )

    if not args.skip_standalone:
        for full_taps in (True, False):
            sd._AB_FULL_TAPS = full_taps
            sd.semantic_decode_fused_planes.clear_cache()
            t = probe(
                jax.jit(
                    lambda xx: scalar(sd.semantic_decode_fused(xx, kern))
                ),
                x, runs=args.runs,
            )
            label = "all-9-taps" if full_taps else "tap-skip"
            print(f"standalone kernel {label:12s} {t*1e3:8.2f} ms",
                  flush=True)
        sd._AB_FULL_TAPS = False

        for tile in (8, 16, 40):
            sd.semantic_decode_fused_planes.clear_cache()
            try:
                t = probe(
                    jax.jit(
                        lambda xx: scalar(
                            sd.semantic_decode_fused(xx, kern, tile_h=tile)
                        )
                    ),
                    x, runs=args.runs,
                )
                print(f"standalone kernel tile_h={tile:<3d}  {t*1e3:8.2f} ms",
                      flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(f"standalone kernel tile_h={tile:<3d}  FAILED "
                      f"({type(e).__name__})", flush=True)

    # ---- e2e -------------------------------------------------------------
    def e2e_fn(batch_n, decode_fusion):
        cfg, model, variables, is_thing, rgb, depth = build(
            batch_n, decode_fusion
        )
        p, s = variables["params"], variables.get("batch_stats")

        @jax.jit
        def run(p, s, r, d):
            out = model.apply(
                {"params": p, "batch_stats": s},
                {"rgb": r, "depth": d}, train=False,
            )
            return scalar(postprocess(out, is_thing, cfg.model))

        return run, (p, s, rgb, depth)

    if not args.skip_e2e:
        for label, mode in (
            ("e2e 'decode-both' (tap-skip)", "decode-both"),
            ("e2e 'decode' (tap-skip)", "decode"),
        ):
            run, xs = e2e_fn(b, mode)
            t = probe(run, *xs, runs=args.runs)
            print(f"{label:38s} {t*1e3:8.2f} ms ({b/t:.1f} fps)", flush=True)

    if args.b1:
        for mode in ("decode", "decode-both", "decode-planes"):
            run, xs = e2e_fn(1, mode)
            t = probe(run, *xs, runs=args.runs)
            print(f"b1 e2e '{mode}'{'':20s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
