"""In-process A/B: baseline train step vs fused NBt1D train kernels.

CLAUDE.md timing rules: cross-process numbers vary up to ~3x on the
tunneled chip, so the baseline and the fused variant are timed in ONE
process with chained-state loops (the param update can't be DCE'd
because step k+1 consumes step k's state).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/train_ab.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch, height, width, **model_kw):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=height, input_width=width,
            compute_dtype="bfloat16",
            **model_kw,
        ),
        data=DataConfig(dataset="synthetic", batch_size=batch),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0), train=True)
    return cfg, model, variables


def time_train(label, cfg, model, variables, batch, runs):
    from emsanet_tpu.training.optim import get_optimizer
    from emsanet_tpu.training.step import create_train_state, make_train_step

    state = create_train_state(model, variables, get_optimizer(cfg.train))
    step = jax.jit(make_train_step(model, cfg))
    dbatch = jax.device_put(batch)
    rng = jax.random.PRNGKey(1)

    def chain(state, n):
        loss = None
        for i in range(n):
            state, metrics = step(state, dbatch, jax.random.fold_in(rng, i))
            loss = metrics["total_loss"]
        return state, loss

    state, loss = chain(state, 1)  # compile
    print(f"{label}: warm loss={float(loss):.4f}", flush=True)
    try:
        ca = step.lower(state, dbatch, rng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gb = ca.get("bytes accessed", 0) / 1e9
        tf = ca.get("flops", 0) / 1e12
    except Exception:
        gb = tf = float("nan")

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        state, loss = chain(state, n)
        float(loss)
        return time.perf_counter() - t0

    n_short = max(runs // 5, 2)
    pairs = [(timed(n_short), timed(runs)) for _ in range(3)]
    per = min((tl - ts) / (runs - n_short) for ts, tl in pairs)
    b = batch["rgb"].shape[0]
    print(f"{label:40s} {per*1e3:8.2f} ms/step  {b/per:6.1f} img/s  "
          f"[{gb:.1f} GB, {tf:.2f} TFLOP]", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=25)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--min-pixels", type=int, nargs="*", default=None,
                    help="A/B the fused variant at these pairs_supported "
                    "MIN_PIXELS gates in one process (default: module "
                    "default only)")
    ap.add_argument("--ab-stacked", action="store_true",
                    help="A/B the tap-concatenated backward matmuls vs "
                    "the per-tap form (nbt1d_train.STACKED_BWD)")
    ap.add_argument("--ab-train-head", action="store_true",
                    help="A/B the fused upsample+CE train-head kernel "
                    "(ops/semantic_train_head.py) off vs on")
    ap.add_argument("--ab-padded", action="store_true",
                    help="for each gate, A/B the XLA-row-pad kernels vs "
                    "the clamped-DMA kernels in one process")
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} b{n} 480x640 bf16",
          flush=True)

    import tools.train_breakdown as tb
    from emsanet_tpu.ops import nbt1d_train

    cfg, model, variables = build(n, 480, 640)
    batch = tb.synth_batch(cfg, n)
    t_base = None
    if not args.skip_baseline:
        t_base = time_train("train step (baseline)", cfg, model, variables,
                            batch, args.runs)

    gates = args.min_pixels or [nbt1d_train.MIN_PIXELS]
    paddings = (True, False) if args.ab_padded else (None,)
    stackings = (False, True) if args.ab_stacked else (None,)
    for gate in gates:
        nbt1d_train.MIN_PIXELS = gate
        for pad in paddings:
          for stk in stackings:
            if pad is not None:
                nbt1d_train.FORCE_PADDED = pad
            if stk is not None:
                nbt1d_train.STACKED_BWD = stk
            label = f"train step (fused pairs, gate={gate}"
            if pad is not None:
                label += f", padded={pad}"
            if stk is not None:
                label += f", stacked={stk}"
            heads = (False, True) if args.ab_train_head else (True,)
            for head in heads:
                cfg_f, model_f, variables_f = build(
                    n, 480, 640, fused_training=True,
                    fused_train_head=head,
                )
                t_fused = time_train(
                    label + f", head={head})", cfg_f, model_f,
                    variables_f, batch, args.runs,
                )
                if t_base is not None:
                    print(f"speedup vs baseline: {t_base/t_fused:.3f}x  "
                          f"({t_base*1e3:.1f} -> {t_fused*1e3:.1f} ms)",
                          flush=True)


if __name__ == "__main__":
    main()
