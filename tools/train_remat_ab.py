"""In-process A/B: train step with/without rematerialization (b8 fused).

Round-3 left the b8 fused train step at ~87-89 ms with ~66 GB/step of
HBM traffic — ~90% of the 819 GB/s roofline. If the step is truly
traffic-bound, jax.checkpoint on the encoder stages + decoder modules
(ModelConfig.remat) should trade recompute FLOPs (MXU idles anyway) for
stored-activation traffic. One process, chained-state timing.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/train_remat_ab.py
"""

from __future__ import annotations

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from train_ab import build  # tools/ sibling: same flagship builder
from train_breakdown import synth_batch


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

    state, loss = chain(state, 1)
    float(loss)
    try:
        ca = step.lower(state, dbatch, rng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gb = ca.get("bytes accessed", 0) / 1e9
        tf = ca.get("flops", 0) / 1e12
    except Exception:
        gb = tf = float("nan")

    n_short = max(runs // 5, 2)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        state, loss = chain(state, n_short)
        float(loss)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, loss = chain(state, runs)
        float(loss)
        tl = time.perf_counter() - t0
        times.append((tl - ts) / (runs - n_short))
    per = min(times)
    b = batch["rgb"].shape[0]
    print(f"{label:40s} {per*1e3:8.2f} ms/step  {b/per:6.1f} img/s  "
          f"[{gb:.1f} GB, {tf:.2f} TFLOP]", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=25)
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} b{n} 480x640 bf16",
          flush=True)
    batch = None
    for remat in (False, True):
        cfg, model, variables = build(
            n, 480, 640, fused_training=True, remat=remat)
        if batch is None:
            batch = synth_batch(cfg, n)
        time_train(f"fused train step remat={remat}", cfg, model,
                   variables, batch, args.runs)


if __name__ == "__main__":
    main()
