"""Train-step cost breakdown on the real TPU (round-3 #2 scoping).

Measures, in ONE process:
  1. full train step time + compiled-HLO bytes/flops (b8 bf16 480x640),
  2. fwd-only in train mode (batch-stats + dropout) vs eval mode,
  3. train step with the learned-3x3 upsamplings in polyphase form
     (exact same math, no nearest-x2 intermediates) — candidate lever,
  4. train step without multiscale side outputs (sizing their cost).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/train_breakdown.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=30):
    from emsanet_tpu.utils.timing import queue_difference_timing

    float(fn(*args))
    t, _ = queue_difference_timing(
        lambda: fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def cost(jfn, *args):
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return (ca.get("bytes accessed", 0) / 1e9,
                ca.get("flops", 0) / 1e12)
    except Exception:
        return (float("nan"), float("nan"))


def build(batch, height, width, train_polyphase=False):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=height, input_width=width,
            compute_dtype="bfloat16",
            train_polyphase_upsampling=train_polyphase,
        ),
        data=DataConfig(dataset="synthetic", batch_size=batch),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0), train=True)
    return cfg, model, variables


def synth_batch(cfg, n):
    h, w = cfg.model.input_height, cfg.model.input_width
    rng = np.random.RandomState(0)
    sides = {}
    for s in cfg.model.side_output_downscales:
        sides[f"_down_{s}"] = {
            "semantic": rng.randint(0, 41, (n, h // s, w // s)).astype(np.int32),
            "instance_center": rng.rand(n, h // s, w // s, 1).astype(np.float32),
            "instance_center_mask": np.ones((n, h // s, w // s), bool),
            "instance_offset": rng.randn(n, h // s, w // s, 2).astype(np.float32),
            "instance_foreground": np.ones((n, h // s, w // s), bool),
            "orientation": rng.randn(n, h // s, w // s, 2).astype(np.float32),
            "orientation_foreground": np.ones((n, h // s, w // s), bool),
        }
    return {
        "rgb": rng.randn(n, h, w, 3).astype(np.float32),
        "depth": rng.randn(n, h, w, 1).astype(np.float32),
        "semantic": rng.randint(0, 41, (n, h, w)).astype(np.int32),
        "instance_center": rng.rand(n, h, w, 1).astype(np.float32),
        "instance_center_mask": np.ones((n, h, w), bool),
        "instance_offset": rng.randn(n, h, w, 2).astype(np.float32),
        "instance_foreground": np.ones((n, h, w), bool),
        "orientation": rng.randn(n, h, w, 2).astype(np.float32),
        "orientation_foreground": np.ones((n, h, w), bool),
        "scene": rng.randint(1, 10, (n,)).astype(np.int32),
        **sides,
    }


def time_train(label, cfg, model, variables, batch, runs):
    from emsanet_tpu.training.optim import get_optimizer
    from emsanet_tpu.training.step import create_train_state, make_train_step

    state = create_train_state(model, variables, get_optimizer(cfg.train))
    step = jax.jit(make_train_step(model, cfg))
    dbatch = jax.device_put(batch)
    rng = jax.random.PRNGKey(1)

    def run(state):
        state, metrics = step(state, dbatch, rng)
        return state, metrics["total_loss"]

    state, loss = run(state)  # compile
    float(loss)
    gb, tf = cost(step, state, dbatch, rng)

    def chain(n):
        nonlocal state
        import time as _t
        t0 = _t.perf_counter()
        loss = None
        for _ in range(n):
            state, loss = run(state)
        float(loss)
        return _t.perf_counter() - t0

    n_short = max(runs // 5, 2)
    pairs = [(chain(n_short), chain(runs)) for _ in range(2)]
    per = min((tl - ts) / (runs - n_short) for ts, tl in pairs)
    b = batch["rgb"].shape[0]
    print(f"{label:44s} {per*1e3:8.2f} ms/step  {b/per:6.1f} img/s  "
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

    # baseline train step
    cfg, model, variables, = build(n, 480, 640)
    batch = synth_batch(cfg, n)
    time_train("train step (baseline)", cfg, model, variables, batch,
               args.runs)

    # fwd-only split: train-mode fwd vs eval-mode fwd
    params, stats = variables["params"], variables.get("batch_stats")

    @jax.jit
    def fwd_train(params, stats, rgb, depth):
        out, _ = model.apply(
            {"params": params, "batch_stats": stats},
            {"rgb": rgb, "depth": depth}, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
        )
        out = jax.lax.optimization_barrier(out)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    @jax.jit
    def fwd_eval(params, stats, rgb, depth):
        out = model.apply(
            {"params": params, "batch_stats": stats},
            {"rgb": rgb, "depth": depth}, train=False,
        )
        out = jax.lax.optimization_barrier(out)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(out))

    rgb = jnp.asarray(batch["rgb"])
    depth = jnp.asarray(batch["depth"])
    tt = probe(fwd_train, params, stats, rgb, depth, runs=args.runs)
    te = probe(fwd_eval, params, stats, rgb, depth, runs=args.runs)
    gb_t, tf_t = cost(fwd_train, params, stats, rgb, depth)
    print(f"fwd train-mode (stats+dropout+sides):        {tt*1e3:8.2f} ms "
          f"[{gb_t:.1f} GB, {tf_t:.2f} TFLOP]", flush=True)
    print(f"fwd eval-mode (unfused):                     {te*1e3:8.2f} ms",
          flush=True)

    # polyphase upsampling in training
    cfg_p, model_p, variables_p = build(n, 480, 640, train_polyphase=True)
    time_train("train step (polyphase upsampling)", cfg_p, model_p,
               variables_p, batch, args.runs)

    # no multiscale supervision (sizes the side-output cost)
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg_ns = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            semantic_no_multiscale_supervision=True,
            instance_no_multiscale_supervision=True,
        ),
        data=DataConfig(dataset="synthetic", batch_size=n),
    ).validate()
    ds = get_dataset_config(cfg_ns.data)
    model_ns = EMSANet(cfg=cfg_ns.model, dataset_config=ds)
    variables_ns = init_model(model_ns, jax.random.PRNGKey(0), train=True)
    batch_ns = {k: v for k, v in batch.items() if not k.startswith("_down_")}
    time_train("train step (no multiscale supervision)", cfg_ns, model_ns,
               variables_ns, batch_ns, args.runs)


if __name__ == "__main__":
    main()
