"""On-device A/B of the polyphase upsampling + full fused forward.

One process, one TPU job (CLAUDE.md rules). Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/upsample_bench.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.models.decoder import PredictionUpsampling
from emsanet_tpu.models.upsampling import Upsampling
from emsanet_tpu.utils.timing import queue_difference_timing

BF = jnp.bfloat16


def time_fn(name, fn, *args, runs=40):
    jfn = jax.jit(
        lambda *a: jax.tree.map(lambda t: t.astype(jnp.float32).sum(), fn(*a))
    )
    probe = jax.jit(lambda *a: sum(jax.tree.leaves(jfn(*a))))
    float(probe(*args))  # compile
    t, _ = queue_difference_timing(
        lambda: probe(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    print(f"{name:52s} {t*1e3:8.3f} ms", flush=True)
    return t


def bench_upsample(batch):
    rng = np.random.RandomState(0)
    cases = [
        ("pred x4 C40 @120x160", PredictionUpsampling, (batch, 120, 160, 40)),
        ("pred x4 C5 @120x160", PredictionUpsampling, (batch, 120, 160, 5)),
        ("module x2 C512 @30x40", Upsampling, (batch, 30, 40, 512)),
        ("module x2 C256 @60x80", Upsampling, (batch, 60, 80, 256)),
        ("module x2 C128 @120x160", Upsampling, (batch, 120, 160, 128)),
    ]
    for name, cls, shape in cases:
        x = jnp.asarray(rng.randn(*shape), BF)
        v = cls(dtype=BF).init(jax.random.PRNGKey(0), x)
        # randomize kernels away from the symmetric bilinear-mimic init
        v = jax.tree.map(
            lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype), v
        )
        base = time_fn(
            f"{name} naive", lambda x, v=v, cls=cls: cls(dtype=BF).apply(v, x), x
        )
        fused = time_fn(
            f"{name} polyphase",
            lambda x, v=v, cls=cls: cls(dtype=BF, fused=True).apply(v, x),
            x,
        )
        # exactness on-device
        a = cls(dtype=BF).apply(v, x)
        b = cls(dtype=BF, fused=True).apply(v, x)
        err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        print(f"  -> speedup {base/fused:5.2f}x   max|err| {err:.2e}", flush=True)


def bench_forward(batch, fused):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480,
            input_width=640,
            rgb_encoder_backbone="resnet34",
            depth_encoder_backbone="resnet34",
            compute_dtype="bfloat16",
            fused_inference=fused,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(batch, 480, 640, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(batch, 480, 640, 1), jnp.float32)

    def fwd(params, batch_stats, rgb, depth):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            {"rgb": rgb, "depth": depth},
            train=False,
        )
        return out

    t = time_fn(
        f"flagship forward b{batch} fused={fused}",
        fwd,
        variables["params"],
        variables.get("batch_stats"),
        rgb,
        depth,
        runs=40,
    )
    print(f"  -> {batch / t:.1f} fps", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--skip-forward", action="store_true")
    ap.add_argument("--skip-upsample", action="store_true")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind} batch={args.batch}", flush=True)
    if not args.skip_upsample:
        bench_upsample(args.batch)
    if not args.skip_forward:
        t0 = bench_forward(args.batch, fused=False)
        t1 = bench_forward(args.batch, fused=True)
        print(f"forward speedup: {t0/t1:.3f}x", flush=True)


if __name__ == "__main__":
    main()
