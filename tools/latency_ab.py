"""In-process A/B: b1 latency with vs without latency-mode chain fusion.

The b1 forward is launch-overhead-bound (CLAUDE.md round-3 analysis:
~3 ms of inter-kernel overhead across hundreds of launches; no single
segment dominates). `chain_supported_latency` collapses the C=256
NBt1D tails (encoder stage2, decoder module1) from ~6K kernels each
into one Pallas call when the total spatial size is small. This tool
times, in ONE process on the real TPU (CLAUDE.md: cross-process numbers
vary up to ~3x):

  1. per-site chain-vs-XLA at b1 for the newly fused C=256 sites
  2. full-model b1 e2e (fwd + postprocessing) old-gate vs new-gate
  3. optionally the same at --batch N to confirm the b32 gate stays off

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/latency_ab.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=60):
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


def site_ab(runs):
    import flax.linen as nn

    from emsanet_tpu.models.layers import NonBottleneck1D
    from emsanet_tpu.ops.nbt1d_chain import nbt1d_chain, stack_chain_params

    sites = [
        (5, 30, 40, 256, False),   # encoder stage2 tail
        (3, 30, 40, 256, False),   # decoder module1 blocks
        (3, 15, 20, 512, True),    # decoder module0 blocks (streamed)
        (2, 15, 20, 512, True),    # encoder stage3 tail (streamed)
    ]
    for k, h, w, c, stream in sites:
        class Chain(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                for i in range(k):
                    x = NonBottleneck1D(
                        features=c, dtype=jnp.bfloat16, name=f"b{i}"
                    )(x, train=train)
                return x

        m = Chain()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, c),
                              jnp.bfloat16)
        variables = m.init(jax.random.PRNGKey(1), x)
        stacked = stack_chain_params(
            [variables["params"][f"b{i}"] for i in range(k)],
            [variables["batch_stats"][f"b{i}"] for i in range(k)],
        )
        stacked = jax.tree.map(jnp.asarray, stacked)

        @jax.jit
        def xla(v, x):
            return scalar(m.apply(v, x, train=False))

        @jax.jit
        def fused(x, stacked):
            return scalar(nbt1d_chain(x, stacked, stream_weights=stream))

        t_x = probe(xla, variables, x, runs=runs)
        t_f = probe(fused, x, stacked, runs=runs)
        tag = " (streamed)" if stream else ""
        print(f"site C={c} {h}x{w} K={k} b1: XLA {t_x*1e3:7.3f} ms "
              f"vs chain {t_f*1e3:7.3f} ms{tag}", flush=True)


def model_ab(batch, runs):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.ops import nbt1d_chain as nch
    from emsanet_tpu.postprocessing import postprocess

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            fused_inference=True,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables.get("batch_stats")
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(batch, 480, 640, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(batch, 480, 640, 1), jnp.float32)

    results = {}
    for label, gate in (("old (no latency fusion)", 0),
                        ("new (latency fusion)", 4800)):
        nch.LATENCY_MAX_PIXELS = gate

        @jax.jit
        def e2e(params, stats, rgb, depth):
            out = model.apply(
                {"params": params, "batch_stats": stats},
                {"rgb": rgb, "depth": depth}, train=False,
            )
            return scalar(postprocess(out, is_thing, cfg.model))

        @jax.jit
        def fwd(params, stats, rgb, depth):
            return scalar(model.apply(
                {"params": params, "batch_stats": stats},
                {"rgb": rgb, "depth": depth}, train=False,
            ))

        tf = probe(fwd, params, stats, rgb, depth, runs=runs)
        te = probe(e2e, params, stats, rgb, depth, runs=runs)
        results[label] = (tf, te)
        print(f"b{batch} {label}: fwd {tf*1e3:7.3f} ms | "
              f"e2e {te*1e3:7.3f} ms", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--skip-sites", action="store_true")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    if not args.skip_sites:
        site_ab(args.runs)
    model_ab(args.batch, args.runs)


if __name__ == "__main__":
    main()
