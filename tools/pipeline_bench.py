"""In-process A/B: fused forward vs fused forward+postprocess, and
semantic argmax layout experiments (is C=40-minor HBM-padded?).

One process, one TPU job. Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/pipeline_bench.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.postprocessing import postprocess, postprocess_semantic
from emsanet_tpu.utils.timing import queue_difference_timing

BF = jnp.bfloat16


def time_fn(name, fn, *args, runs=40, barrier=False):
    """barrier=True forces all outputs to materialize (honest timing);
    False keeps the raw-sum probe (elision-prone; kept for A/B)."""
    def consume(*a):
        out = fn(*a)
        if barrier:
            out = jax.lax.optimization_barrier(out)
        return out

    jfn = jax.jit(
        lambda *a: jax.tree.map(
            lambda t: t.astype(jnp.float32).sum(), consume(*a)
        )
    )
    probe = jax.jit(lambda *a: sum(jax.tree.leaves(jfn(*a))))
    float(probe(*args))
    t, _ = queue_difference_timing(
        lambda: probe(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    print(f"{name:52s} {t*1e3:8.3f} ms", flush=True)
    return t


def _device_normal(key, shape, dtype=BF):
    """Generate test data ON the device: a host randn at these shapes is
    GBs of float64 on one CPU core + a tunnel transfer."""
    return jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(dtype),
        static_argnums=(),
    )(jax.random.PRNGKey(key)).block_until_ready()


def argmax_experiments(n):
    x = _device_normal(0, (n, 480, 640, 40))
    x_nchw = _device_normal(1, (n, 40, 480, 640))

    time_fn("elementwise x+1 NHWC C40 (pad probe)", lambda a: a + 1, x)
    time_fn("elementwise x+1 NCHW (pad probe)", lambda a: a + 1, x_nchw)
    time_fn("semantic softmax path (current)", postprocess_semantic, x)

    def direct(a):
        a32 = a.astype(jnp.float32)
        idx = jnp.argmax(a32, -1).astype(jnp.int32)
        mx = jnp.max(a32, -1)
        lse = jax.scipy.special.logsumexp(a32, -1)
        return {"idx": idx, "score": jnp.exp(mx - lse)}

    time_fn("argmax+exp(max-lse) NHWC", direct, x)

    def direct_nchw(a):
        a32 = a.astype(jnp.float32)
        idx = jnp.argmax(a32, 1).astype(jnp.int32)
        mx = jnp.max(a32, 1)
        lse = jax.scipy.special.logsumexp(a32, 1)
        return {"idx": idx, "score": jnp.exp(mx - lse)}

    time_fn("argmax+exp(max-lse) NCHW (pre-layout)", direct_nchw, x_nchw)
    time_fn("transpose NHWC->NCHW + argmax",
            lambda a: direct_nchw(jnp.transpose(a, (0, 3, 1, 2))), x)


def model_ab(n):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True, input_height=480, input_width=640,
            rgb_encoder_backbone="resnet34", depth_encoder_backbone="resnet34",
            compute_dtype="bfloat16", fused_inference=True,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    rgb = _device_normal(2, (n, 480, 640, 3), jnp.float32)
    depth = _device_normal(3, (n, 480, 640, 1), jnp.float32)
    p, bs = variables["params"], variables.get("batch_stats")

    def fwd(p, bs, r, d):
        return model.apply({"params": p, "batch_stats": bs},
                           {"rgb": r, "depth": d}, train=False)

    def fwd_post(p, bs, r, d):
        return postprocess(fwd(p, bs, r, d), is_thing, cfg.model)

    def fwd_mat(p, bs, r, d):
        # optimization_barrier forces the head outputs to materialize in
        # HBM (the tree-sum probe otherwise lets XLA fuse the reduction
        # into the model epilogue and skip writing ~0.9 GB of outputs)
        return jax.lax.optimization_barrier(fwd(p, bs, r, d))

    def fwd_post_split(p, bs, r, d):
        # barrier BETWEEN model and postprocess: forces the clean
        # phase split so postprocess can't degrade model-side layouts
        return postprocess(
            jax.lax.optimization_barrier(fwd(p, bs, r, d)),
            is_thing, cfg.model,
        )

    t0 = time_fn(f"fused forward b{n} (summed outputs)", fwd, p, bs, rgb,
                 depth)
    ts = time_fn(f"fwd b{n} | barrier | postprocess (split phases)",
                 fwd_post_split, p, bs, rgb, depth, barrier=True)
    tm = time_fn(f"fused forward b{n} (materialized outputs)", fwd_mat, p,
                 bs, rgb, depth)
    t1 = time_fn(f"fused forward b{n} + postprocess (barriered)", fwd_post,
                 p, bs, rgb, depth, barrier=True)
    print(f"  -> {n/t0:.1f} fps summed | {n/tm:.1f} fps materialized | "
          f"{n/t1:.1f} fps e2e | materialize {1e3*(tm-t0):.1f} ms | "
          f"postproc {1e3*(t1-tm):.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--skip-argmax", action="store_true")
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind} batch={args.batch}",
          flush=True)
    if not args.skip_argmax:
        argmax_experiments(args.batch)
    if not args.skip_model:
        model_ab(args.batch)


if __name__ == "__main__":
    main()
