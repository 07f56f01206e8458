"""Standalone TPU bench: ops/stem.fused_stems vs the flax stem paths.

One process, one TPU job. Times the dual-modality (rgb+depth) stem pair
at 480x640 bf16 for a batch sweep, against (a) the strided 7x7 flax
path and (b) the space-to-depth XLA rewrite.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/stem_kernel_bench.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.models.backbone import ResNetStem
from emsanet_tpu.ops.stem import fused_stems
from emsanet_tpu.utils.timing import queue_difference_timing

BF = jnp.bfloat16


def probe(fn, *args, runs=40):
    out = jax.jit(fn)
    probe_fn = jax.jit(
        lambda *a: sum(
            x.astype(jnp.float32).sum()
            for x in jax.tree.leaves(jax.lax.optimization_barrier(out(*a)))
        )
    )
    float(probe_fn(*args))
    t, _ = queue_difference_timing(
        lambda: probe_fn(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}")
    rng = np.random.RandomState(0)

    def stem_vars(c, seed):
        x0 = jnp.zeros((1, 480, 640, c), BF)
        stem = ResNetStem(dtype=BF)
        v = stem.init(jax.random.PRNGKey(seed), x0)
        # randomized BN stats
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

    v_rgb = stem_vars(3, 0)
    v_d = stem_vars(1, 1)

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
            (vr["params"]["Conv_0"]["kernel"], vd["params"]["Conv_0"]["kernel"]),
            (bn(vr), bn(vd)),
        )

    for n in args.batches:
        xr = jnp.asarray(rng.randn(n, 480, 640, 3), BF)
        xd = jnp.asarray(rng.randn(n, 480, 640, 1), BF)
        # correctness on-device (vs strided flax path, bf16 tolerance)
        ref = jax.jit(flax_pair(False))(v_rgb, v_d, xr, xd)
        got = jax.jit(kernel_pair)(v_rgb, v_d, xr, xd)
        for name, r, g in [("rgb", ref[0], got[0]), ("d", ref[1], got[1])]:
            err = float(jnp.max(jnp.abs(
                r.astype(jnp.float32) - g.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(r.astype(jnp.float32))))
            print(f"  b{n} {name}: maxabs {err:.3e} (scale {scale:.2f})")
        t_str = probe(flax_pair(False), v_rgb, v_d, xr, xd)
        t_s2d = probe(flax_pair(True), v_rgb, v_d, xr, xd)
        t_ker = probe(kernel_pair, v_rgb, v_d, xr, xd)
        print(
            f"b{n}: strided {t_str*1e3:7.3f}  s2d {t_s2d*1e3:7.3f}  "
            f"kernel {t_ker*1e3:7.3f} ms", flush=True,
        )


if __name__ == "__main__":
    main()
