"""Per-stage timing of the on-device postprocessing at b32 640x480.

One process, one TPU job. Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/postproc_breakdown.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.postprocessing import (
    aggregate_instance_orientations,
    find_instance_centers,
    group_pixels_to_instances,
    panoptic_merge,
    postprocess,
    postprocess_semantic,
)
from emsanet_tpu.utils.timing import queue_difference_timing

BF = jnp.bfloat16


def time_fn(name, fn, *args, runs=40):
    jfn = jax.jit(
        lambda *a: jax.tree.map(
            lambda t: t.astype(jnp.float32).sum(),
            jax.lax.optimization_barrier(fn(*a)),
        )
    )
    probe = jax.jit(lambda *a: sum(jax.tree.leaves(jfn(*a))))
    float(probe(*args))
    t, _ = queue_difference_timing(
        lambda: probe(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    print(f"{name:52s} {t*1e3:8.3f} ms", flush=True)
    return t



def _dev(key, shape, dtype=jnp.float32, kind="normal", maxval=None):
    """On-device test data (host randn at these shapes is GBs of f64)."""
    k = jax.random.PRNGKey(key)
    if kind == "normal":
        f = lambda kk: jax.random.normal(kk, shape, jnp.float32).astype(dtype)
    elif kind == "uniform":
        f = lambda kk: jax.random.uniform(kk, shape, jnp.float32).astype(dtype)
    elif kind == "randint":
        f = lambda kk: jax.random.randint(kk, shape, 0, maxval, jnp.int32)
    elif kind == "bool":
        f = lambda kk: jax.random.uniform(kk, shape) > 0.3
    return jax.jit(f)(k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    n, h, w = args.batch, 480, 640
    rng = np.random.RandomState(0)
    print(f"device={jax.devices()[0].device_kind} batch={n}", flush=True)

    logits = _dev(0, (n, h, w, 40), BF)
    time_fn("semantic softmax+argmax+score (40ch)", postprocess_semantic,
            logits)

    heat = _dev(1, (n, h, w), kind="uniform")
    fg = _dev(2, (n, h, w), kind="bool")
    time_fn("find_instance_centers (nms17+topk64)",
            lambda hm, m: find_instance_centers(hm, foreground_mask=m),
            heat, fg)

    # NMS only, square vs separable
    def nms_sq(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 17, 17), (1, 1, 1), "SAME")

    def nms_sep(x):
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 17, 1), (1, 1, 1), "SAME")
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 17), (1, 1, 1), "SAME")

    time_fn("nms 17x17 square reduce_window", nms_sq, heat)
    time_fn("nms 17x17 separable (17x1 + 1x17)", nms_sep, heat)

    centers_yx = _dev(3, (n, 64, 2), kind="randint", maxval=479)
    centers_valid = _dev(4, (n, 64), kind="bool")
    offset = _dev(5, (n, h, w, 2), BF)
    time_fn("group_pixels_to_instances (Pallas)",
            group_pixels_to_instances, centers_yx, centers_valid, offset, fg)

    sem_full = 1 + _dev(6, (n, h, w), kind="randint", maxval=40)
    inst = _dev(7, (n, h, w), kind="randint", maxval=65)
    sem_score = _dev(8, (n, h, w), kind="uniform")
    cscores = _dev(9, (n, 64), kind="uniform")
    cvalid = _dev(10, (n, 64), kind="bool")
    is_thing = jnp.asarray(np.r_[False, rng.rand(40) > 0.4])
    time_fn(
        "panoptic_merge",
        lambda s, sc, i, cs, cv: panoptic_merge(s, sc, i, cs, cv, is_thing,
                                                41),
        sem_full, sem_score, inst, cscores, cvalid,
    )

    ori = _dev(11, (n, h, w, 2), BF)
    time_fn("aggregate_instance_orientations",
            lambda o, i: aggregate_instance_orientations(o, i, 64), ori, inst)

    # full postprocess on synthetic raw outputs
    from emsanet_tpu.config import ModelConfig

    cfg = ModelConfig(
        tasks=("semantic", "instance", "orientation", "scene"),
        enable_panoptic=True, input_height=h, input_width=w,
    )
    outputs = {
        "semantic": {"logits": logits},
        "instance": {
            "center": _dev(12, (n, h, w, 1), BF, kind="uniform"),
            "offset": _dev(13, (n, h, w, 2), BF),
            "orientation": ori,
        },
        "scene": {"logits": _dev(14, (n, 9), BF)},
    }
    time_fn("FULL postprocess", lambda o: postprocess(o, is_thing, cfg),
            outputs)


if __name__ == "__main__":
    main()
