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
            lambda t: t.astype(jnp.float32).sum(), fn(*a)
        )
    )
    probe = jax.jit(lambda *a: sum(jax.tree.leaves(jfn(*a))))
    float(probe(*args))
    t, _ = queue_difference_timing(
        lambda: probe(*args), n_long=runs, n_short=max(runs // 4, 2)
    )
    print(f"{name:52s} {t*1e3:8.3f} ms", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    n, h, w = args.batch, 480, 640
    rng = np.random.RandomState(0)
    print(f"device={jax.devices()[0].device_kind} batch={n}", flush=True)

    logits = jnp.asarray(rng.randn(n, h, w, 40), BF)
    time_fn("semantic softmax+argmax+score (40ch)", postprocess_semantic,
            logits)

    heat = jnp.asarray(rng.rand(n, h, w), jnp.float32)
    fg = jnp.asarray(rng.rand(n, h, w) > 0.5)
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

    centers_yx = jnp.asarray(rng.randint(0, 479, (n, 64, 2)), jnp.int32)
    centers_valid = jnp.asarray(rng.rand(n, 64) > 0.3)
    offset = jnp.asarray(rng.randn(n, h, w, 2), BF)
    time_fn("group_pixels_to_instances (Pallas)",
            group_pixels_to_instances, centers_yx, centers_valid, offset, fg)

    sem_full = jnp.asarray(rng.randint(1, 41, (n, h, w)), jnp.int32)
    inst = jnp.asarray(rng.randint(0, 65, (n, h, w)), jnp.int32)
    sem_score = jnp.asarray(rng.rand(n, h, w), jnp.float32)
    cscores = jnp.asarray(rng.rand(n, 64), jnp.float32)
    cvalid = jnp.asarray(rng.rand(n, 64) > 0.3)
    is_thing = jnp.asarray(np.r_[False, rng.rand(40) > 0.4])
    time_fn(
        "panoptic_merge",
        lambda s, sc, i, cs, cv: panoptic_merge(s, sc, i, cs, cv, is_thing,
                                                41),
        sem_full, sem_score, inst, cscores, cvalid,
    )

    ori = jnp.asarray(rng.randn(n, h, w, 2), BF)
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
            "center": jnp.asarray(rng.rand(n, h, w, 1), BF),
            "offset": jnp.asarray(rng.randn(n, h, w, 2), BF),
            "orientation": ori,
        },
        "scene": {"logits": jnp.asarray(rng.randn(n, 9), BF)},
    }
    time_fn("FULL postprocess", lambda o: postprocess(o, is_thing, cfg),
            outputs)


if __name__ == "__main__":
    main()
