"""Per-stage postprocessing timings on REAL flagship head outputs.

tools/postproc_breakdown.py feeds synthetic full-res tensors and sums
to ~13.5 ms at b32, but the isolated postprocess on real head outputs
measures ~23 ms (tools/r3_perf_probe.py --breakdown-batches 32) — the
gap lives in how postproc consumes the actual fwd-output layouts
(polyphase semantic head, bf16 maps from depth-to-space reshapes).
This tool precomputes the real raw outputs once on device, then times
each postprocessing stage on them in ONE process.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/postproc_real_probe.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=50):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=50)
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} b{n}", flush=True)

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.ops.polyphase_upsample import depth_to_space
    from emsanet_tpu.ops.segment_ops import small_table_lookup
    from emsanet_tpu.postprocessing import (
        panoptic_merge,
        postprocess,
        postprocess_instance,
        postprocess_semantic,
        postprocess_semantic_polyphase,
    )

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            fused_inference=True,
            # this tool probes the y4c (polyphase-domain) stages
            head_decode_fusion="interleave",
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(n, 480, 640, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(n, 480, 640, 1), jnp.float32)

    raw = jax.jit(
        lambda v, r, d: model.apply(v, {"rgb": r, "depth": d}, train=False)
    )(variables, rgb, depth)
    raw = jax.tree.map(lambda x: x.block_until_ready(), raw)
    print("raw output keys:", {k: list(v) for k, v in raw.items()
                               if isinstance(v, dict)}, flush=True)

    y4c = raw["semantic"]["logits_polyphase"]
    center = raw["instance"]["center"]
    offset = raw["instance"]["offset"]
    ori = raw["instance"].get("orientation")

    t = probe(jax.jit(lambda y: scalar(postprocess_semantic_polyphase(y))),
              y4c, runs=args.runs)
    print(f"semantic polyphase decode            {t*1e3:8.3f} ms", flush=True)

    t = probe(jax.jit(
        lambda y: scalar(postprocess_semantic(depth_to_space(y)))),
        y4c, runs=args.runs)
    print(f"semantic interleave-then-decode      {t*1e3:8.3f} ms", flush=True)

    @jax.jit
    def fg_of(y):
        sem = postprocess_semantic_polyphase(y)
        fgm = small_table_lookup(sem["segmentation_idx"] + 1, is_thing)
        return scalar((sem["segmentation_idx"], sem["score"], fgm))

    t = probe(fg_of, y4c, runs=args.runs)
    print(f"semantic decode + foreground lookup  {t*1e3:8.3f} ms", flush=True)

    # instance on real maps with a device-computed foreground
    fgm = jax.jit(lambda y: small_table_lookup(
        postprocess_semantic_polyphase(y)["segmentation_idx"] + 1, is_thing
    ))(y4c).block_until_ready()

    @jax.jit
    def inst_of(c, o, m):
        return scalar(postprocess_instance(
            c, o, m,
            threshold=cfg.model.instance_center_heatmap_threshold,
            nms_kernel_size=cfg.model.instance_center_heatmap_nms_kernel_size,
            top_k=cfg.model.instance_center_heatmap_top_k,
            normalized_offset=cfg.model.instance_normalized_offset,
        ))

    t = probe(inst_of, center, offset, fgm, runs=args.runs)
    print(f"instance (nms+topk+grouping)         {t*1e3:8.3f} ms", flush=True)

    inst = jax.jit(lambda c, o, m: postprocess_instance(
        c, o, m,
        threshold=cfg.model.instance_center_heatmap_threshold,
        nms_kernel_size=cfg.model.instance_center_heatmap_nms_kernel_size,
        top_k=cfg.model.instance_center_heatmap_top_k,
        normalized_offset=cfg.model.instance_normalized_offset,
    ))(center, offset, fgm)
    inst = jax.tree.map(lambda x: x.block_until_ready(), inst)
    semf = jax.jit(lambda y: postprocess_semantic_polyphase(y))(y4c)
    semf = jax.tree.map(lambda x: x.block_until_ready(), semf)

    @jax.jit
    def merge_of(sidx, sscore, iseg, cscore, cvalid, ov):
        return scalar(panoptic_merge(
            sidx + 1, sscore, iseg, cscore, cvalid, is_thing,
            n_classes=int(is_thing.shape[0]), orientation_vectors=ov,
        ))

    t = probe(merge_of, semf["segmentation_idx"], semf["score"],
              inst["segmentation"], inst["centers_score"],
              inst["centers_valid"], ori, runs=args.runs)
    print(f"panoptic merge (+orientations)       {t*1e3:8.3f} ms", flush=True)

    t = probe(jax.jit(
        lambda r: scalar(postprocess(r, is_thing, cfg.model))),
        raw, runs=args.runs)
    print(f"FULL postprocess (real outputs)      {t*1e3:8.3f} ms", flush=True)

    # how much of FULL is just returning the raw full-res maps?
    @jax.jit
    def passthrough(c, o):
        return scalar((c, o))

    t = probe(passthrough, center, offset, runs=args.runs)
    print(f"passthrough center+offset consume    {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
