"""b1 latency: per-stage breakdown of the decode-planes postprocessing.

After the round-4 decoder megakernel, the b1 e2e splits ~3.8 ms fwd /
~2.15 ms postproc+boundary (tools/trunk_ab.py) — this probe locates the
postproc side. One process, one TPU job; real raw outputs precomputed on
device; all probes barrier-forced (CLAUDE.md timing rules).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/b1_stage_probe.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def probe(fn, *args, runs=80):
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--runs", type=int, default=80)
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} b{n}", flush=True)

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.ops.instance_head import (
        encodings_for,
        instance_head_upsample,
    )
    from emsanet_tpu.ops.segment_ops import small_table_lookup
    from emsanet_tpu.ops.semantic_decode import semantic_decode_fused_planes
    from emsanet_tpu.postprocessing import (
        find_instance_centers_planes,
        group_pixels_to_instances_planes,
        interleave_plane,
        panoptic_merge_flat,
        postprocess,
    )

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=480, input_width=640,
            compute_dtype="bfloat16",
            fused_inference=True,
            decoder_megakernel="auto",
            head_decode_fusion="decode-planes",
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
    m = cfg.model

    # --- top-level split --------------------------------------------------
    @jax.jit
    def fwd(v, r, d):
        return scalar(model.apply(v, {"rgb": r, "depth": d}, train=False))

    @jax.jit
    def e2e(v, r, d):
        out = model.apply(v, {"rgb": r, "depth": d}, train=False)
        return scalar(postprocess(out, is_thing, m))

    raw = jax.jit(
        lambda v, r, d: model.apply(v, {"rgb": r, "depth": d}, train=False)
    )(variables, rgb, depth)
    raw = jax.tree.map(lambda x: x.block_until_ready(), raw)

    @jax.jit
    def post_alone(raw):
        return scalar(postprocess(raw, is_thing, m))

    tf = probe(fwd, variables, rgb, depth, runs=args.runs)
    te = probe(e2e, variables, rgb, depth, runs=args.runs)
    tp = probe(post_alone, raw, runs=args.runs)
    print(f"fwd {tf*1e3:7.3f}  e2e {te*1e3:7.3f}  postproc {tp*1e3:7.3f}  "
          f"boundary {(te-tf-tp)*1e3:7.3f} ms", flush=True)

    # --- postproc stages on the real raw outputs --------------------------
    sdi = raw["semantic"]["decode_input"]
    di = raw["instance"]["decode_input"]
    enc = encodings_for(
        di["x"].shape[-1], m.instance_sigmoid_for_center,
        m.instance_tanh_for_offset)

    t = probe(jax.jit(
        lambda x, k: scalar(semantic_decode_fused_planes(x, k))),
        sdi["x"], sdi["kernel"], runs=args.runs)
    print(f"  semantic decode kernel             {t*1e3:8.3f} ms",
          flush=True)

    t = probe(jax.jit(
        lambda x, k: scalar(instance_head_upsample(x, k, enc))),
        di["x"], di["kernel"], runs=args.runs)
    print(f"  instance head kernel               {t*1e3:8.3f} ms",
          flush=True)

    idx4, score4 = jax.jit(semantic_decode_fused_planes)(
        sdi["x"], sdi["kernel"])
    planes = jax.jit(
        lambda x, k: instance_head_upsample(x, k, enc))(
        di["x"], di["kernel"])
    idx4, score4, planes = jax.tree.map(
        lambda x: x.block_until_ready(), (idx4, score4, planes))
    _, _, h2, w2 = idx4.shape
    h, w = 2 * h2, 2 * w2
    p_total = 4 * h2 * w2

    fg_planes = jax.jit(
        lambda i: small_table_lookup(i + 1, is_thing))(idx4)
    fg_planes = fg_planes.block_until_ready()

    t = probe(jax.jit(lambda i: scalar(
        small_table_lookup(i + 1, is_thing))), idx4, runs=args.runs)
    print(f"  foreground lookup                  {t*1e3:8.3f} ms",
          flush=True)

    @jax.jit
    def centers_of(cp, fp):
        return scalar(find_instance_centers_planes(
            cp, threshold=m.instance_center_heatmap_threshold,
            nms_kernel_size=m.instance_center_heatmap_nms_kernel_size,
            top_k=m.instance_center_heatmap_top_k,
            foreground_planes=(
                fp if m.instance_center_heatmap_apply_foreground_mask
                else None),
        ))

    t = probe(centers_of, planes[:, 0], fg_planes, runs=args.runs)
    print(f"  center NMS + top-k                 {t*1e3:8.3f} ms",
          flush=True)

    centers = jax.jit(lambda cp, fp: find_instance_centers_planes(
        cp, threshold=m.instance_center_heatmap_threshold,
        nms_kernel_size=m.instance_center_heatmap_nms_kernel_size,
        top_k=m.instance_center_heatmap_top_k,
        foreground_planes=(
            fp if m.instance_center_heatmap_apply_foreground_mask
            else None),
    ))(planes[:, 0], fg_planes)
    centers = jax.tree.map(lambda x: x.block_until_ready(), centers)

    @jax.jit
    def group_of(yx, valid, oy, ox, fgf):
        return scalar(group_pixels_to_instances_planes(
            yx, valid, oy, ox, fgf, (h, w),
            normalized_offset=m.instance_normalized_offset,
            offset_distance_threshold=m.instance_offset_distance_threshold,
        ))

    fg_flat = fg_planes.reshape(n, p_total)
    t = probe(group_of, centers["yx"], centers["valid"],
              planes[:, 1], planes[:, 2], fg_flat, runs=args.runs)
    print(f"  offset grouping                    {t*1e3:8.3f} ms",
          flush=True)

    inst_flat = jax.jit(lambda yx, valid, oy, ox, fgf:
                        group_pixels_to_instances_planes(
        yx, valid, oy, ox, fgf, (h, w),
        normalized_offset=m.instance_normalized_offset,
        offset_distance_threshold=m.instance_offset_distance_threshold,
    ))(centers["yx"], centers["valid"], planes[:, 1], planes[:, 2],
       fg_flat)
    inst_flat = inst_flat.block_until_ready()

    ori_flat = jnp.stack(
        [planes[:, 3].reshape(n, p_total),
         planes[:, 4].reshape(n, p_total)], axis=-1)

    @jax.jit
    def merge_of(i4, s4, instf, cs, cv, orif):
        return scalar(panoptic_merge_flat(
            (i4 + 1).reshape(n, p_total), s4.reshape(n, p_total),
            instf, cs, cv, is_thing,
            n_classes=int(is_thing.shape[0]),
            orientation_vectors=orif,
        ))

    t = probe(merge_of, idx4, score4, inst_flat, centers["scores"],
              centers["valid"], ori_flat, runs=args.runs)
    print(f"  panoptic merge (flat)              {t*1e3:8.3f} ms",
          flush=True)

    @jax.jit
    def interleaves(i4, s4, fp, instf):
        outs = [
            interleave_plane(i4), interleave_plane(s4),
            interleave_plane(fp),
            interleave_plane(instf.reshape(n, 4, h2, w2)),
        ]
        return scalar(tuple(outs))

    t = probe(interleaves, idx4, score4, fg_planes, inst_flat,
              runs=args.runs)
    print(f"  4x final-map interleaves           {t*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
