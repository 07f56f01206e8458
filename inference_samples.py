"""Single-image inference on raw RGB-D sample files.

Mirrors the reference `inference_samples.py` (SURVEY.md R12/§3.3): loads
Kinect-v2-style RGB + depth PNG pairs (depth uint16 in mm), applies the
depth clip/scale flags, runs the test preprocessor + jit forward with full
postprocessing, and writes (or shows) a 2x4 result panel.

Usage:
    python inference_samples.py --dataset nyuv2 \
        --weights-filepath <ckpt.msgpack> \
        --sample-path ./samples --depth-max 8000 --depth-scale 8
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def prepare_raw_depth(depth, depth_max, depth_scale):
    """Kinect-style raw-depth handling (reference
    inference_samples.py:108-115): values above `depth_max` become 0
    (invalid), then `depth_scale` is applied — in that order, so the
    clip threshold is in RAW sensor units (mm for the Kinect-v2
    samples), not in scaled units."""
    import numpy as np

    depth = np.asarray(depth).astype(np.float32)
    if depth_max is not None:
        depth = np.where(depth > depth_max, 0, depth)
    return depth * depth_scale


def _get_args(argv=None):
    from emsanet_tpu.utils.cli import args_to_config, build_parser

    parser = build_parser()
    group = parser.add_argument_group("inference")
    group.add_argument("--sample-path", default="./samples",
                       help="directory with *_rgb.png / *_depth.png pairs")
    group.add_argument("--depth-max", type=float, default=None,
                       help="clip depth values above this (raw units)")
    group.add_argument("--depth-scale", type=float, default=1.0,
                       help="scale factor applied to depth after clipping")
    group.add_argument("--output-path", default=None,
                       help="write panels here instead of showing them")
    ns = parser.parse_args(argv)
    # inference uses the validation input size (reference maps inference
    # size onto validation size, inference_samples.py:24-58)
    cfg = args_to_config(ns)
    return cfg, ns


def main(argv=None):
    cfg, ns = _get_args(argv)
    if ns.device == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from emsanet_tpu.datasets.base import SampleIdentifier
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.postprocessing import postprocess
    from emsanet_tpu.preprocessing import batch_collate, get_preprocessor
    from emsanet_tpu.visualization import (
        blend,
        setup_shared_color_generators,
        visualize_depth,
        visualize_instance,
        visualize_instance_center,
        visualize_instance_offset,
        visualize_orientation,
        visualize_panoptic,
        visualize_semantic,
    )

    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(cfg.train.seed))
    from emsanet_tpu.training import create_train_state, get_optimizer

    state = create_train_state(model, variables, get_optimizer(cfg.train))
    if cfg.train.weights_filepath:
        from emsanet_tpu.weights import load_weights_file

        state = load_weights_file(cfg.train.weights_filepath, state, cfg)
        print(f"loaded weights: {cfg.train.weights_filepath}")
    else:
        print("WARNING: no --weights-filepath given, using random weights")

    preprocessor = get_preprocessor(cfg, ds_config, phase="test",
                                    keep_raw_inputs=True)
    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    setup_shared_color_generators(ds_config)

    @jax.jit
    def infer(params, batch_stats, rgb, depth):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            {"rgb": rgb, "depth": depth}, train=False,
        )
        return postprocess(outputs, is_thing, cfg.model)

    rgb_files = sorted(glob.glob(os.path.join(ns.sample_path, "*_rgb.png")))
    if not rgb_files:
        print(f"no *_rgb.png files in {ns.sample_path}", file=sys.stderr)
        return 1

    for rgb_file in rgb_files:
        depth_file = rgb_file.replace("_rgb.png", "_depth.png")
        rgb = np.asarray(Image.open(rgb_file))[..., :3]
        depth = prepare_raw_depth(
            np.asarray(Image.open(depth_file)), ns.depth_max, ns.depth_scale
        )

        sample = preprocessor({
            "rgb": rgb,
            "depth": depth,
            "identifier": SampleIdentifier(
                (os.path.basename(rgb_file)[: -len("_rgb.png")],)
            ),
        })
        batch = batch_collate([sample])
        preds = jax.device_get(
            infer(state.params, state.batch_stats,
                  jnp.asarray(batch["rgb"]), jnp.asarray(batch["depth"]))
        )

        # assemble the 2x4 panel (reference: matplotlib panel, :132-191)
        raw = batch["_no_preprocessing"][0]
        h, w = batch["rgb"].shape[1:3]
        rgb_vis = np.asarray(
            Image.fromarray(raw["rgb"]).resize((w, h)), np.uint8
        )
        from emsanet_tpu.visualization import dense_instance_maps

        _center, _offset, _orientation = dense_instance_maps(preds, 0)
        panels = [
            ("rgb", rgb_vis),
            ("depth", visualize_depth(batch["depth"][0, ..., 0])),
            ("semantic",
             visualize_semantic(
                 preds["semantic_segmentation_idx"][0] + 1,
                 ds_config.semantic_label_list.colors_array)),
            ("instance", visualize_instance(preds["instance_segmentation"][0])
             if "instance_segmentation" in preds else np.zeros_like(rgb_vis)),
            ("instance_center",
             visualize_instance_center(_center)
             if _center is not None else np.zeros_like(rgb_vis)),
            ("instance_offset",
             visualize_instance_offset(_offset)
             if _offset is not None else np.zeros_like(rgb_vis)),
            ("panoptic",
             visualize_panoptic(preds["panoptic_segmentation_deeplab"][0],
                                ds_config)
             if "panoptic_segmentation_deeplab" in preds
             else np.zeros_like(rgb_vis)),
            ("orientation",
             visualize_orientation(
                 _orientation,
                 preds.get("panoptic_foreground_mask", [None])[0])
             if _orientation is not None else np.zeros_like(rgb_vis)),
        ]
        rows = []
        for r in range(2):
            rows.append(np.concatenate(
                [p for _, p in panels[r * 4:(r + 1) * 4]], axis=1
            ))
        panel = np.concatenate(rows, axis=0)

        name = os.path.basename(rgb_file).replace("_rgb.png", "")
        if "scene_class_idx" in preds:
            scene_idx = int(preds["scene_class_idx"][0]) + 1
            labels = ds_config.scene_label_list
            scene = labels[scene_idx].class_name if scene_idx < len(labels) \
                else str(scene_idx)
            print(f"{name}: scene = {scene} "
                  f"({float(preds['scene_class_score'][0]):.3f})")

        if ns.output_path:
            os.makedirs(ns.output_path, exist_ok=True)
            out_file = os.path.join(ns.output_path, f"result_{name}.png")
            Image.fromarray(panel).save(out_file)
            print(f"{name}: wrote {out_file}")
        else:
            try:
                import matplotlib.pyplot as plt

                plt.figure(figsize=(16, 6))
                plt.imshow(panel)
                plt.axis("off")
                plt.title(" | ".join(t for t, _ in panels))
                plt.show()
            except Exception:
                out_file = f"result_{name}.png"
                Image.fromarray(panel).save(out_file)
                print(f"{name}: display unavailable, wrote {out_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
