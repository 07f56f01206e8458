"""Batch inference over a dataset split with benchmark-format writers.

Mirrors the reference `inference_dataset.py` (SURVEY.md R13): runs full
multi-task inference over a split and writes benchmark submission
formats —

- semantic: per-image class PNGs (ScanNet-benchmark style, ref :240-307),
- instance: per-instance binary mask PNGs + a txt index with class and
  score (ref :310-442),
- panoptic: 3-channel PNGs with R = semantic class, G/B = 16-bit instance
  id (ref :157-237),
- 'mapping' npz: packed class+score float32 arrays (ref :445-552),

plus a per-run meta.json audit trail (ref :695-720).

Usage:
    python inference_dataset.py --dataset nyuv2 --dataset-path ... \
        --weights-filepath ckpt.msgpack --inference-output-path ./out \
        --inference-output-format semantic panoptic
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _get_args(argv=None):
    from emsanet_tpu.utils.cli import args_to_config, build_parser

    parser = build_parser()
    g = parser.add_argument_group("dataset inference")
    g.add_argument("--inference-output-path", default="./inference_output")
    g.add_argument("--inference-output-format", nargs="+",
                   default=("semantic",),
                   choices=("semantic", "instance", "panoptic", "mapping"))
    g.add_argument("--inference-split", default=None,
                   help="split to run on (default: validation split)")
    g.add_argument("--inference-max-samples", type=int, default=None)
    g.add_argument("--inference-output-fullres", action="store_true",
                   help="resize predictions back to the native resolution "
                   "before writing (reference benchmark protocol)")
    ns = parser.parse_args(argv)
    cfg = args_to_config(ns)
    return cfg, ns


def write_semantic(out_dir, ident, semantic_idx):
    """Per-pixel class PNG in the full label space (ref :240-307)."""
    from PIL import Image
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    Image.fromarray(semantic_idx.astype(np.uint8)).save(
        os.path.join(out_dir, f"{ident}.png")
    )


def write_instance(out_dir, ident, instance_seg, meta_semantic, meta_score,
                   meta_valid):
    """Instance masks + index txt (ref :310-442)."""
    from PIL import Image
    import numpy as np

    mask_dir = os.path.join(out_dir, "masks", ident)
    os.makedirs(mask_dir, exist_ok=True)
    lines = []
    for k in range(meta_valid.shape[0]):
        if not meta_valid[k]:
            continue
        inst_id = k + 1
        mask = (instance_seg == inst_id).astype(np.uint8) * 255
        if not mask.any():
            continue
        rel = os.path.join("masks", ident, f"{inst_id:03d}.png")
        Image.fromarray(mask).save(os.path.join(out_dir, rel))
        lines.append(f"{rel} {int(meta_semantic[k])} "
                     f"{float(meta_score[k]):.6f}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{ident}.txt"), "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))


def write_panoptic(out_dir, ident, panoptic, label_divisor):
    """R = semantic class, G/B = instance id 16-bit (ref :157-237)."""
    from PIL import Image
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    sem = (panoptic // label_divisor).astype(np.uint8)
    inst = (panoptic % label_divisor).astype(np.uint16)
    img = np.stack(
        [sem, (inst >> 8).astype(np.uint8), (inst & 0xFF).astype(np.uint8)],
        axis=-1,
    )
    Image.fromarray(img).save(os.path.join(out_dir, f"{ident}.png"))


def write_mapping(out_dir, ident, semantic_idx, semantic_score):
    """Packed class+score float32 npz (ref :445-552): value =
    class + score with score in (0, 1)."""
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    packed = semantic_idx.astype(np.float32) + np.clip(
        semantic_score.astype(np.float32), 0.0, 0.999
    )
    np.savez_compressed(os.path.join(out_dir, f"{ident}.npz"), packed=packed)


def main(argv=None):
    cfg, ns = _get_args(argv)
    if ns.device == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emsanet_tpu.data import get_datahelper
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.metrics import LABEL_DIVISOR
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.preprocessing import get_preprocessor
    from emsanet_tpu.training import create_train_state, get_optimizer
    from emsanet_tpu.training.step import extract_device_batch

    if ns.inference_split:
        cfg.data.validation_split = ns.inference_split

    ds_config = get_dataset_config(cfg.data)
    data = get_datahelper(cfg)
    data.set_valid_preprocessor(get_preprocessor(cfg, ds_config, "test"))

    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(cfg.train.seed))
    state = create_train_state(model, variables, get_optimizer(cfg.train))
    if cfg.train.weights_filepath:
        from emsanet_tpu.weights import load_weights_file

        state = load_weights_file(cfg.train.weights_filepath, state, cfg)

    from emsanet_tpu.training import make_eval_step

    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    eval_step = jax.jit(make_eval_step(model, cfg, is_thing))

    out_root = ns.inference_output_path
    formats = tuple(ns.inference_output_format)
    t_start = time.time()
    n_written = 0
    for camera, loader in data.valid_loaders.items():
        for batch in loader.batches(0):
            device_batch = extract_device_batch(batch)
            preds = jax.device_get(eval_step(
                state.params, state.batch_stats,
                {k: device_batch[k] for k in ("rgb", "depth")
                 if k in device_batch},
            ))
            valid = batch.get(
                "_valid_mask", np.ones(len(batch["identifier"]), bool)
            )

            def at_output_res(arr_b):
                """Optionally resize an id map to the native resolution."""
                if not ns.inference_output_fullres:
                    return arr_b
                full = batch.get("rgb_fullres")
                if full is None:
                    return arr_b
                from emsanet_tpu.task_helper import _resize_ids_nearest

                oh, ow = np.asarray(full).shape[1:3]
                return _resize_ids_nearest(np.asarray(arr_b), oh, ow)

            for b, ident_obj in enumerate(batch["identifier"]):
                if not valid[b]:
                    continue
                if (ns.inference_max_samples
                        and n_written >= ns.inference_max_samples):
                    break
                ident = ident_obj.to_filename() if hasattr(
                    ident_obj, "to_filename") else str(ident_obj)
                if "semantic" in formats:
                    write_semantic(
                        os.path.join(out_root, "semantic"), ident,
                        at_output_res(
                            preds["semantic_segmentation_idx"][b] + 1
                        ),
                    )
                if "instance" in formats and "instance_segmentation" in preds:
                    write_instance(
                        os.path.join(out_root, "instance"), ident,
                        preds["instance_segmentation"][b],
                        preds["panoptic_instance_meta_semantic_idx"][b],
                        preds["panoptic_instance_meta_score"][b],
                        preds["panoptic_instance_meta_valid"][b],
                    )
                if ("panoptic" in formats
                        and "panoptic_segmentation_deeplab" in preds):
                    write_panoptic(
                        os.path.join(out_root, "panoptic"), ident,
                        at_output_res(
                            preds["panoptic_segmentation_deeplab"][b]
                        ),
                        LABEL_DIVISOR,
                    )
                if "mapping" in formats:
                    write_mapping(
                        os.path.join(out_root, "mapping"), ident,
                        preds["semantic_segmentation_idx"][b] + 1,
                        preds["semantic_segmentation_score"][b],
                    )
                n_written += 1

    # meta.json audit trail (ref :695-720)
    meta = {
        "dataset": cfg.data.dataset,
        "split": cfg.data.validation_split,
        "formats": list(formats),
        "n_samples": n_written,
        "weights": cfg.train.weights_filepath,
        "elapsed_s": round(time.time() - t_start, 2),
        "config": cfg.to_dict(),
    }
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2, default=str)
    print(f"wrote {n_written} samples to {out_root} "
          f"({meta['elapsed_s']}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
