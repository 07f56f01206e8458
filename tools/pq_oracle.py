"""PQ ceiling probe: GT-derived head outputs through the real pipeline.

Feeds ORACLE predictions (one-hot GT semantic logits, the training target
center heatmap / offsets / dense orientation, one-hot GT scene) through
`postprocessing.postprocess` + the task helpers. The resulting metrics are
the ceiling the center-grouping postprocessing can reach on this data with
PERFECT dense predictions — anything below 1.0 here is a pipeline/data
property (NMS/top-k/threshold vs the synthetic layout), not a training
failure. Informs the overfit-to-convergence bar (VERDICT r4 #1).

Usage: python tools/pq_oracle.py RUN_DIR [--train-loader]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="run dir whose args.json defines the "
                    "dataset/postprocessing config")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emsanet_tpu.config import EMSANetConfig
    from emsanet_tpu.data import get_datahelper
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.postprocessing import postprocess
    from emsanet_tpu.preprocessing import get_preprocessor
    from emsanet_tpu.task_helper import get_task_helpers

    with open(os.path.join(args.run_dir, "args.json")) as fh:
        cfg = EMSANetConfig.from_json(fh.read())
    # the oracle feeds plain full-res maps; no fused head contract
    cfg.model.fused_inference = False

    ds_config = get_dataset_config(cfg.data)
    data = get_datahelper(cfg)
    multiscale = cfg.model.side_output_downscales or None
    # train preprocessor: generates the center/offset/orientation targets
    # (augs are off in the overfit runs, so the view matches eval)
    data.set_train_preprocessor(
        get_preprocessor(cfg, ds_config, "train",
                         multiscale_downscales=multiscale)
    )
    data.set_valid_preprocessor(get_preprocessor(cfg, ds_config, "test"))

    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    use_orientations = jnp.asarray(
        ds_config.semantic_label_list.classes_use_orientations
    )
    n_sem = len(ds_config.semantic_label_list) - 1  # void-free
    n_scene = len(ds_config.scene_label_list) - 1

    post = jax.jit(lambda outputs, gt_fg: postprocess(
        outputs, is_thing, cfg.model, gt_foreground=gt_fg,
        use_orientations=use_orientations))

    task_helpers = get_task_helpers(cfg, ds_config)
    for th in task_helpers:
        th.initialize()

    n_batches = 0
    for batch in data.train_loader.batches(0):
        sem = np.asarray(batch["semantic"]).astype(np.int32)
        scene = np.asarray(batch["scene"]).astype(np.int32)
        outputs = {
            "semantic": {"logits": jnp.asarray(
                10.0 * jax.nn.one_hot(sem - 1, n_sem))},
            "instance": {
                "center": jnp.asarray(batch["instance_center"]),
                "offset": jnp.asarray(batch["instance_offset"]),
                "orientation": jnp.asarray(batch["orientation"]),
            },
            "scene": {"logits": jnp.asarray(
                10.0 * jax.nn.one_hot(scene - 1, n_scene))},
        }
        preds = jax.device_get(post(
            outputs, jnp.asarray(batch["instance_foreground"])))
        for th in task_helpers:
            th.validation_step(batch, preds)
        n_batches += 1

    logs = {}
    for th in task_helpers:
        _, l = th.validation_epoch_end()
        logs.update(l)
    print(f"[oracle] {n_batches} batches")
    print(json.dumps({k: round(float(v), 4) for k, v in logs.items()}))


if __name__ == "__main__":
    main()
