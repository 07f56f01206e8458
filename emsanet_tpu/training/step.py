"""Train/eval steps: multi-task loss computation + gradient update.

Reference behavior: `main.py:121-150` (RunHelper.training_step: forward,
per-task losses, fixed loss weighting, backward, SGD step) and the task
helpers' loss wiring (SURVEY.md M10/M11). Multi-scale side outputs are
supervised against the `_down_{32,16,8}` targets; the per-task total is
full-resolution loss + the sum of side losses.

TPU-first: the step is a pure function over a TrainState pytree; under
data parallelism it runs inside `shard_map` with gradients/metrics
`pmean`-ed over the 'data' mesh axis (SURVEY.md §2.4 TPU plan). bf16
compute is selected via ModelConfig.compute_dtype; params/optimizer state
stay f32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from emsanet_tpu.losses import (
    bce_center,
    build_loss_weighting,
    cross_entropy_scene,
    cross_entropy_semantic,
    get_total_loss_key,
    l1_normal,
    l1_offset,
    mse_center,
    von_mises_orientation,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.freeze({})),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def extract_device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Array-only view of a collated batch (drops lists/identifiers)."""
    import numpy as np

    out = {}
    for k, v in batch.items():
        if k.startswith("_down_") and isinstance(v, dict):
            sub = extract_device_batch(v)
            if sub:
                out[k] = sub
        elif isinstance(v, (np.ndarray, jnp.ndarray)) and not k.endswith(
            "_fullres"
        ):
            out[k] = v
    return out


def compute_losses(
    outputs: Dict[str, Any],
    batch: Dict[str, Any],
    cfg,
    class_weights: Optional[jnp.ndarray] = None,
    side_output_downscales: Tuple[int, ...] = (32, 16, 8),
    orientation_kappa: float = 1.0,
    label_smoothing: float = 0.0,
    scene_label_smoothing: Optional[float] = None,
    instance_center_loss: str = "mse",
    semantic_side_downscales: Optional[Tuple[int, ...]] = None,
    instance_side_downscales: Optional[Tuple[int, ...]] = None,
    normal_side_downscales: Optional[Tuple[int, ...]] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-task total losses keyed by `get_total_loss_key` names.

    cfg: ModelConfig. Side outputs (train mode) are matched positionally
    with `_down_{s}` target sub-batches; per-task downscale tuples are
    empty when that task trains without multiscale supervision
    (reference `--*-no-multiscale-supervision`, args.py:731,757,782) and
    default to `side_output_downscales` otherwise. `label_smoothing`
    applies to the semantic CE; `scene_label_smoothing` (default: same)
    to the scene CE (args.py '--{semantic,scene}-loss-label-smoothing').
    """
    losses: Dict[str, jnp.ndarray] = {}
    if scene_label_smoothing is None:
        scene_label_smoothing = label_smoothing
    if semantic_side_downscales is None:
        semantic_side_downscales = side_output_downscales
    if instance_side_downscales is None:
        instance_side_downscales = side_output_downscales
    if normal_side_downscales is None:
        normal_side_downscales = side_output_downscales

    def down(s):
        return batch.get(f"_down_{s}", {})

    if "semantic" in outputs and "semantic" in batch:
        if "decode_input" in outputs["semantic"]:
            # fused_train_head: the final x2 stage was deferred into the
            # fused upsample+CE kernel (ops/semantic_train_head.py) —
            # the full-res logits never materialize
            from emsanet_tpu.ops.semantic_train_head import (
                fused_semantic_head_loss,
            )

            di = outputs["semantic"]["decode_input"]
            total = fused_semantic_head_loss(
                di["x"], di["kernel"], batch["semantic"],
                class_weights, label_smoothing,
            )
        else:
            total = cross_entropy_semantic(
                outputs["semantic"]["logits"], batch["semantic"],
                class_weights, label_smoothing,
            )
        for side, s in zip(
            outputs["semantic"].get("side_outputs", ()),
            semantic_side_downscales,
        ):
            tgt = down(s).get("semantic")
            if tgt is not None:
                total = total + cross_entropy_semantic(
                    side, tgt, class_weights, label_smoothing
                )
        losses[get_total_loss_key("semantic")] = total

    if "instance" in outputs and "instance_center" in batch:
        inst = outputs["instance"]
        center_loss_fn = bce_center if instance_center_loss == "bce" \
            else mse_center
        center_total = center_loss_fn(
            inst["center"], batch["instance_center"],
            batch.get("instance_center_mask"),
        )
        offset_total = l1_offset(
            inst["offset"], batch["instance_offset"],
            batch["instance_foreground"],
        )
        orient_total = None
        if "orientation" in inst and "orientation" in batch:
            orient_total = von_mises_orientation(
                inst["orientation"], batch["orientation"],
                batch["orientation_foreground"], kappa=orientation_kappa,
            )
        for side, s in zip(
            inst.get("side_outputs", ()), instance_side_downscales
        ):
            sub = down(s)
            if "instance_center" not in sub:
                continue
            center_total = center_total + center_loss_fn(
                side[..., 0:1], sub["instance_center"],
                sub.get("instance_center_mask"),
            )
            offset_total = offset_total + l1_offset(
                side[..., 1:3], sub["instance_offset"],
                sub["instance_foreground"],
            )
            if orient_total is not None and "orientation" in sub:
                orient_total = orient_total + von_mises_orientation(
                    side[..., 3:5], sub["orientation"],
                    sub["orientation_foreground"], kappa=orientation_kappa,
                )
        losses[get_total_loss_key("instance_center")] = center_total
        losses[get_total_loss_key("instance_offset")] = offset_total
        if orient_total is not None:
            losses[get_total_loss_key("instance_orientation")] = orient_total

    if "scene" in outputs and "scene" in batch:
        losses[get_total_loss_key("scene")] = cross_entropy_scene(
            outputs["scene"]["logits"], batch["scene"],
            label_smoothing=scene_label_smoothing,
        )

    if "normal" in outputs and "normal" in batch:
        mask = batch.get("normal_mask")
        total = l1_normal(
            outputs["normal"]["normal"], batch["normal"], mask
        )
        for side, s in zip(
            outputs["normal"].get("side_outputs", ()), normal_side_downscales
        ):
            sub = down(s)
            if "normal" in sub:
                total = total + l1_normal(
                    side, sub["normal"], sub.get("normal_mask")
                )
        losses[get_total_loss_key("normal")] = total

    return losses


def make_train_step(
    model,
    cfg,
    class_weights: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
):
    """Build the jittable train step.

    cfg: EMSANetConfig. With `axis_name` set, gradients and loss metrics
    are pmean-ed across that mesh axis (use inside shard_map/pmap).
    """
    loss_weighting = build_loss_weighting(
        cfg.model.tasks, cfg.train.tasks_weighting, cfg.train.instance_weighting
    )
    side_downscales = cfg.model.side_output_downscales
    per_task_downscales = {
        task: cfg.model.task_side_output_downscales(task)
        for task in ("semantic", "instance", "normal")
    }

    def loss_fn(params, batch_stats, batch, dropout_rng):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            train=True,
            # 'fused_bn' carries BN running-stat updates from the fused
            # train-mode chain kernels (ModelConfig.fused_training); it
            # stays empty on the unfused path
            mutable=["batch_stats", "fused_bn"],
            rngs={"dropout": dropout_rng},
        )
        losses = compute_losses(
            outputs,
            batch,
            cfg.model,
            class_weights=class_weights,
            side_output_downscales=side_downscales,
            semantic_side_downscales=per_task_downscales["semantic"],
            instance_side_downscales=per_task_downscales["instance"],
            normal_side_downscales=per_task_downscales["normal"],
            orientation_kappa=cfg.train.orientation_kappa,
            label_smoothing=cfg.train.semantic_loss_label_smoothing,
            scene_label_smoothing=cfg.train.scene_loss_label_smoothing,
            instance_center_loss=cfg.train.instance_center_loss,
        )
        total = loss_weighting.reduce_losses(losses)
        from emsanet_tpu.ops.nbt1d_train import merge_fused_bn_updates

        new_stats = merge_fused_bn_updates(
            mutated["batch_stats"], mutated.get("fused_bn")
        )
        return total, (losses, new_stats)

    def train_step(state: TrainState, batch, dropout_rng):
        (total, (losses, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, dropout_rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            total = jax.lax.pmean(total, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
            new_batch_stats = jax.lax.pmean(new_batch_stats, axis_name)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_batch_stats)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return state, metrics

    return train_step


def make_eval_step(
    model,
    cfg,
    is_thing: jnp.ndarray,
    depth_stats: Optional[Tuple[float, float]] = None,
    raw_depth: bool = False,
    use_orientations: Optional[jnp.ndarray] = None,
):
    """Forward + full postprocessing, jittable (validation hot path).

    With `depth_stats` set, raw uint8 RGB / raw depth inputs are
    normalized on-device (fused into the first conv; ops/device_prep.py).
    """
    from emsanet_tpu.ops.device_prep import prepare_inputs_device
    from emsanet_tpu.postprocessing import postprocess

    def eval_step(params, batch_stats, batch):
        if depth_stats is not None:
            batch = prepare_inputs_device(
                batch, depth_stats[0], depth_stats[1], raw_depth
            )
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            {k: batch[k] for k in ("rgb", "depth") if k in batch},
            train=False,
        )
        preds = postprocess(
            outputs, is_thing, cfg.model,
            gt_foreground=batch.get("instance_foreground"),
            use_orientations=use_orientations,
        )
        return preds

    return eval_step
