"""Task losses.

Reference: `nicr_mt_scene_analysis.loss` (SURVEY.md M10):

- semantic/scene: weighted cross entropy with label smoothing and the
  legacy ESANet *weighted-pixel-sum* reduction (sum of per-pixel weighted
  CE divided by the sum of the weights of the contributing pixels) —
  numerically locked in the reference by tests/test_semantic_loss.py.
- instance center: MSE over the center-mask region (args.py:753 'mse').
- instance offset: L1 over GT foreground pixels.
- orientation: von-Mises biternion loss 1 - exp(kappa*(cos(delta) - 1))
  over orientation-foreground pixels (args.py:765-770).
- normal: masked L1 (args.py:774-780).

All losses are pure jnp, reduce to scalars in f32, and ignore void via
masks — no dynamic shapes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy_semantic(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Weighted CE with weighted-pixel-sum reduction; void (0) ignored.

    logits: (..., C) over void-free classes; target: (...) int in the FULL
    label space (0 = void, 1..C = classes).
    """
    n_classes = logits.shape[-1]
    valid = target > 0
    tgt = jnp.clip(target - 1, 0, n_classes - 1)

    # compare-select instead of take_along_axis/table[tgt]: per-pixel
    # gathers (and their scatter backward) are pathological on this TPU
    # (CLAUDE.md: 10M-index gather = 76 ms); the one-hot compare fuses
    # into the reductions and the VJP becomes softmax-minus-onehot with
    # no scatter.
    # reductions consume the NATIVE logits dtype: an upfront astype(f32)
    # fuses into the producing head conv and widens the depth-to-space
    # transpose copies to f32 (same pathology fixed in
    # postprocess_semantic); per-element f32 casts inside the reductions
    # keep the materialized head bf16
    m = jnp.max(logits, axis=-1)
    d = (logits - m[..., None]).astype(jnp.float32)
    logz = m.astype(jnp.float32) + jnp.log(jnp.sum(jnp.exp(d), axis=-1))
    onehot = (
        jnp.arange(n_classes, dtype=tgt.dtype) == tgt[..., None]
    )  # (..., C) pred
    tgt_logit = jnp.sum(
        jnp.where(onehot, logits, 0).astype(jnp.float32), axis=-1
    )
    nll = logz - tgt_logit  # == -log_softmax(logits)[tgt]
    if label_smoothing > 0.0:
        # == -mean(log_softmax)
        smooth = logz - jnp.mean(logits.astype(jnp.float32), axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    if class_weights is not None:
        cw = class_weights.astype(jnp.float32)
        w = jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def cross_entropy_scene(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Scene classification CE; target in full label space (0 = void)."""
    return cross_entropy_semantic(
        logits, target, class_weights=class_weights,
        label_smoothing=label_smoothing,
    )


def mse_center(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Center-heatmap MSE averaged over the mask region (M10)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    sq = (pred - target) ** 2
    if mask is None:
        return jnp.mean(sq)
    m = mask.astype(jnp.float32)
    if m.ndim == sq.ndim - 1:
        m = m[..., None]
    return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * sq.shape[-1], 1e-12)


def bce_center(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Binary cross entropy on the (sigmoid-encoded) center heatmap
    (args.py:753 'bce' alternative to 'mse')."""
    p = jnp.clip(pred.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    if mask is None:
        return jnp.mean(bce)
    m = mask.astype(jnp.float32)
    if m.ndim == bce.ndim - 1:
        m = m[..., None]
    return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m) * bce.shape[-1], 1e-12)


def l1_offset(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    foreground: jnp.ndarray,
) -> jnp.ndarray:
    """Offset L1 averaged over GT-foreground pixels."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = foreground.astype(jnp.float32)[..., None]
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m) * diff.shape[-1], 1e-12)


def von_mises_orientation(
    pred_biternion: jnp.ndarray,
    target_biternion: jnp.ndarray,
    foreground: jnp.ndarray,
    kappa: float = 1.0,
) -> jnp.ndarray:
    """Biternion von-Mises loss: 1 - exp(kappa * (cos(delta) - 1)).

    pred is L2-normalized here; target assumed unit-norm (sin, cos).
    """
    pred = pred_biternion.astype(jnp.float32)
    norm = jnp.linalg.norm(pred, axis=-1, keepdims=True)
    pred = pred / jnp.maximum(norm, 1e-7)
    cos_delta = jnp.sum(pred * target_biternion.astype(jnp.float32), axis=-1)
    loss = 1.0 - jnp.exp(kappa * (cos_delta - 1.0))
    m = foreground.astype(jnp.float32)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1e-12)


def l1_normal(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is None:
        return jnp.mean(diff)
    m = mask.astype(jnp.float32)[..., None]
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m) * diff.shape[-1], 1e-12)


# ---------------------------------------------------------------------------
# loss weighting (reference FixedLossWeighting + emsanet/loss_weighting.py)


def get_total_loss_key(task: str) -> str:
    """Key naming of per-task total losses (task_helper.base, SURVEY.md M10)."""
    return f"{task}_total_loss"


class FixedLossWeighting:
    """Constant per-loss weights: total = sum_k w_k * loss_k.

    Built from task weights with the reference's instance/orientation
    unrolling (emsanet/loss_weighting.py:26-47): orientation is a sub-loss
    of the instance decoder; the instance task weight is multiplied by the
    per-sub-task (center, offset) weighting.
    """

    def __init__(self, weights: Dict[str, float]):
        self.weights = dict(weights)

    def reduce_losses(
        self, losses: Dict[str, jnp.ndarray], batch_idx: int = 0
    ) -> jnp.ndarray:
        total = 0.0
        for key, weight in self.weights.items():
            if key in losses:
                total = total + weight * losses[key]
        return total

    def reset_weights(self):  # parity with the reference API (main.py:98)
        pass


def build_loss_weighting(
    tasks, tasks_weighting, instance_weighting=(2.0, 1.0)
) -> FixedLossWeighting:
    """emsanet/loss_weighting.py:11-49 semantics."""
    tasks_weights = dict(zip(tasks, tasks_weighting))
    loss_weights: Dict[str, float] = {}
    if "orientation" in tasks_weights:
        loss_weights[get_total_loss_key("instance_orientation")] = (
            tasks_weights.pop("orientation")
        )
    if "instance" in tasks_weights:
        w_inst = tasks_weights.pop("instance")
        w_center, w_offset = instance_weighting
        loss_weights[get_total_loss_key("instance_center")] = w_inst * w_center
        loss_weights[get_total_loss_key("instance_offset")] = w_inst * w_offset
    loss_weights.update(
        {get_total_loss_key(t): v for t, v in tasks_weights.items()}
    )
    return FixedLossWeighting(loss_weights)
