"""Loss tests: weighted-pixel-sum CE semantics and masked task losses.

Analog of the reference's tests/test_semantic_loss.py (SURVEY.md §4):
the weighted CE is numerically locked against a hand-computed
weighted-pixel-sum reduction (legacy ESANet semantics).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.losses import (
    build_loss_weighting,
    cross_entropy_semantic,
    get_total_loss_key,
    l1_offset,
    mse_center,
    von_mises_orientation,
)


def _np_weighted_ce(logits, target, weights):
    """Brute-force weighted-pixel-sum CE, void (0) ignored."""
    logits = logits.reshape(-1, logits.shape[-1]).astype(np.float64)
    target = target.reshape(-1)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    total, wsum = 0.0, 0.0
    for lp, t in zip(logp, target):
        if t == 0:
            continue
        w = weights[t - 1]
        total += -lp[t - 1] * w
        wsum += w
    return total / wsum


def test_weighted_ce_matches_bruteforce():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 4, 4, 5).astype(np.float32)
    target = rng.randint(0, 6, size=(2, 4, 4))
    target[0, 0, 0] = 0  # some void
    weights = rng.uniform(0.5, 2.0, size=5).astype(np.float32)

    got = float(
        cross_entropy_semantic(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(weights)
        )
    )
    want = _np_weighted_ce(logits, target, weights)
    assert got == pytest.approx(want, rel=1e-5)


def test_ce_ignores_void_only_batch():
    logits = jnp.zeros((1, 2, 2, 3))
    target = jnp.zeros((1, 2, 2), jnp.int32)  # all void
    loss = float(cross_entropy_semantic(logits, target))
    assert loss == 0.0


def test_ce_label_smoothing_increases_min_loss():
    logits = jnp.asarray(np.eye(4)[None, None] * 100.0, jnp.float32)
    target = jnp.arange(1, 5)[None, None, :]
    plain = float(cross_entropy_semantic(logits, target))
    smoothed = float(
        cross_entropy_semantic(logits, target, label_smoothing=0.1)
    )
    assert plain == pytest.approx(0.0, abs=1e-5)
    assert smoothed > plain


def test_mse_center_mask():
    pred = jnp.ones((1, 4, 4, 1))
    target = jnp.zeros((1, 4, 4, 1))
    mask = np.zeros((1, 4, 4), bool)
    mask[0, 0, 0] = True
    # only the masked pixel contributes: (1-0)^2 = 1
    assert float(mse_center(pred, target, jnp.asarray(mask))) == pytest.approx(1.0)
    assert float(mse_center(pred, target)) == pytest.approx(1.0)


def test_l1_offset_foreground_only():
    pred = jnp.ones((1, 2, 2, 2)) * 3.0
    target = jnp.ones((1, 2, 2, 2))
    fg = np.array([[[True, False], [False, False]]])
    assert float(l1_offset(pred, target, jnp.asarray(fg))) == pytest.approx(2.0)


def test_von_mises_zero_at_match():
    h = w = 4
    theta = 0.7
    t = np.zeros((1, h, w, 2), np.float32)
    t[..., 0] = np.sin(theta)
    t[..., 1] = np.cos(theta)
    fg = np.ones((1, h, w), bool)
    loss_same = float(
        von_mises_orientation(jnp.asarray(t), jnp.asarray(t), jnp.asarray(fg))
    )
    assert loss_same == pytest.approx(0.0, abs=1e-6)
    # opposite angle gives max loss 1 - exp(-2*kappa)
    opp = -t
    loss_opp = float(
        von_mises_orientation(
            jnp.asarray(opp), jnp.asarray(t), jnp.asarray(fg), kappa=1.0
        )
    )
    assert loss_opp == pytest.approx(1.0 - np.exp(-2.0), rel=1e-5)


def test_loss_weighting_unrolling():
    """emsanet/loss_weighting.py:26-47 semantics."""
    lw = build_loss_weighting(
        tasks=("semantic", "instance", "orientation", "scene"),
        tasks_weighting=(1.0, 3.0, 0.5, 0.25),
        instance_weighting=(2.0, 1.0),
    )
    assert lw.weights[get_total_loss_key("semantic")] == 1.0
    assert lw.weights[get_total_loss_key("instance_center")] == 6.0
    assert lw.weights[get_total_loss_key("instance_offset")] == 3.0
    assert lw.weights[get_total_loss_key("instance_orientation")] == 0.5
    assert lw.weights[get_total_loss_key("scene")] == 0.25

    losses = {
        get_total_loss_key("semantic"): jnp.asarray(2.0),
        get_total_loss_key("instance_center"): jnp.asarray(1.0),
        get_total_loss_key("instance_offset"): jnp.asarray(1.0),
        get_total_loss_key("instance_orientation"): jnp.asarray(4.0),
        get_total_loss_key("scene"): jnp.asarray(8.0),
    }
    total = float(lw.reduce_losses(losses))
    assert total == pytest.approx(2.0 + 6.0 + 3.0 + 2.0 + 2.0)
