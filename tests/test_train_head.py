"""Fused train-mode semantic head loss kernel vs the unfused oracle.

The Pallas upsample+CE kernel (`ops/semantic_train_head.py`) must
reproduce the exact training loss of the unfused path (nearest-x2 +
SAME depthwise conv + losses.cross_entropy_semantic) and its gradients
w.r.t. the half-res logits and the depthwise kernel. All tests run in
interpret mode on the CPU backend (the code path the TPU compiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.ops.semantic_train_head import (
    _fused_loss,
    fused_semantic_head_loss,
    semantic_head_loss_reference,
)


def _case(rng, n, h2, w2, c, dtype, void_frac=0.2):
    x = jnp.asarray(rng.randn(n, h2, w2, c), jnp.float32).astype(dtype)
    k = jnp.asarray(
        rng.randn(3, 3, 1, c) * 0.3 + 0.1, jnp.float32
    )
    tgt = rng.randint(0, c + 1, (n, 2 * h2, 2 * w2))
    tgt = np.where(rng.rand(*tgt.shape) < void_frac, 0, tgt)
    return x, k, jnp.asarray(tgt, jnp.int32)


def _loss_pair(x, k, tgt, cw, ls):
    got = _fused_loss(float(ls), True, x, k, tgt,
                      cw if cw is not None
                      else jnp.ones((x.shape[-1],), jnp.float32))
    ref = semantic_head_loss_reference(x, k, tgt, cw, ls)
    return got, ref


@pytest.mark.parametrize("shape,c", [
    ((2, 12, 16, 8), 8),
    ((1, 24, 16, 5), 5),     # non-8-aligned class count (padded)
    ((2, 8, 8, 16), 16),     # tiny: padded halo mode
])
@pytest.mark.parametrize("ls", [0.0, 0.1])
def test_loss_matches_reference_f32(shape, c, ls):
    n, h2, w2, _ = shape
    rng = np.random.RandomState(0)
    x, k, tgt = _case(rng, n, h2, w2, c, jnp.float32)
    cw = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    got, ref = _loss_pair(x, k, tgt, cw, ls)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_loss_matches_reference_bf16():
    rng = np.random.RandomState(1)
    x, k, tgt = _case(rng, 2, 16, 16, 8, jnp.bfloat16)
    got, ref = _loss_pair(x, k, tgt, None, 0.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-3, atol=1e-4,
    )


def test_all_void_is_finite():
    rng = np.random.RandomState(2)
    x, k, _ = _case(rng, 1, 8, 8, 8, jnp.float32)
    tgt = jnp.zeros((1, 16, 16), jnp.int32)
    got, ref = _loss_pair(x, k, tgt, None, 0.0)
    assert np.isfinite(float(got))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6)


@pytest.mark.parametrize("ls", [0.0, 0.1])
@pytest.mark.parametrize("c", [8, 5])
def test_grads_match_reference_f32(ls, c):
    rng = np.random.RandomState(3)
    x, k, tgt = _case(rng, 2, 12, 16, c, jnp.float32)
    cw = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)

    def fused(x, k):
        return _fused_loss(float(ls), True, x, k, tgt, cw)

    def ref(x, k):
        return semantic_head_loss_reference(x, k, tgt, cw, ls)

    gx, gk = jax.grad(fused, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=1e-6
    )


def test_grads_match_reference_bf16():
    rng = np.random.RandomState(4)
    x, k, tgt = _case(rng, 2, 16, 16, 8, jnp.bfloat16)

    def fused(x, k):
        return _fused_loss(
            0.0, True, x, k, tgt, jnp.ones((8,), jnp.float32)
        )

    def ref(x, k):
        return semantic_head_loss_reference(x, k, tgt, None, 0.0)

    gx, gk = jax.grad(fused, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(ref, argnums=(0, 1))(x, k)
    # bf16 logits round differently through the two formulations; the
    # gradients agree to bf16 resolution
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(rx, np.float32),
        rtol=5e-2, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(rk), rtol=5e-2,
        atol=2e-3 * float(np.abs(np.asarray(rk)).max()),
    )


def test_dispatcher_reference_on_cpu():
    # on the CPU backend the public entry point uses the oracle directly
    rng = np.random.RandomState(5)
    x, k, tgt = _case(rng, 1, 8, 8, 8, jnp.float32)
    got = fused_semantic_head_loss(x, k, tgt)
    ref = semantic_head_loss_reference(x, k, tgt)
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6)


def test_model_train_loss_matches_unfused():
    """fused_train_head defers the semantic head in train mode; the
    semantic loss through the real model matches the unfused path."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.training.step import compute_losses

    def build(fused_head):
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "scene"),
                enable_panoptic=True,
                input_height=96, input_width=128,
                rgb_encoder_backbone="resnet18",
                depth_encoder_backbone="resnet18",
                fused_training=True,
                fused_train_head=fused_head,
            ),
            data=DataConfig(dataset="synthetic", batch_size=2),
        ).validate()
        ds = get_dataset_config(cfg.data)
        return cfg, EMSANet(cfg=cfg.model, dataset_config=ds), ds

    cfg_f, model_f, ds = build(True)
    cfg_u, model_u, _ = build(False)
    variables = init_model(model_f, jax.random.PRNGKey(0), train=True)

    rng = np.random.RandomState(0)
    inputs = {
        "rgb": jnp.asarray(rng.randn(2, 96, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(2, 96, 128, 1), jnp.float32),
    }
    batch = dict(
        inputs,
        semantic=jnp.asarray(
            rng.randint(0, 41, (2, 96, 128)), jnp.int32
        ),
        instance_center=jnp.asarray(
            rng.rand(2, 96, 128, 1), jnp.float32
        ),
        instance_center_mask=jnp.ones((2, 96, 128), bool),
        instance_offset=jnp.asarray(
            rng.randn(2, 96, 128, 2), jnp.float32
        ),
        instance_foreground=jnp.ones((2, 96, 128), bool),
        scene=jnp.asarray(rng.randint(1, 8, (2,)), jnp.int32),
    )

    def sem_loss(model, cfg):
        out, _ = model.apply(
            variables, inputs, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats", "fused_bn"],
        )
        losses = compute_losses(
            out, batch, cfg.model,
            semantic_side_downscales=(),
            instance_side_downscales=(),
        )
        return losses["semantic_total_loss"]

    lf = sem_loss(model_f, cfg_f)
    lu = sem_loss(model_u, cfg_u)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5, atol=1e-5)
