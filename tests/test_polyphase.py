"""Polyphase learned-3x3-zeropad upsampling vs the naive conv path.

The fused inference path (`ops/polyphase_upsample.py`) must be exactly
the reference semantics: nearest x2 followed by a SAME-zero-padded
depthwise 3x3 (`nicr_mt_scene_analysis.model.upsampling`, used via
emsanet/args.py:289-298).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.models.decoder import PredictionUpsampling
from emsanet_tpu.models.upsampling import Upsampling
from emsanet_tpu.ops.polyphase_upsample import (
    polyphase_kernels,
    upsample2x_depthwise_polyphase,
    upsample2x_depthwise_shifted,
)


@pytest.mark.parametrize(
    "shape", [(2, 7, 9, 5), (1, 12, 16, 40), (3, 8, 8, 3), (1, 1, 1, 2)]
)
def test_polyphase_matches_conv_path(shape):
    rng = np.random.RandomState(sum(shape))
    n, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)
    variables = {"params": {"depthwise": {"kernel": kernel}}}
    ref = Upsampling("learned-3x3-zeropad").apply(variables, x)
    out = upsample2x_depthwise_polyphase(x, kernel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    out2 = upsample2x_depthwise_shifted(x, kernel)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)


def test_polyphase_kernel_layout():
    # parity kernels preserve the total mass per channel x4 (each input
    # pixel feeds exactly 4 output pixels under nearest x2)
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 1, 6), jnp.float32)
    kp = polyphase_kernels(k)
    assert kp.shape == (3, 3, 1, 24)
    np.testing.assert_allclose(
        float(kp.sum()), 4.0 * float(k.sum()), rtol=1e-5
    )


def test_fused_upsampling_module_matches_unfused():
    # 60x80 input crosses the polyphase size gate (upsampling.py)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 60, 80, 12), jnp.float32)
    mod = Upsampling("learned-3x3-zeropad")
    v = mod.init(jax.random.PRNGKey(0), x)
    # randomize away from the bilinear-mimic init
    v = {"params": {"depthwise": {"kernel": jnp.asarray(
        rng.randn(3, 3, 1, 12), jnp.float32)}}}
    ref = mod.apply(v, x)
    out = Upsampling("learned-3x3-zeropad", fused=True).apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_prediction_upsampling_matches_unfused():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 60, 80, 7), jnp.float32)
    mod = PredictionUpsampling()
    v = mod.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype), v
    )
    ref = mod.apply(v, x)
    out = PredictionUpsampling(fused=True).apply(v, x)
    assert out.shape == (1, 240, 320, 7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_init_param_tree_identical():
    x = jnp.zeros((1, 4, 4, 3), jnp.float32)
    v0 = PredictionUpsampling().init(jax.random.PRNGKey(0), x)
    v1 = PredictionUpsampling(fused=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deferred_interleave_semantic_decode_exact():
    """Deferred-interleave head + polyphase-domain semantic decode is
    bitwise-equivalent to interleave-then-decode (round-3 roadmap:
    removes the full-size depth-to-space copies of the C-channel head)."""
    from emsanet_tpu.postprocessing import (
        postprocess_semantic,
        postprocess_semantic_polyphase,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 60, 80, 40), jnp.float32)
    mod = PredictionUpsampling()
    v = mod.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype), v
    )
    full = PredictionUpsampling(fused=True).apply(v, x)
    assert full.shape == (2, 240, 320, 40)
    want = jax.device_get(postprocess_semantic(full))

    deferred = PredictionUpsampling(fused=True, defer_final=True).apply(v, x)
    assert deferred.shape == (2, 120, 160, 160)
    got = jax.device_get(postprocess_semantic_polyphase(deferred))

    np.testing.assert_array_equal(
        np.asarray(want["segmentation_idx"]),
        np.asarray(got["segmentation_idx"]),
    )
    np.testing.assert_allclose(
        np.asarray(want["score"]), np.asarray(got["score"]),
        rtol=1e-6, atol=1e-7,
    )


def test_deferred_interleave_depth_to_space_roundtrip():
    from emsanet_tpu.ops.polyphase_upsample import (
        depth_to_space,
        upsample2x_depthwise_polyphase,
        upsample2x_depthwise_polyphase_deferred,
    )

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, 5), jnp.float32)
    full = upsample2x_depthwise_polyphase(x, k)
    deferred = upsample2x_depthwise_polyphase_deferred(x, k)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(deferred)), np.asarray(full)
    )


def test_train_polyphase_matches_baseline_forward_and_grad():
    """train_polyphase=True must be the exact training graph: same
    forward values AND same gradients (wrt input and the depthwise
    kernel) as the nearest-x2 + conv path. The polyphase form is an
    algebraic refactoring (ops/polyphase_upsample.py docstring), so any
    drift here is a bug, not tolerance."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 60, 80, 12), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 1, 12), jnp.float32)
    cot = jnp.asarray(rng.randn(2, 120, 160, 12), jnp.float32)

    def run(mod):
        def loss(params, x):
            out = mod.apply({"params": params}, x, train=True)
            return (out * cot).sum(), out

        (val, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )({"depthwise": {"kernel": kernel}}, x)
        return out, grads

    ref_out, (ref_gk, ref_gx) = run(Upsampling("learned-3x3-zeropad"))
    out, (gk, gx) = run(
        Upsampling("learned-3x3-zeropad", train_polyphase=True)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gk["depthwise"]["kernel"]),
        np.asarray(ref_gk["depthwise"]["kernel"]), atol=1e-3, rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                               atol=1e-4, rtol=1e-5)


def test_train_polyphase_never_defers_interleave():
    """defer_interleave is an inference-decode contract; in train mode the
    polyphase path must still return the interleaved (N,2H,2W,C) map."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 60, 80, 4), jnp.float32)
    v = {"params": {"depthwise": {"kernel": jnp.asarray(
        rng.randn(3, 3, 1, 4), jnp.float32)}}}
    mod = Upsampling("learned-3x3-zeropad", train_polyphase=True,
                     defer_interleave=True)
    out = mod.apply(v, x, train=True)
    assert out.shape == (1, 120, 160, 4)
    ref = Upsampling("learned-3x3-zeropad").apply(v, x, train=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_deferred_head_falls_back_at_small_sizes():
    """At sizes below the polyphase threshold the semantic decoder still
    emits interleaved 'logits' (postprocess key contract unchanged)."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic",), input_height=96, input_width=128,
            rgb_encoder_backbone="resnet18",
            depth_encoder_backbone="resnet18",
            fused_inference=True,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0))
    out = model.apply(
        variables,
        {"rgb": jnp.zeros((1, 96, 128, 3)),
         "depth": jnp.zeros((1, 96, 128, 1))},
        train=False,
    )
    assert "logits" in out["semantic"]
    assert "logits_polyphase" not in out["semantic"]


def test_decode_fusion_mode_matches_interleave_mode():
    """head_decode_fusion='decode' (fused Pallas upsample+decode via
    postprocessing) must produce the same postprocess results as the
    'interleave' mode on the same weights (f32, CPU: exact idx, 1e-5
    score). 128x160 input puts the final x2 stage exactly at the
    polyphase gate (64*80 px >= 4800) so both deferred paths trigger."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.postprocessing import postprocess

    def build(mode):
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic",), input_height=128, input_width=160,
                rgb_encoder_backbone="resnet18",
                depth_encoder_backbone="resnet18",
                fused_inference=True,
                head_decode_fusion=mode,
            ),
            data=DataConfig(dataset="synthetic"),
        ).validate()
        ds = get_dataset_config(cfg.data)
        return cfg, EMSANet(cfg=cfg.model, dataset_config=ds), ds

    cfg_d, model_d, ds = build("decode")
    cfg_i, model_i, _ = build("interleave")
    variables = init_model(model_d, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.randn(1, 128, 160, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(1, 128, 160, 1), jnp.float32),
    }

    out_d = model_d.apply(variables, batch, train=False)
    out_i = model_i.apply(variables, batch, train=False)
    assert "decode_input" in out_d["semantic"], out_d["semantic"].keys()
    assert out_d["semantic"]["decode_input"]["x"].shape == (1, 64, 80, 40)
    assert "logits_polyphase" in out_i["semantic"]

    res_d = postprocess(out_d, is_thing, cfg_d.model)
    res_i = postprocess(out_i, is_thing, cfg_i.model)
    np.testing.assert_array_equal(
        np.asarray(res_d["semantic_segmentation_idx"]),
        np.asarray(res_i["semantic_segmentation_idx"]),
    )
    np.testing.assert_allclose(
        np.asarray(res_d["semantic_segmentation_score"]),
        np.asarray(res_i["semantic_segmentation_score"]),
        rtol=1e-5, atol=1e-6,
    )
