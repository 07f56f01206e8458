"""Parity-domain postprocessing == interleaved postprocessing.

The planes pipeline (_postprocess_planes) must produce the same results
as the legacy interleaved pipeline on the same weights: the per-pixel
math is identical, only the pixel order inside the order-agnostic
segment/grouping ops differs. f32 on CPU -> exact ids, 1e-5 scores.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.postprocessing import (
    _nms_keep_mask,
    _nms_keep_mask_planes,
    deinterleave_plane,
    interleave_plane,
    interleave_planes_np,
)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 9, 16, 17])
def test_nms_planes_matches_fullres(k):
    rng = np.random.RandomState(k)
    full = jnp.asarray(rng.rand(2, 24, 32), jnp.float32)
    keep_full = _nms_keep_mask(full, k)
    planes = deinterleave_plane(full).reshape(2, 2, 2, 12, 16)
    keep_planes = _nms_keep_mask_planes(planes, k).reshape(2, 4, 12, 16)
    np.testing.assert_array_equal(
        np.asarray(interleave_plane(keep_planes)), np.asarray(keep_full)
    )


def test_interleave_roundtrip():
    rng = np.random.RandomState(0)
    full = jnp.asarray(rng.randn(3, 8, 12), jnp.float32)
    planes = deinterleave_plane(full)
    np.testing.assert_array_equal(
        np.asarray(interleave_plane(planes)), np.asarray(full)
    )
    np.testing.assert_array_equal(
        interleave_planes_np(np.asarray(planes)), np.asarray(full)
    )


def _build(mode):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=128, input_width=160,
            rgb_encoder_backbone="resnet18",
            depth_encoder_backbone="resnet18",
            fused_inference=True,
            head_decode_fusion=mode,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    return cfg, EMSANet(cfg=cfg.model, dataset_config=ds), ds


def test_planes_pipeline_matches_interleaved():
    from emsanet_tpu.models import init_model
    from emsanet_tpu.postprocessing import postprocess

    cfg_d, model_d, ds = _build("decode-planes")
    cfg_i, model_i, _ = _build("interleave")
    variables = init_model(model_d, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.randn(2, 128, 160, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(2, 128, 160, 1), jnp.float32),
    }
    gt_fg = jnp.asarray(rng.rand(2, 128, 160) > 0.5)

    out_d = model_d.apply(variables, batch, train=False)
    out_i = model_i.apply(variables, batch, train=False)
    assert "decode_input" in out_d["semantic"]
    assert "decode_input" in out_d["instance"]

    res_d = postprocess(out_d, is_thing, cfg_d.model, gt_foreground=gt_fg)
    res_i = postprocess(out_i, is_thing, cfg_i.model, gt_foreground=gt_fg)

    exact_keys = [
        "semantic_segmentation_idx",
        "instance_segmentation",
        "instance_segmentation_gt_foreground",
        "instance_foreground",
        "panoptic_segmentation_deeplab",
        "panoptic_segmentation_deeplab_semantic_idx",
        "panoptic_foreground_mask",
        "panoptic_instance_meta_semantic_idx",
        "panoptic_instance_meta_area",
        "scene_class_idx",
    ]
    for key in exact_keys:
        np.testing.assert_array_equal(
            np.asarray(res_d[key]), np.asarray(res_i[key]), err_msg=key
        )
    close_keys = [
        "semantic_segmentation_score",
        "panoptic_segmentation_deeplab_panoptic_score",
        "orientations_instance",
        "scene_class_score",
    ]
    for key in close_keys:
        np.testing.assert_allclose(
            np.asarray(res_d[key]), np.asarray(res_i[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )

    # valid centers agree (invalid slots may order differently between
    # the two flat top-k orders — both masked)
    vd = np.asarray(res_d["instance_centers_valid"])
    vi = np.asarray(res_i["instance_centers_valid"])
    np.testing.assert_array_equal(vd, vi)
    np.testing.assert_array_equal(
        np.asarray(res_d["instance_centers_yx"])[vd],
        np.asarray(res_i["instance_centers_yx"])[vi],
    )
    np.testing.assert_allclose(
        np.asarray(res_d["instance_centers_score"])[vd],
        np.asarray(res_i["instance_centers_score"])[vi],
        rtol=1e-6, atol=1e-7,
    )

    # the head-plane outputs interleave to the legacy dense maps
    planes = np.asarray(res_d["instance_head_planes"])
    center = interleave_planes_np(planes[:, 0])
    np.testing.assert_allclose(
        center, np.asarray(res_i["instance_centers"])[..., 0],
        rtol=1e-5, atol=1e-6,
    )
    off_y = interleave_planes_np(planes[:, 1])
    np.testing.assert_allclose(
        off_y, np.asarray(res_i["instance_offsets"])[..., 0],
        rtol=1e-5, atol=1e-6,
    )
    ori = interleave_planes_np(np.asarray(
        res_d["instance_orientation_planes"]
    ))
    np.testing.assert_allclose(
        np.moveaxis(ori, 1, -1), np.asarray(res_i["instance_orientation"]),
        rtol=1e-5, atol=1e-6,
    )


def test_decode_both_matches_interleaved():
    """'decode-both': both head kernels + interleaved legacy postproc."""
    from emsanet_tpu.models import init_model
    from emsanet_tpu.postprocessing import postprocess

    cfg_b, model_b, ds = _build("decode-both")
    cfg_i, model_i, _ = _build("interleave")
    variables = init_model(model_b, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds.semantic_label_list.classes_is_thing)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.randn(2, 128, 160, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(2, 128, 160, 1), jnp.float32),
    }

    out_b = model_b.apply(variables, batch, train=False)
    out_i = model_i.apply(variables, batch, train=False)
    assert "decode_input" in out_b["semantic"]
    assert "decode_input" in out_b["instance"]

    res_b = postprocess(out_b, is_thing, cfg_b.model)
    res_i = postprocess(out_i, is_thing, cfg_i.model)

    exact_keys = [
        "semantic_segmentation_idx",
        "instance_segmentation",
        "instance_foreground",
        "panoptic_segmentation_deeplab",
        "panoptic_segmentation_deeplab_semantic_idx",
        "panoptic_foreground_mask",
        "panoptic_instance_meta_semantic_idx",
        "panoptic_instance_meta_area",
        "scene_class_idx",
    ]
    for key in exact_keys:
        np.testing.assert_array_equal(
            np.asarray(res_b[key]), np.asarray(res_i[key]), err_msg=key
        )
    close_keys = [
        "semantic_segmentation_score",
        "panoptic_segmentation_deeplab_panoptic_score",
        "orientations_instance",
        "instance_centers",
        "instance_offsets",
        "instance_orientation",
    ]
    for key in close_keys:
        np.testing.assert_allclose(
            np.asarray(res_b[key]), np.asarray(res_i[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


def test_interleave_planes_batched_exact():
    """The batched (stacked bitcast transpose) interleave matches the
    per-map `interleave_plane` bit-exactly for every dtype it packs
    (the _BATCHED_INTERLEAVE A/B knob's correctness lock)."""
    import numpy as np

    import emsanet_tpu.postprocessing as pp

    rng = np.random.RandomState(0)
    named = {
        "idx": jnp.asarray(rng.randint(0, 41, (2, 4, 6, 10)), jnp.int32),
        "score": jnp.asarray(rng.rand(2, 4, 6, 10), jnp.float32),
        "fg": jnp.asarray(rng.rand(2, 4, 6, 10) > 0.5),
    }
    ref = {k: pp.interleave_plane(v) for k, v in named.items()}
    old = pp._BATCHED_INTERLEAVE
    try:
        pp._BATCHED_INTERLEAVE = True
        got = pp.interleave_planes_batched(named)
    finally:
        pp._BATCHED_INTERLEAVE = old
    assert sorted(got) == sorted(ref)
    for k in ref:
        assert got[k].dtype == ref[k].dtype, k
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]))
