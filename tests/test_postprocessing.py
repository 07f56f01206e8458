"""Postprocessing unit tests: NMS/top-k/grouping/panoptic merge semantics.

Verifies the on-device fixed-shape reformulation against hand-constructed
cases and numpy brute-force references (the reference locks these
behaviors via tests/test_metrics_with_model.py + CPU merge; SURVEY.md M6,
M13).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.postprocessing import (
    LABEL_DIVISOR,
    aggregate_instance_orientations,
    find_instance_centers,
    group_pixels_to_instances,
    panoptic_merge,
    postprocess_instance,
    postprocess_scene,
    postprocess_semantic,
)


def test_semantic_postprocess():
    logits = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 8, 5), jnp.float32
    )
    out = postprocess_semantic(logits)
    assert out["segmentation_idx"].shape == (2, 8, 8)
    assert out["score"].shape == (2, 8, 8)
    np.testing.assert_array_equal(
        np.asarray(out["segmentation_idx"]), np.argmax(np.asarray(logits), -1)
    )
    assert float(out["score"].min()) > 0.2 / 5  # softmax max >= 1/C


def test_find_centers_two_peaks():
    hm = np.zeros((1, 32, 32), np.float32)
    hm[0, 8, 8] = 0.9
    hm[0, 24, 20] = 0.7
    # small bump that should be NMS-suppressed (within kernel of peak 1)
    hm[0, 9, 9] = 0.5
    out = find_instance_centers(
        jnp.asarray(hm), threshold=0.1, nms_kernel_size=7, top_k=4
    )
    valid = np.asarray(out["valid"][0])
    yx = np.asarray(out["yx"][0])
    scores = np.asarray(out["scores"][0])
    assert valid.sum() == 2
    assert (yx[0] == [8, 8]).all() and scores[0] == pytest.approx(0.9)
    assert (yx[1] == [24, 20]).all() and scores[1] == pytest.approx(0.7)


def test_find_centers_tied_plateau_collapses_to_one():
    """bf16 tie-break lock (round-5): maxpool-equality NMS keeps every
    pixel of an equal-valued plateau, and a bf16-quantized bump can
    plateau for dozens of px — one overfit instance shattered into 49
    tied "centers" (CLAUDE.md round-5 notes). The post-top-k duplicate
    suppression must collapse a plateau (even wider than the NMS
    kernel) to ONE center while leaving distinct peaks alone.
    """
    hm = np.zeros((1, 64, 64), np.float32)
    hm[0, 10:31, 8:25] = 0.5  # 21x17 flat plateau, wider than kernel 7
    hm[0, 50, 50] = 0.9  # distinct peak far away
    out = find_instance_centers(
        jnp.asarray(hm), threshold=0.1, nms_kernel_size=7, top_k=64
    )
    valid = np.asarray(out["valid"][0])
    yx = np.asarray(out["yx"][0])
    assert valid.sum() == 2, (valid.sum(), yx[valid])
    kept = yx[valid]
    assert ([50, 50] == kept).all(axis=-1).any()
    in_plateau = [
        (10 <= y <= 30 and 8 <= x <= 24) for y, x in kept.tolist()
    ]
    assert sum(in_plateau) == 1, kept


def test_grouping_assigns_nearest_voted_center():
    h = w = 16
    centers = jnp.asarray([[[4, 4], [12, 12], [0, 0], [0, 0]]], jnp.float32)
    valid = jnp.asarray([[True, True, False, False]])
    # offsets: zero => pixels vote for their own location => nearest center
    offset = jnp.zeros((1, h, w, 2), jnp.float32)
    fg = jnp.ones((1, h, w), bool)
    seg = group_pixels_to_instances(
        centers, valid, offset, fg, normalized_offset=False
    )
    seg = np.asarray(seg[0])
    assert seg[4, 4] == 1
    assert seg[12, 12] == 2
    assert seg[0, 0] == 1  # closer to (4,4)
    assert seg[15, 15] == 2
    # every foreground pixel assigned
    assert (seg > 0).all()


def test_grouping_respects_foreground_and_distance_threshold():
    h = w = 16
    centers = jnp.asarray([[[4, 4], [0, 0], [0, 0], [0, 0]]], jnp.float32)
    valid = jnp.asarray([[True, False, False, False]])
    offset = jnp.zeros((1, h, w, 2), jnp.float32)
    fg = np.zeros((1, h, w), bool)
    fg[0, :8, :8] = True
    seg = group_pixels_to_instances(
        jnp.asarray(centers), valid, offset, jnp.asarray(fg),
        normalized_offset=False, offset_distance_threshold=3.0,
    )
    seg = np.asarray(seg[0])
    assert seg[4, 4] == 1
    assert seg[4, 6] == 1  # distance 2 <= 3
    assert seg[0, 0] == 0  # distance > 3 -> unassigned (id 0)
    assert seg[10, 10] == 0  # background


def test_normalized_offsets_scale_by_image_size():
    h, w = 8, 16
    centers = jnp.asarray([[[4, 8]]], jnp.float32)
    valid = jnp.asarray([[True]])
    # every pixel points exactly at the center via normalized offsets
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    off = np.stack([(4 - ys) / h, (8 - xs) / w], axis=-1)[None]
    fg = jnp.ones((1, h, w), bool)
    seg = group_pixels_to_instances(
        centers, valid, jnp.asarray(off), fg, normalized_offset=True
    )
    assert (np.asarray(seg) == 1).all()


def _brute_force_merge(sem, inst, is_thing, divisor=LABEL_DIVISOR):
    """Numpy reference of the deeplab merge (majority vote semantics)."""
    out = np.zeros_like(sem)
    thing = is_thing[sem]
    # majority vote per instance over thing pixels
    for iid in np.unique(inst):
        if iid == 0:
            continue
        mask = (inst == iid) & thing
        if not mask.any():
            continue
        classes, counts = np.unique(sem[mask], return_counts=True)
        cls = classes[np.argmax(counts)]
        out[(inst == iid) & thing] = cls * divisor + iid
    out[~thing] = (sem * divisor)[~thing]
    # thing pixels without instance -> void (0)
    out[thing & (inst == 0)] = 0
    return out


def test_panoptic_merge_matches_bruteforce():
    rng = np.random.RandomState(1)
    n_classes = 6
    is_thing = np.array([False, False, True, True, True, False])
    sem = rng.randint(0, n_classes, size=(2, 24, 24)).astype(np.int32)
    inst = np.zeros_like(sem)
    inst[:, 4:12, 4:12] = 1
    inst[:, 14:20, 10:22] = 2
    k = 4
    scores = np.zeros((2, k), np.float32)
    scores[:, :2] = [0.9, 0.8]
    valid = scores > 0

    out = panoptic_merge(
        jnp.asarray(sem),
        jnp.ones((2, 24, 24), jnp.float32),
        jnp.asarray(inst),
        jnp.asarray(scores),
        jnp.asarray(valid),
        jnp.asarray(is_thing),
        n_classes=n_classes,
    )
    got = np.asarray(out["panoptic"])
    want = np.stack(
        [_brute_force_merge(sem[i], inst[i], is_thing) for i in range(2)]
    )
    np.testing.assert_array_equal(got, want)

    # meta: instance 1 area == number of its thing pixels
    area = np.asarray(out["instance_meta_area"])
    for b in range(2):
        m1 = (inst[b] == 1) & is_thing[sem[b]]
        assert area[b, 0] == m1.sum()


def test_panoptic_merge_is_jittable():
    is_thing = jnp.asarray([False, True, True])
    sem = jnp.ones((1, 16, 16), jnp.int32)
    inst = jnp.zeros((1, 16, 16), jnp.int32)
    fn = jax.jit(
        lambda s, i: panoptic_merge(
            s, jnp.ones_like(s, jnp.float32), i,
            jnp.zeros((1, 4), jnp.float32), jnp.zeros((1, 4), bool),
            is_thing, n_classes=3,
        )["panoptic"]
    )
    out = fn(sem, inst)
    # thing pixels without instance -> void
    assert (np.asarray(out) == 0).all()


def test_orientation_aggregation():
    h = w = 8
    inst = np.zeros((1, h, w), np.int32)
    inst[0, :4] = 1
    inst[0, 4:] = 2
    angle1, angle2 = 0.5, 2.5
    orient = np.zeros((1, h, w, 2), np.float32)
    orient[0, :4] = [np.sin(angle1), np.cos(angle1)]
    orient[0, 4:] = [np.sin(angle2), np.cos(angle2)]
    out = aggregate_instance_orientations(
        jnp.asarray(orient), jnp.asarray(inst), top_k=4
    )
    angles = np.asarray(out["instance_orientations"][0])
    assert angles[0] == pytest.approx(angle1, abs=1e-5)
    assert angles[1] == pytest.approx(angle2, abs=1e-5)


def test_scene_postprocess():
    logits = jnp.asarray([[1.0, 3.0, 2.0]])
    out = postprocess_scene(logits)
    assert int(out["class_idx"][0]) == 1
    assert float(out["class_score"][0]) == pytest.approx(
        float(jax.nn.softmax(logits)[0, 1])
    )
