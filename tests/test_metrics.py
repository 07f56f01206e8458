"""Metric tests: mIoU / bAcc / MAAE / PQ against brute-force references.

The PQ test mirrors the role of the reference's
tests/test_metrics_with_model.py panopticapi lock (SURVEY.md M12): perfect
predictions give PQ=1, known perturbations give hand-computable values.
"""

import numpy as np
import pytest

from emsanet_tpu.metrics import (
    LABEL_DIVISOR,
    BalancedAccuracy,
    MeanAbsoluteAngularError,
    MeanIoU,
    PanopticQuality,
    deeplab_merge_numpy,
)


def test_miou_perfect_and_partial():
    m = MeanIoU(n_classes=4)
    target = np.array([[1, 1, 2, 2], [3, 3, 0, 0]])
    m.update(target, target)
    assert m.compute() == pytest.approx(1.0)

    m.reset()
    pred = target.copy()
    pred[0, 0] = 2  # one class-1 pixel misclassified as 2
    m.update(pred, target)
    # class1: tp=1 fn=1 -> iou 1/2; class2: tp=2 fp=1 -> 2/3; class3: 1.0
    assert m.compute() == pytest.approx((0.5 + 2 / 3 + 1.0) / 3)


def test_miou_void_ignored():
    m = MeanIoU(n_classes=3)
    target = np.array([0, 0, 1, 2])
    pred = np.array([1, 2, 1, 2])  # predictions on void don't matter
    m.update(pred, target)
    assert m.compute() == pytest.approx(1.0)


def test_balanced_accuracy():
    b = BalancedAccuracy(n_classes=4)
    target = np.array([1, 1, 1, 1, 2, 3])
    pred = np.array([1, 1, 0, 0, 2, 2])
    b.update(pred, target)
    # recalls: c1 2/4, c2 1/1, c3 0/1
    assert b.compute() == pytest.approx((0.5 + 1.0 + 0.0) / 3)


def test_maae_wraps_angles():
    m = MeanAbsoluteAngularError()
    m.update(np.array([0.1]), np.array([2 * np.pi - 0.1]))
    assert m.compute() == pytest.approx(np.degrees(0.2), rel=1e-6)


def _pan(sem, inst=None):
    sem = np.asarray(sem, np.int64)
    if inst is None:
        return sem * LABEL_DIVISOR
    return sem * LABEL_DIVISOR + np.asarray(inst, np.int64)


def test_pq_perfect():
    is_thing = [False, False, True]
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = _pan(1)  # stuff
    gt[8:, :8] = _pan(2, 1)  # thing instance 1
    gt[8:, 8:] = _pan(2, 2)  # thing instance 2
    pq = PanopticQuality(3, is_thing)
    pq.update(gt, gt)
    res = pq.compute()
    assert res["all_pq"] == pytest.approx(1.0)
    assert res["things_pq"] == pytest.approx(1.0)
    assert res["stuff_pq"] == pytest.approx(1.0)


def test_pq_iou_threshold_and_fp():
    is_thing = [False, True]
    gt = np.zeros((10, 10), np.int64)
    gt[:, :] = _pan(1, 1)
    # prediction covers only 60% -> IoU 0.6 > 0.5 => TP with SQ 0.6
    pred = np.zeros((10, 10), np.int64)
    pred[:6] = _pan(1, 1)
    pred[6:] = _pan(1, 2)  # second segment: IoU 0.4 -> FP
    pq = PanopticQuality(2, is_thing)
    pq.update(pred, gt)
    res = pq.compute()
    # class1: TP=1 (iou .6), FP=1 => RQ = 1/(1+0.5) = 2/3, SQ=0.6
    assert res["all_sq"] == pytest.approx(0.6)
    assert res["all_rq"] == pytest.approx(2 / 3)
    assert res["all_pq"] == pytest.approx(0.4)


def test_pq_void_pred_not_fp():
    """Predicted segments mostly overlapping GT void are not FPs."""
    is_thing = [False, True]
    gt = np.zeros((10, 10), np.int64)  # all void
    gt[9, 0:2] = _pan(1, 1)
    pred = np.zeros((10, 10), np.int64)
    pred[:5] = _pan(1, 5)  # 50 pixels, all on GT void -> ignored (no FP)
    pq = PanopticQuality(2, is_thing)
    pq.update(pred, gt)
    res = pq.compute()
    # GT instance unmatched -> FN=1, pred segment on void -> no FP
    assert pq.fp[1] == 0
    assert pq.fn[1] == 1
    assert res["all_rq"] == pytest.approx(0.0)


def test_gt_merge_numpy():
    is_thing = [False, False, True]
    sem = np.array([[1, 1], [2, 2]])
    inst = np.array([[0, 0], [5, 0]])
    out = deeplab_merge_numpy(sem, inst, is_thing)
    assert out[0, 0] == LABEL_DIVISOR
    assert out[1, 0] == 2 * LABEL_DIVISOR + 5
    assert out[1, 1] == 0  # thing without instance -> void
