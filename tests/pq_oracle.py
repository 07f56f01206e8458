"""Brute-force panopticapi-semantics PQ oracle (test-only).

Independent re-implementation of the published COCO panoptic-quality
algorithm (panopticapi `evaluation.pq_compute_single_core` semantics; the
reference locks its PQ metric against panopticapi to 9 decimals in
`emsanet/tests/test_metrics_with_model.py:209-237` — panopticapi is not
installed in this environment, so this oracle stands in for it).

Deliberately written in the slowest, most literal style possible —
explicit per-segment masks and nested loops — so that it shares no
structure with `emsanet_tpu.metrics.PanopticQuality` (which uses
vectorized unique/bincount paths) and disagreements are meaningful.

Conventions (matching the repo's encoding):
  - panoptic id = category * label_divisor + instance_id
  - VOID pixels carry id == void_label * label_divisor (i.e. 0)
  - no crowd segments (the NICR datasets define none)
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def oracle_pq(
    preds: Sequence[np.ndarray],
    targets: Sequence[np.ndarray],
    num_categories: int,
    is_thing: Sequence[bool],
    label_divisor: int,
    void_label: int = 0,
) -> Dict[str, float]:
    void_id_class = void_label

    iou_sum = {c: 0.0 for c in range(num_categories)}
    tp = {c: 0 for c in range(num_categories)}
    fp = {c: 0 for c in range(num_categories)}
    fn = {c: 0 for c in range(num_categories)}

    for pred, target in zip(preds, targets):
        pred = np.asarray(pred).reshape(-1)
        target = np.asarray(target).reshape(-1)

        # segment inventories (lists of (id, mask)); void class excluded
        gt_segments = {}
        for gid in np.unique(target):
            if int(gid) // label_divisor == void_id_class:
                continue
            gt_segments[int(gid)] = target == gid
        pred_segments = {}
        for pid in np.unique(pred):
            if int(pid) // label_divisor == void_id_class:
                continue
            pred_segments[int(pid)] = pred == pid

        void_mask = (target // label_divisor) == void_id_class

        gt_matched = set()
        pred_matched = set()
        # match: same category, IoU > 0.5, union excludes pred-over-void
        for gid, gmask in gt_segments.items():
            for pid, pmask in pred_segments.items():
                if gid // label_divisor != pid // label_divisor:
                    continue
                intersection = int(np.sum(gmask & pmask))
                if intersection == 0:
                    continue
                pred_void = int(np.sum(pmask & void_mask))
                union = (
                    int(gmask.sum())
                    + int(pmask.sum())
                    - intersection
                    - pred_void
                )
                iou = intersection / union if union > 0 else 0.0
                if iou > 0.5:
                    cat = gid // label_divisor
                    tp[cat] += 1
                    iou_sum[cat] += iou
                    gt_matched.add(gid)
                    pred_matched.add(pid)

        for gid in gt_segments:
            if gid not in gt_matched:
                fn[gid // label_divisor] += 1

        for pid, pmask in pred_segments.items():
            if pid in pred_matched:
                continue
            # >50% overlap with void GT -> ignored, not a false positive
            if int(np.sum(pmask & void_mask)) > 0.5 * int(pmask.sum()):
                continue
            fp[pid // label_divisor] += 1

    results: Dict[str, float] = {}
    is_thing = list(is_thing)
    for name in ("all", "things", "stuff"):
        pqs, sqs, rqs, n = [], [], [], 0
        for c in range(num_categories):
            if c == void_label:
                continue
            if name == "things" and not is_thing[c]:
                continue
            if name == "stuff" and is_thing[c]:
                continue
            if tp[c] + fp[c] + fn[c] == 0:
                continue
            n += 1
            denom = tp[c] + 0.5 * fp[c] + 0.5 * fn[c]
            pqs.append(iou_sum[c] / denom)
            sqs.append(iou_sum[c] / tp[c] if tp[c] else 0.0)
            rqs.append(tp[c] / denom)
        results[f"{name}_pq"] = float(np.mean(pqs)) if n else 0.0
        results[f"{name}_sq"] = float(np.mean(sqs)) if n else 0.0
        results[f"{name}_rq"] = float(np.mean(rqs)) if n else 0.0
        results[f"{name}_n"] = n
    return results
