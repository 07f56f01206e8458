"""Property-style lock of PanopticQuality against the panopticapi oracle.

Mirrors the reference's 9-decimal lock of its PQ metric against COCO
panopticapi (`emsanet/tests/test_metrics_with_model.py:209-237`);
panopticapi itself is not installed here, so `tests/pq_oracle.py` is an
independent literal re-implementation of the published algorithm.
"""

import numpy as np
import pytest

from emsanet_tpu.metrics import PanopticQuality
from tests.pq_oracle import oracle_pq

DIV = 2**16


def _random_panoptic_map(rng, h, w, n_categories, max_inst, p_void):
    """Blocky random panoptic map: overlapping rectangles of segments.

    Rectangles (not iid pixels) make near-0.5 IoUs and partial overlaps
    common, which is where matching/void rules actually bite.
    """
    seg = np.zeros((h, w), np.int64)  # start all void (id 0)
    for _ in range(rng.randint(4, 12)):
        y0, x0 = rng.randint(0, h - 1), rng.randint(0, w - 1)
        y1 = rng.randint(y0 + 1, h + 1)
        x1 = rng.randint(x0 + 1, w + 1)
        if rng.rand() < p_void:
            cat, inst = 0, 0  # void is always encoded as exactly id 0
        else:
            cat = rng.randint(1, n_categories)
            inst = rng.randint(0, max_inst)
        seg[y0:y1, x0:x1] = cat * DIV + inst
    return seg


@pytest.mark.parametrize(
    "n_categories,seed", [(5, 0), (16, 1), (41, 2), (5, 3), (41, 4)]
)
def test_pq_matches_oracle_randomized(n_categories, seed):
    rng = np.random.RandomState(seed)
    is_thing = rng.rand(n_categories) < 0.5
    is_thing[0] = False
    pq = PanopticQuality(n_categories, is_thing)

    preds, targets = [], []
    for _ in range(25):  # 5 param sets x 25 maps = 125 random maps
        t = _random_panoptic_map(rng, 24, 32, n_categories, 3, p_void=0.2)
        # prediction: perturbed copy of the target (shifted + re-id'd +
        # noise rectangles) so matches, near-misses, FPs and FNs all occur
        dy, dx = rng.randint(-4, 5), rng.randint(-4, 5)
        p = np.roll(t, (dy, dx), axis=(0, 1))
        p = np.where(
            rng.rand(*p.shape) < 0.05,
            _random_panoptic_map(rng, 24, 32, n_categories, 3, p_void=0.3),
            p,
        )
        preds.append(p)
        targets.append(t)
        pq.update(p, t)

    got = pq.compute()
    want = oracle_pq(preds, targets, n_categories, is_thing, DIV)
    for key in sorted(want):
        if key.endswith("_n"):
            assert got[key] == want[key], key
        else:
            assert got[key] == pytest.approx(want[key], abs=1e-9), (
                key, got[key], want[key],
            )


def test_pq_matches_oracle_batched_update():
    rng = np.random.RandomState(7)
    is_thing = [False, True, False, True]
    pq = PanopticQuality(4, is_thing)
    t = np.stack(
        [_random_panoptic_map(rng, 16, 16, 4, 2, 0.25) for _ in range(6)]
    )
    p = np.stack(
        [_random_panoptic_map(rng, 16, 16, 4, 2, 0.25) for _ in range(6)]
    )
    pq.update(p, t)  # (N, H, W) batched path
    got = pq.compute()
    want = oracle_pq(list(p), list(t), 4, is_thing, DIV)
    for key in sorted(want):
        assert got[key] == pytest.approx(want[key], abs=1e-9), key
