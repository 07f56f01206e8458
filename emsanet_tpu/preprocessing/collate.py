"""Batch collation.

Reference: `nicr_mt_scene_analysis.data.mt_collate` (SURVEY.md M8):
recursive dict collate that stacks arrays and keeps blacklisted types
(identifiers, orientation dicts, applied-preprocessing traces) as plain
lists. Output arrays are NHWC numpy, ready for `jax.device_put`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from emsanet_tpu.datasets.base import SampleIdentifier

# values of these kinds are collected into lists, not stacked
_LIST_KEYS_SUFFIX = ("identifier", "orientations", "orientations_present")


def _is_blacklisted(key: str, value: Any) -> bool:
    if isinstance(value, (SampleIdentifier, dict)) and not key.startswith(
        "_down_"
    ):
        return True
    if key.endswith(_LIST_KEYS_SUFFIX):
        return True
    if key == "_applied_preprocessing" or key == "_no_preprocessing":
        return True
    return False


def batch_collate(samples: Sequence[dict]) -> Dict[str, Any]:
    """Collate a list of sample dicts into a batch dict."""
    assert samples
    batch: Dict[str, Any] = {}
    keys = samples[0].keys()
    for key in keys:
        values = [s[key] for s in samples]
        first = values[0]
        if key.startswith("_down_") and isinstance(first, dict):
            batch[key] = batch_collate(values)
        elif _is_blacklisted(key, first):
            batch[key] = list(values)
        elif isinstance(first, np.ndarray):
            batch[key] = np.stack(values, axis=0)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(values)
        else:
            batch[key] = list(values)
    return batch


def infer_batch_size(batch: Dict[str, Any]) -> int:
    for v in batch.values():
        if isinstance(v, np.ndarray) and v.ndim > 0:
            return v.shape[0]
        if isinstance(v, list):
            return len(v)
    raise ValueError("Cannot infer batch size from empty batch")
