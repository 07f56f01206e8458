"""Checkpointing: atomic save/restore + best-metric tracking.

Reference semantics (SURVEY.md §5 'Checkpoint / resume'):
- best-metric checkpoints via CheckpointHelper watching configurable
  metrics, combinable with '+' (e.g. 'miou+bacc', args.py:1048-1058),
  greater-is-better for miou/acc/bacc/pq/rq/sq, less-is-better for
  mae/rmse (main.py:222-247);
- resume checkpoints written atomically (tmp + rename, main.py:688-709)
  carrying model params + batch stats + optimizer state + epoch + logs;
- error checkpoints on crash (handled by the driver in train.py).

Format: flax msgpack serialization (single file, host-agnostic); params
arrive/leave as numpy — no device transfer surprises on restore.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


_MAGIC = b"EMTP0001"


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    logs: Optional[Dict[str, Any]] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomic checkpoint write (tmp + rename, reference main.py:688-709).

    File layout: 8-byte magic | 8-byte JSON length | JSON metadata
    (epoch/logs/extra) | msgpack array payload (params/batch_stats/
    opt_state/step).
    """
    arrays = {
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": serialization.to_state_dict(
            jax.device_get(state.batch_stats)
        ),
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)
        ),
        "step": np.asarray(jax.device_get(state.step)),
    }
    blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, arrays)
    )
    meta = json.dumps(
        {"epoch": int(epoch), "logs": logs or {}, "extra": extra or {}},
        default=float,
    ).encode()

    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(_MAGIC)
            fh.write(len(meta).to_bytes(8, "little"))
            fh.write(meta)
            fh.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, state=None):
    """Restore a checkpoint; with a template `state`, returns
    (new_state, epoch, logs); without, returns the raw payload dict
    (arrays + 'epoch'/'logs'/'extra')."""
    with open(path, "rb") as fh:
        magic = fh.read(8)
        if magic != _MAGIC:
            raise ValueError(f"Not an EMSANet-TPU checkpoint: {path}")
        meta_len = int.from_bytes(fh.read(8), "little")
        meta = json.loads(fh.read(meta_len).decode())
        arrays = serialization.msgpack_restore(fh.read())
    if state is None:
        return {**arrays, **meta}
    new_state = state.replace(
        params=serialization.from_state_dict(state.params, arrays["params"]),
        batch_stats=serialization.from_state_dict(
            state.batch_stats, arrays["batch_stats"]
        ),
        opt_state=serialization.from_state_dict(
            state.opt_state, arrays["opt_state"]
        ),
        step=np.asarray(arrays["step"], np.int32),
    )
    return new_state, int(meta["epoch"]), meta.get("logs", {})


# metric direction registry (main.py:222-247)
_GREATER_IS_BETTER = ("miou", "acc", "bacc", "pq", "rq", "sq")
_LESS_IS_BETTER = ("mae", "rmse", "loss")


def _direction(metric: str) -> int:
    m = metric.lower()
    for suffix in _LESS_IS_BETTER:
        if suffix in m:
            return -1
    return 1


class CheckpointHelper:
    """Best-metric tracker (reference `CheckpointHelper`, SURVEY.md M14).

    metric_names: names appearing in the epoch logs dict; combined
    metrics via '+' sum their (direction-normalized) values.
    """

    def __init__(self, metric_names: Tuple[str, ...], debug: bool = False):
        self.metric_names = tuple(metric_names)
        self.best: Dict[str, float] = {}
        self.debug = debug

    @property
    def metric_mapping_joined(self) -> Dict[str, Tuple[str, ...]]:
        return {m: tuple(m.split("+")) for m in self.metric_names}

    def _value(self, metric: str, logs: Dict[str, float]) -> Optional[float]:
        parts = metric.split("+")
        total = 0.0
        for p in parts:
            if p not in logs:
                return None
            total += _direction(p) * float(logs[p])
        return total

    def check_for_checkpoint(
        self,
        logs: Dict[str, float],
        add_checkpoint_metrics_to_logs: bool = True,
    ) -> List[str]:
        """Returns metric names that improved this epoch."""
        improved = []
        for metric in self.metric_names:
            value = self._value(metric, logs)
            if value is None:
                continue
            if metric not in self.best or value > self.best[metric]:
                self.best[metric] = value
                improved.append(metric)
            if add_checkpoint_metrics_to_logs:
                logs[f"{metric}_best"] = self.best[metric]
        return improved
