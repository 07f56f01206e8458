"""In-process A/B: space-to-depth stems in the TRAINING graph (b8 fused).

The rewrite is exact and differentiable; this measures whether the
packed 4x4 form also wins under autodiff (the strided-7x7 backward is a
transposed conv over the same pathological layouts).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/stem_train_ab.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from train_ab import build
from train_breakdown import synth_batch
from train_remat_ab import time_train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=25)
    args = ap.parse_args()
    n = args.batch
    print(f"device={jax.devices()[0].device_kind} b{n} 480x640 bf16",
          flush=True)

    import emsanet_tpu.models.backbone as bb

    batch = None
    for s2d_train in (False, True):
        bb.STEM_SPACE_TO_DEPTH_TRAIN = s2d_train
        cfg, model, variables = build(n, 480, 640, fused_training=True)
        if batch is None:
            batch = synth_batch(cfg, n)
        time_train(f"fused train step stem-s2d={s2d_train}", cfg, model,
                   variables, batch, args.runs)


if __name__ == "__main__":
    main()
