"""Input-pipeline throughput benchmark (samples/s, CPU only).

VERDICT r1 item 9: prove the Python-thread loader can feed multi-chip
training (58 img/s/chip at b8 -> an 8-chip v5e pod consumes ~464 img/s).
Measures the full train path: PNG decode from a prepared on-disk layout +
the complete train preprocessing chain (random resize/crop/flip/HSV,
instance/orientation/panoptic target generation, multiscale supervision
targets) + collate, with the C++ native hot paths active.

Usage:
  python tools/loader_bench.py [--n-samples 64] [--batch-size 8]
                               [--n-workers 8] [--epochs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--n-workers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--dataset-path", default=None,
                    help="existing prepared dataset (default: synthetic "
                    "written to a temp dir)")
    ap.add_argument("--no-pack", action="store_true",
                    help="bench the PNG-decode path instead of packed")
    ap.add_argument("--worker-mode", default="thread",
                    choices=("thread", "process"),
                    help="worker pool kind (process = forked workers; "
                    "note worker count is clamped to available cores)")
    ap.add_argument("--no-core-clamp", action="store_true",
                    help="allow more workers than cores (oversubscription "
                    "measurement)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.data import DataLoader
    from emsanet_tpu.datasets.disk import PreparedDataset
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.preprocessing import get_preprocessor

    tmp = None
    path = args.dataset_path
    if path is None:
        from tools.pack_dataset import pack_split
        from tools.prepare_dataset import prepare_synthetic

        tmp = tempfile.TemporaryDirectory()
        path = tmp.name
        prepare_synthetic(path, args.n_samples, 1, args.height, args.width)
        if not args.no_pack:
            pack_split(path, "train")

    sample_keys = ("identifier", "rgb", "depth", "semantic", "instance",
                   "orientations", "scene")
    ds = PreparedDataset(
        dataset_path=path, dataset_name="synthetic", split="train",
        sample_keys=sample_keys,
    )
    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=args.height, input_width=args.width,
        ),
        data=DataConfig(dataset="synthetic", batch_size=args.batch_size),
    ).validate()
    ds_config = get_dataset_config(cfg.data)
    ds.preprocessor = get_preprocessor(cfg, ds_config, phase="train")

    loader = DataLoader(
        ds, batch_size=args.batch_size, shuffle=True, drop_last=True,
        n_workers=args.n_workers, worker_mode=args.worker_mode,
    )
    if args.no_core_clamp:
        loader.n_workers = max(args.n_workers, 1)

    # warmup epoch (thread pool spin-up, native lib dlopen, caches)
    for _ in loader.batches(0):
        pass
    t0 = time.perf_counter()
    n_samples = 0
    for epoch in range(1, args.epochs + 1):
        for batch in loader.batches(epoch):
            n_samples += int(batch["_valid_mask"].sum())
    dt = time.perf_counter() - t0
    sps = n_samples / dt
    print(f"loader throughput: {sps:.1f} samples/s "
          f"({n_samples} samples in {dt:.2f}s, "
          f"n_workers={loader.n_workers} mode={loader.worker_mode}, "
          f"b{args.batch_size} {args.height}x{args.width})")
    # context: one v5e chip trains at ~58 img/s (PARITY.md); 8 chips need
    # ~464 img/s from the loader
    print(f"-> feeds {sps/58:.1f} v5e chips at the measured 58 img/s/chip")
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
