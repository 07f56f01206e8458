"""Sweep head_decode_fusion modes across batch sizes (one process).

Places the decode vs decode-planes crossover for the production mode
choice in bench.py / inference_time.py.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/mode_sweep.py \
      --batches 1 2 4 8 --modes decode decode-planes
"""

from __future__ import annotations

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--modes", nargs="*",
                    default=["decode", "decode-planes"])
    ap.add_argument("--runs", type=int, default=60)
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    import sys

    sys.path.insert(0, "tools")
    from r3_perf_probe import build, probe, scalar

    from emsanet_tpu.postprocessing import postprocess

    for b in args.batches:
        for mode in args.modes:
            cfg, model, var, is_thing, rgb, depth = build(
                b, decode_fusion=mode
            )
            p, s = var["params"], var.get("batch_stats")

            @jax.jit
            def e2e(p, s, r, d):
                out = model.apply(
                    {"params": p, "batch_stats": s},
                    {"rgb": r, "depth": d}, train=False)
                return scalar(postprocess(out, is_thing, cfg.model))

            t = probe(e2e, p, s, rgb, depth, runs=args.runs)
            print(f"b{b:<3d} {mode:14s} e2e {t*1e3:8.2f} ms "
                  f"({b/t:7.1f} fps, {t/b*1e3:6.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
