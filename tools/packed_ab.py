"""One-process A/B: packed dual-encoder vs per-stream encoder (e2e).

The packed path (models/packed_encoder.py) halves the encoder's kernel
launches; the b1 forward is dispatch-bound (CLAUDE.md: ~3 ms of
inter-kernel overhead across hundreds of launches), so the win should
show at small batch. Uses the measured-best head_decode_fusion per batch
size so the rest of the graph is the deployment configuration.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/packed_ab.py
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from decode_ab import build, probe, scalar  # same-dir import


def e2e_fn(batch_n, packed):
    from emsanet_tpu.config import best_head_decode_fusion
    from emsanet_tpu.postprocessing import postprocess

    cfg, model, variables, is_thing, rgb, depth = build(
        batch_n, best_head_decode_fusion(batch_n)
    )
    mcfg = dataclasses.replace(cfg.model, packed_dual_encoder=packed)
    from emsanet_tpu.models import EMSANet

    model = EMSANet(cfg=mcfg, dataset_config=model.dataset_config)
    p, s = variables["params"], variables.get("batch_stats")

    @jax.jit
    def run(p, s, r, d):
        out = model.apply(
            {"params": p, "batch_stats": s},
            {"rgb": r, "depth": d}, train=False,
        )
        return scalar(postprocess(out, is_thing, mcfg))

    return run, (p, s, rgb, depth)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 32])
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    for b in args.batches:
        for packed in (False, True):
            label = "packed  " if packed else "stream2x"
            run, xs = e2e_fn(b, packed)
            t = probe(run, *xs, runs=args.runs)
            print(f"e2e b{b:<3d} {label}  {t*1e3:8.2f} ms ({b/t:.1f} fps)",
                  flush=True)


if __name__ == "__main__":
    main()
