"""One-process A/B: clamped-DMA vs padded-input inference chain kernels.

The inference NBt1D chain kernel (ops/nbt1d_chain.py) can fetch its
halo'd row windows with clamped in-bounds DMAs straight off the unpadded
feature map, skipping the jnp.pad HBM round trip (one full read+write of
the map per chain call) — the same trick ops/nbt1d_train.py measured at
~3 ms/step on the training side. FORCE_PADDED=True forces the old path.

FORCE_PADDED is read at trace time, so nbt1d_chain's jit cache is
cleared between variants; each e2e program is also a fresh outer jit.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/chain_clamped_ab.py
"""

from __future__ import annotations

import argparse

import jax

from decode_ab import build, probe, scalar  # same-dir import


def e2e_fn(batch_n, decode_fusion="decode"):
    from emsanet_tpu.postprocessing import postprocess

    cfg, model, variables, is_thing, rgb, depth = build(batch_n, decode_fusion)
    p, s = variables["params"], variables.get("batch_stats")

    @jax.jit
    def run(p, s, r, d):
        out = model.apply(
            {"params": p, "batch_stats": s},
            {"rgb": r, "depth": d}, train=False,
        )
        return scalar(postprocess(out, is_thing, cfg.model))

    return run, (p, s, rgb, depth)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 1])
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    from emsanet_tpu.ops import nbt1d_chain as nch

    for b in args.batches:
        for forced, label in ((True, "padded "), (False, "clamped")):
            nch.FORCE_PADDED = forced
            nch.nbt1d_chain.clear_cache()
            run, xs = e2e_fn(b)
            t = probe(run, *xs, runs=args.runs)
            print(f"e2e b{b:<3d} {label}  {t*1e3:8.2f} ms ({b/t:.1f} fps)",
                  flush=True)
        nch.FORCE_PADDED = False


if __name__ == "__main__":
    main()
