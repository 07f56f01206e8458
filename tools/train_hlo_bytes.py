"""Rank the train step's HBM traffic by HLO instruction.

Compiles the fused train step for the real TPU, walks the optimized
HLO text, and ranks instructions by the byte size of their outputs plus
(novel) operands — a traffic proxy good enough to find the big
consumers (VMEM reuse inside fusions is invisible here, so treat the
numbers as upper bounds per instruction and compare relatively).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/train_hlo_bytes.py
"""

from __future__ import annotations

import argparse
import collections
import re

import jax

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(text):
    """Sum byte sizes of all shapes in an HLO result-type string."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-fused", action="store_true",
                    help="analyze the baseline (unfused) train step")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    import tools.train_breakdown as tb
    import tools.train_ab as ta
    from emsanet_tpu.training.optim import get_optimizer
    from emsanet_tpu.training.step import create_train_state, make_train_step

    cfg, model, variables = ta.build(
        args.batch, 480, 640, fused_training=not args.no_fused
    )
    batch = tb.synth_batch(cfg, args.batch)
    state = create_train_state(model, variables, get_optimizer(cfg.train))
    step = jax.jit(make_train_step(model, cfg))
    dbatch = jax.device_put(batch)
    rng = jax.random.PRNGKey(1)

    compiled = step.lower(state, dbatch, rng).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"total: {ca.get('bytes accessed', 0)/1e9:.1f} GB, "
          f"{ca.get('flops', 0)/1e12:.2f} TFLOP", flush=True)

    text = compiled.as_text()
    print(f"HLO text: {len(text)/1e6:.1f} MB", flush=True)

    # only ENTRY-computation instructions touch HBM (fusion bodies run
    # in registers/VMEM); find the ENTRY block and parse only its lines
    by_inst = []
    by_source = collections.Counter()
    in_entry = False
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and stripped.startswith("}"):
            break
        if not in_entry:
            continue
        line = stripped
        m = re.match(r"%?([\w.\-]+) = (.+)", line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        opm = re.match(r"(\([^)]*\)|[^ ]+) ([a-z\-]+)\(", rest)
        if not opm:
            continue
        result_type, op = opm.group(1), opm.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        out_b = shape_bytes(result_type)
        if out_b < 1 << 20:
            continue
        src = ""
        sm = re.search(r'op_name="([^"]*)"', rest)
        if sm:
            src = sm.group(1)[-90:]
        by_inst.append((out_b, name, op, src))
        key = src.rsplit("/", 2)[-2:] if src else [op]
        by_source["/".join(key)] += out_b

    by_inst.sort(reverse=True)
    print(f"\ntop {args.top} instructions by OUTPUT bytes:")
    for out_b, name, op, src in by_inst[: args.top]:
        print(f"  {out_b/1e6:8.1f} MB  {op:12s} {name:28s} {src}")

    print(f"\ntop 30 source groups by summed output bytes:")
    for key, b in by_source.most_common(30):
        print(f"  {b/1e6:9.1f} MB  {key}")


if __name__ == "__main__":
    main()
