"""Probe which x2-interleave formulations Mosaic lowers on real TPU.

Round-5 finding: the `stack(axis=-1).reshape(h, 2w)` column weave that
passes interpret-mode tests fails real lowering ("infer-vector-layout:
unsupported shape cast" on vector<HxWx2> -> vector<Hx1x2W>). This probe
compiles each candidate standalone so the next kernel iteration is
evidence-based, and times the ones that lower.

Candidates (column weave of two (H, W) i32 tiles -> (H, 2W)):
  A stack-reshape   stack([a,b],-1).reshape(h,2w)      [expected FAIL]
  B transpose-row   T(stack([T(a),T(b)],1).reshape(2w,h))
  C rows-only       row weave stack([a,b],1).reshape(2h,w) [sanity: works?]

Usage: python tools/weave_lowering_probe.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 240, 384  # one map tile at 480x640 half-res scale


def _col_stack(a, b):
    h, w = a.shape
    return jnp.stack([a, b], axis=-1).reshape(h, 2 * w)


def _col_transpose(a, b):
    h, w = a.shape
    t = jnp.stack([a.T, b.T], axis=1).reshape(2 * w, h)
    return t.T


def _row(a, b):
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w)


def make(fn, out_shape):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[...] = fn(x_ref[...], y_ref[...])

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
        )(x, y)

    return run


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 1 << 30, (H, W)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 1 << 30, (H, W)), jnp.int32)
    ref_col = np.empty((H, 2 * W), np.int32)
    ref_col[:, 0::2] = np.asarray(x)
    ref_col[:, 1::2] = np.asarray(y)
    ref_row = np.empty((2 * H, W), np.int32)
    ref_row[0::2] = np.asarray(x)
    ref_row[1::2] = np.asarray(y)

    cases = [
        ("A col stack-reshape", _col_stack, (H, 2 * W), ref_col),
        ("B col transpose-row", _col_transpose, (H, 2 * W), ref_col),
        ("C row stack-reshape", _row, (2 * H, W), ref_row),
    ]
    for name, fn, oshape, ref in cases:
        try:
            out = np.asarray(make(fn, oshape)(x, y))
            ok = (out == ref).all()
            print(f"{name}: LOWERS, correct={bool(ok)}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name}: FAILS ({msg})", flush=True)

    # time the lowering winners at production scale via queue difference
    from emsanet_tpu.utils.timing import queue_difference_timing

    for name, fn, oshape, _ in cases:
        try:
            run = make(fn, oshape)
            r = run(x, y)
            jax.block_until_ready(r)
            t, _ = queue_difference_timing(
                lambda: jnp.sum(run(x, y)), n_long=200, n_short=50
            )
            print(f"{name}: {t * 1e6:.1f} us/tile", flush=True)
        except Exception:
            pass


if __name__ == "__main__":
    main()
