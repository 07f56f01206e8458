"""Pallas segment-reduce kernels vs jnp references (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from emsanet_tpu.ops.segment_pallas import (
    segment_hist_and_sums,
    segment_lookup,
)


def test_hist_and_sums_match_scatter():
    rng = np.random.RandomState(0)
    n, p, k, c, d = 2, 5000, 65, 41, 2  # p not a tile multiple
    inst = jnp.asarray(rng.randint(0, k, (n, p)), jnp.int32)
    sem = jnp.asarray(rng.randint(0, c, (n, p)), jnp.int32)
    w = jnp.asarray((rng.rand(n, p) > 0.5).astype(np.float32))
    vec = jnp.asarray(rng.randn(n, p, d), jnp.float32)

    hist, sums = segment_hist_and_sums(
        inst, sem, w, vec, num_segments=k, num_classes=c, interpret=True
    )
    hist, sums = np.asarray(hist), np.asarray(sums)

    want_hist = np.zeros((n, k, c), np.float32)
    want_sums = np.zeros((n, k, d), np.float32)
    for b in range(n):
        np.add.at(want_hist[b], (np.asarray(inst[b]), np.asarray(sem[b])),
                  np.asarray(w[b]))
        np.add.at(want_sums[b], np.asarray(inst[b]), np.asarray(vec[b]))
    np.testing.assert_allclose(hist, want_hist, atol=1e-4)
    np.testing.assert_allclose(sums, want_sums, rtol=1e-4, atol=1e-4)


def test_lookup_matches_take():
    rng = np.random.RandomState(1)
    n, p, k, d = 2, 3000, 65, 2
    inst = jnp.asarray(rng.randint(0, k, (n, p)), jnp.int32)
    tables = jnp.asarray(rng.randn(n, d, k), jnp.float32)
    got = np.asarray(segment_lookup(inst, tables, interpret=True))
    want = np.stack([
        np.stack([np.asarray(tables[b, dd])[np.asarray(inst[b])]
                  for dd in range(d)])
        for b in range(n)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lookup_int_exact():
    inst = jnp.asarray([[0, 3, 64, 1]], jnp.int32)
    table = jnp.arange(65, dtype=jnp.float32)[None, None, :] * 65536.0
    got = np.asarray(segment_lookup(inst, table, interpret=True))
    np.testing.assert_array_equal(
        got[0, 0], np.array([0, 3, 64, 1]) * 65536.0
    )
