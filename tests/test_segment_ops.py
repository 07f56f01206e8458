"""TPU segment-op replacements vs scatter/top_k references."""

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.ops.segment_ops import (
    exact_top_k,
    segment_histogram,
    segment_sum_vectors,
)


def test_exact_top_k_matches_lax():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 50000), jnp.float32)
    v, i = exact_top_k(x, 64, chunk_size=4096)
    v_ref, i_ref = jax.lax.top_k(x, 64)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))
    # values gathered at returned indices must equal returned values
    gathered = np.take_along_axis(np.asarray(x), np.asarray(i), axis=1)
    np.testing.assert_allclose(gathered, np.asarray(v))


def test_exact_top_k_small_input_passthrough():
    x = jnp.asarray([[3.0, 1.0, 2.0]])
    v, i = exact_top_k(x, 2)
    np.testing.assert_allclose(np.asarray(v), [[3.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(i), [[0, 2]])


def test_exact_top_k_with_padding_edge():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5000), jnp.float32)  # not chunk multiple
    v, i = exact_top_k(x, 16, chunk_size=1024)
    v_ref, _ = jax.lax.top_k(x, 16)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))


def test_segment_histogram_matches_scatter():
    rng = np.random.RandomState(2)
    keys = jnp.asarray(rng.randint(0, 100, (2, 7000)), jnp.int32)
    w = jnp.asarray(rng.rand(2, 7000), jnp.float32)
    got = np.asarray(segment_histogram(keys, w, 100, chunk_size=2048))
    want = np.zeros((2, 100), np.float32)
    for b in range(2):
        np.add.at(want[b], np.asarray(keys[b]), np.asarray(w[b]))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_segment_sum_vectors_matches_scatter():
    rng = np.random.RandomState(3)
    keys = jnp.asarray(rng.randint(0, 65, (2, 5000)), jnp.int32)
    v = jnp.asarray(rng.randn(2, 5000, 2), jnp.float32)
    got = np.asarray(segment_sum_vectors(keys, v, 65, chunk_size=2048))
    want = np.zeros((2, 65, 2), np.float32)
    for b in range(2):
        np.add.at(want[b], np.asarray(keys[b]), np.asarray(v[b]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_segment_histogram_factored_matches_combined():
    rng = np.random.RandomState(4)
    A, B = 65, 41
    ka = jnp.asarray(rng.randint(0, A, (2, 7000)), jnp.int32)
    kb = jnp.asarray(rng.randint(0, B, (2, 7000)), jnp.int32)
    w = jnp.asarray((rng.rand(2, 7000) > 0.5).astype(np.float32))
    from emsanet_tpu.ops.segment_ops import segment_histogram_factored

    got = np.asarray(
        segment_histogram_factored(ka, kb, w, A, B, chunk_size=2048)
    )
    want = np.asarray(
        segment_histogram(ka * B + kb, w, A * B, chunk_size=2048)
    ).reshape(2, A, B)
    np.testing.assert_allclose(got, want)


def test_segment_gather_matches_take_along_axis():
    rng = np.random.RandomState(5)
    keys = jnp.asarray(rng.randint(0, 65, (3, 5000)), jnp.int32)
    values = jnp.asarray(rng.randn(3, 65), jnp.float32)
    from emsanet_tpu.ops.segment_ops import segment_gather

    got = np.asarray(segment_gather(keys, values, chunk_size=2048))
    want = np.take_along_axis(np.asarray(values), np.asarray(keys), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_small_table_lookup_matches_gather():
    from emsanet_tpu.ops.segment_ops import small_table_lookup

    idx = jnp.asarray([[0, 3, 2], [1, 1, 0]], jnp.int32)
    table_f = jnp.asarray([10.0, 20.0, 30.0, 40.0])
    got = np.asarray(small_table_lookup(idx, table_f))
    np.testing.assert_array_equal(got, np.asarray(table_f)[np.asarray(idx)])

    table_b = jnp.asarray([False, True, False, True])
    got_b = np.asarray(small_table_lookup(idx, table_b))
    np.testing.assert_array_equal(got_b, np.asarray(table_b)[np.asarray(idx)])
