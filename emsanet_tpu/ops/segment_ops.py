"""TPU-friendly replacements for scatter/top-k heavy postprocessing ops.

- `exact_top_k`: two-stage exact top-k. `jax.lax.top_k` over the full
  flattened image (307k elements) is slow on TPU; chunking to per-chunk
  top-k then reducing the ~C*k candidates is exact (any global top-k
  element is in its chunk's top-k) and far faster.

- `segment_histogram` / `segment_sum_vectors`: one-hot-matmul segment
  reductions. `jnp.zeros(...).at[keys].add(v)` lowers to serialized
  scatters on TPU; expressing the reduction as
  one_hot(keys)^T @ values rides the MXU instead. Chunked with lax.scan
  (f32 accumulation) to bound the one-hot materialization to VMEM-sized
  tiles.

Used by postprocessing.find_instance_centers / panoptic_merge /
aggregate_instance_orientations.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def small_table_lookup(indices: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[indices] without a gather: compare + weighted sum.

    On the tunneled v5e backend a plain `table[indices]` gather over
    ~10M indices measured 76.5 ms; the compare-based form runs at 0.5 ms.
    Intended for small tables (C <= ~128); output dtype = table dtype.
    """
    c = table.shape[0]
    iota = jnp.arange(c, dtype=indices.dtype)
    onehot = indices[..., None] == iota
    if table.dtype == jnp.bool_:
        return jnp.any(onehot & table, axis=-1)
    return jnp.sum(
        onehot.astype(table.dtype) * table, axis=-1
    )


def exact_top_k(
    x: jnp.ndarray, k: int, chunk_size: int = 8192
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis of (N, P). Returns (values, indices).

    Stage 1: top-k within each chunk; stage 2: top-k over all per-chunk
    candidates; indices mapped back to the original axis.
    """
    n, p = x.shape
    if p <= max(chunk_size, 4 * k):
        return jax.lax.top_k(x, k)
    n_chunks = -(-p // chunk_size)
    p_pad = n_chunks * chunk_size
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p)),
                    constant_values=-jnp.inf)
    xc = x.reshape(n, n_chunks, chunk_size)
    vals1, idx1 = jax.lax.top_k(xc, min(k, chunk_size))  # (N, C, k)
    base = (
        jnp.arange(n_chunks, dtype=idx1.dtype)[None, :, None] * chunk_size
    )
    flat_idx1 = (idx1 + base).reshape(n, -1)  # (N, C*k)
    vals1 = vals1.reshape(n, -1)
    vals2, idx2 = jax.lax.top_k(vals1, k)  # (N, k)
    indices = jnp.take_along_axis(flat_idx1, idx2, axis=1)
    return vals2, indices


def segment_histogram(
    keys: jnp.ndarray,
    weights: jnp.ndarray,
    num_segments: int,
    chunk_size: int = 16384,
) -> jnp.ndarray:
    """Weighted histogram over (N, P) int keys -> (N, num_segments) f32.

    Equivalent to zeros.at[keys].add(weights) per row, computed as chunked
    one-hot matmuls (MXU) with f32 accumulation.
    """
    n, p = keys.shape
    n_chunks = -(-p // chunk_size)
    p_pad = n_chunks * chunk_size
    if p_pad != p:
        keys = jnp.pad(keys, ((0, 0), (0, p_pad - p)),
                       constant_values=num_segments)  # out-of-range -> 0 wt
        weights = jnp.pad(weights, ((0, 0), (0, p_pad - p)))
    kc = keys.reshape(n, n_chunks, chunk_size)
    wc = weights.astype(jnp.float32).reshape(n, n_chunks, chunk_size)

    def body(acc, args):
        kk, ww = args  # (N, chunk), (N, chunk)
        onehot = jax.nn.one_hot(kk, num_segments, dtype=jnp.float32)
        acc = acc + jnp.einsum(
            "nc,ncs->ns", ww, onehot, preferred_element_type=jnp.float32
        )
        return acc, None

    init = jnp.zeros((n, num_segments), jnp.float32)
    acc, _ = jax.lax.scan(
        body, init, (jnp.swapaxes(kc, 0, 1), jnp.swapaxes(wc, 0, 1))
    )
    return acc


def segment_histogram_factored(
    keys_a: jnp.ndarray,
    keys_b: jnp.ndarray,
    weights: jnp.ndarray,
    num_a: int,
    num_b: int,
    chunk_size: int = 8192,
) -> jnp.ndarray:
    """2-D histogram over key pairs: (N, P) x (N, P) -> (N, A, B) f32.

    Equivalent to segment_histogram over combined keys a*B+b but factored:
    hist = one_hot(a)^T @ (w * one_hot(b)) per chunk — the one-hots stay
    (chunk, A) and (chunk, B) instead of (chunk, A*B). With A=65, B=41
    that is a ~40x memory-traffic reduction. One-hots are exact in bf16;
    accumulation is f32 on the MXU.
    """
    n, p = keys_a.shape
    n_chunks = -(-p // chunk_size)
    p_pad = n_chunks * chunk_size
    if p_pad != p:
        keys_a = jnp.pad(keys_a, ((0, 0), (0, p_pad - p)),
                         constant_values=num_a)
        keys_b = jnp.pad(keys_b, ((0, 0), (0, p_pad - p)),
                         constant_values=num_b)
        weights = jnp.pad(weights, ((0, 0), (0, p_pad - p)))
    ka = keys_a.reshape(n, n_chunks, chunk_size)
    kb = keys_b.reshape(n, n_chunks, chunk_size)
    wc = weights.reshape(n, n_chunks, chunk_size)

    def body(acc, args):
        a, b, w = args
        oh_a = jax.nn.one_hot(a, num_a, dtype=jnp.bfloat16)
        oh_b = jax.nn.one_hot(b, num_b, dtype=jnp.bfloat16)
        oh_b = oh_b * w[..., None].astype(jnp.bfloat16)
        acc = acc + jnp.einsum(
            "npa,npb->nab", oh_a, oh_b,
            preferred_element_type=jnp.float32,
        )
        return acc, None

    init = jnp.zeros((n, num_a, num_b), jnp.float32)
    acc, _ = jax.lax.scan(
        body, init,
        (jnp.swapaxes(ka, 0, 1), jnp.swapaxes(kb, 0, 1),
         jnp.swapaxes(wc, 0, 1)),
    )
    return acc


def segment_gather(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    chunk_size: int = 16384,
) -> jnp.ndarray:
    """Per-row table lookup values[n, keys[n, p]] -> (N, P) f32.

    Batched `take_along_axis` with large index counts lowers to a slow
    loop-gather on TPU (~150 ms for 32x307k indices from a 65-entry
    table); a chunked one-hot matmul rides the MXU instead. Exact for
    values representable in f32.
    """
    n, p = keys.shape
    s = values.shape[1]
    n_chunks = -(-p // chunk_size)
    p_pad = n_chunks * chunk_size
    if p_pad != p:
        keys = jnp.pad(keys, ((0, 0), (0, p_pad - p)))
    kc = keys.reshape(n, n_chunks, chunk_size)
    vals = values.astype(jnp.float32)

    def body(_, kk):
        onehot = jax.nn.one_hot(kk, s, dtype=jnp.float32)
        out = jnp.einsum(
            "nps,ns->np", onehot, vals,
            preferred_element_type=jnp.float32,
        )
        return None, out

    _, out = jax.lax.scan(body, None, jnp.swapaxes(kc, 0, 1))
    out = jnp.moveaxis(out, 0, 1).reshape(n, p_pad)
    return out[:, :p]


def segment_sum_vectors(
    keys: jnp.ndarray,
    vectors: jnp.ndarray,
    num_segments: int,
    chunk_size: int = 16384,
) -> jnp.ndarray:
    """Per-segment vector sums: (N, P) keys + (N, P, D) -> (N, S, D) f32."""
    n, p = keys.shape
    d = vectors.shape[-1]
    n_chunks = -(-p // chunk_size)
    p_pad = n_chunks * chunk_size
    if p_pad != p:
        keys = jnp.pad(keys, ((0, 0), (0, p_pad - p)),
                       constant_values=num_segments)
        vectors = jnp.pad(vectors, ((0, 0), (0, p_pad - p), (0, 0)))
    kc = keys.reshape(n, n_chunks, chunk_size)
    vc = vectors.astype(jnp.float32).reshape(n, n_chunks, chunk_size, d)

    def body(acc, args):
        kk, vv = args  # (N, chunk), (N, chunk, D)
        onehot = jax.nn.one_hot(kk, num_segments, dtype=jnp.float32)
        acc = acc + jnp.einsum(
            "ncs,ncd->nsd", onehot, vv, preferred_element_type=jnp.float32
        )
        return acc, None

    init = jnp.zeros((n, num_segments, d), jnp.float32)
    acc, _ = jax.lax.scan(
        body, init, (jnp.swapaxes(kc, 0, 1), jnp.swapaxes(vc, 0, 1))
    )
    return acc
