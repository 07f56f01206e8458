"""On-device postprocessing: semantic, instance, panoptic, scene.

TPU-native redesign of `nicr_mt_scene_analysis.model.postprocessing`
(SURVEY.md M6). The reference runs instance grouping + panoptic merging
on CPU with dynamic per-image instance counts and Python dict metadata
("panoptic merging is done on CPU", inference_dataset.py:486). Here the
whole chain is fixed-shape, batched, vectorized jnp inside one jit
program:

- center NMS: max-pool window trick (reduce_window) instead of the
  reference's torch max_pool2d NMS,
- top-k selection padded to `top_k` instances (dynamic counts become a
  validity mask),
- pixel-to-center grouping: the pairwise pixel/center distance is
  expanded so its cross term is a (H*W, 2) x (2, K) matmul on the MXU,
- panoptic merge (Panoptic-DeepLab semantics, utils.panoptic_merge
  deeplab_merge_batch, SURVEY.md M13): majority-vote semantics per
  instance via one-hot segment sums, panoptic_id = semantic *
  label_divisor + instance for things, stuff passthrough, void for
  unassigned thing pixels,
- per-instance meta (area, semantic_idx, panoptic_score) as fixed
  (top_k,) arrays instead of Python dicts.

Output key contract follows SURVEY.md §3.4.
"""

from __future__ import annotations


from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

LABEL_DIVISOR = 2**16  # reference label_divisor (SURVEY.md M13)
VOID_LABEL = 0

# trace-time A/B knob: batch every final-map parity interleave into one
# stacked transpose vs one relayout per map. MEASURED LOSING both ways
# on v5e (tools/interleave_ab.py, one process, decode-planes: b1 e2e
# 5.91 -> 6.90 ms (-17%), b32 71.5 -> 77.6 ms (-8.5%)) — the stack +
# M-channel transpose + per-map slices do NOT fuse and add copies,
# while XLA's per-map relayouts are already near their floor. Kept as
# a knob so the A/B stays reproducible.
_BATCHED_INTERLEAVE = False

# trace-time A/B knob for the 'decode'-mode instance-head final maps
# (tools/map_interleave_ab.py):
#   'per-channel' — C separate XLA relayouts (the round-3 baseline),
#   'batched'     — ONE all-channel transpose (planes are already
#                   stacked, so unlike _BATCHED_INTERLEAVE above there
#                   is no extra stack copy),
#   'kernel'      — the head kernel emits full-res interleaved maps
#                   (ops/instance_head.instance_head_upsample_interleaved).
# Round-5 whole-graph A/B (one process, v5e): with sem='kernel' too,
# e2e b1 6.41 -> 4.80 ms (+25.1%), b32 68.05 -> 67.09 (+1.4%); each
# knob alone is a wash, the win needs both heads interleaving in-kernel.
_INSTANCE_MAP_INTERLEAVE = "kernel"

# companion knob for the 'decode'-mode semantic idx/score maps:
#   'xla'    — kernel emits parity planes, XLA interleaves (baseline)
#   'kernel' — semantic_decode_fused_interleaved writes full-res directly
_SEMANTIC_MAP_INTERLEAVE = "kernel"

# decode-planes final maps: weave all f32/i32 maps in ONE Pallas launch
# (ops/plane_interleave.py) instead of one XLA relayout per map.
# Round-5 whole-graph A/B: e2e b1 3.81 -> 2.70 ms (+29.1%), b32 68.74
# -> 67.42 (+1.9%) — the per-map XLA relayouts were the dominant b1
# postprocessing cost (tools/b1_stage_probe.py: 0.515 ms of 1.30).
_PLANE_INTERLEAVE_PALLAS = True


# ---------------------------------------------------------------------------
# semantic


def postprocess_semantic(logits: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """softmax -> argmax + score (SURVEY.md M6 'Semantic').

    logits: (N, H, W, C) over classes *without* void; returned idx is
    0-based in the void-free label space (callers add 1 for the full
    label space, matching the reference's downstream usage).
    """
    # max softmax prob == exp(max - logsumexp): skips materializing the
    # (N, H, W, C) prob tensor (6.69 -> 2.32 ms at b32 480x640 C40 on
    # v5e, tools/pipeline_bench.py).
    # Reductions run on the NATIVE dtype: an upfront astype(f32) gets
    # fused INTO the producing polyphase conv by XLA, and the depth-to-
    # space transpose then copies the (N, H, W, C) head at f32 width —
    # 2x 1.57 GB of copies at b32 in the compiled e2e HLO. Casting per
    # element inside the reduction keeps the materialized head bf16.
    idx = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    mx = jnp.max(logits, axis=-1)
    sumexp = jnp.sum(
        jnp.exp((logits - mx[..., None]).astype(jnp.float32)), axis=-1
    )
    score = 1.0 / sumexp  # exp(mx - lse) with lse = mx + log(sumexp)
    return {"segmentation_idx": idx, "score": score}


def postprocess_semantic_polyphase(y4c: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Semantic decode in the deferred polyphase-upsample domain.

    y4c: (N, H/2, W/2, 4C) — the final head x2 stage WITHOUT its
    depth-to-space (ops/polyphase_upsample.py, layout c*4 + (p*2+q)).
    The per-pixel argmax/score reductions commute with the interleave,
    so they run at half resolution over C and only the tiny idx/score
    maps get interleaved — the full-size C-channel depth-to-space copies
    (2 per x2 stage in the compiled HLO) never materialize. Bitwise the
    same results as `postprocess_semantic(depth_to_space(y4c))`.
    """
    n, h2, w2, c4 = y4c.shape
    c = c4 // 4
    y = y4c.reshape(n, h2, w2, c, 2, 2)  # [..., class, p, q]
    idx = jnp.argmax(y, axis=3).astype(jnp.int32)  # (N, H/2, W/2, 2, 2)
    mx = jnp.max(y, axis=3)
    sumexp = jnp.sum(
        jnp.exp((y - mx[:, :, :, None]).astype(jnp.float32)), axis=3
    )
    score = 1.0 / sumexp

    def interleave(a):  # (N, H/2, W/2, 2, 2) -> (N, H, W)
        a = jnp.transpose(a, (0, 1, 3, 2, 4))
        return a.reshape(n, 2 * h2, 2 * w2)

    return {
        "segmentation_idx": interleave(idx),
        "score": interleave(score),
    }


# ---------------------------------------------------------------------------
# instance


def _nms_keep_mask(heatmap: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Keep local maxima: x == maxpool_k(x), SAME padding (M6 'Instance').

    The square max-pool is separable (max is associative): two 1-D
    reduce_windows measured 5.5x faster than the 2-D window at
    (32, 480, 640) on v5e (tools/postproc_breakdown.py).
    """
    pooled = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    pooled = jax.lax.reduce_window(
        pooled,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, kernel_size),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return heatmap >= pooled


def _pool1d(x: jnp.ndarray, lo: int, hi: int, axis: int) -> jnp.ndarray:
    """out[i] = max_{e in [lo, hi]} x[i+e], -inf outside the extent."""
    if hi < lo:
        return jnp.full_like(x, -jnp.inf)
    dims = [1] * x.ndim
    dims[axis] = hi - lo + 1
    pad = [(0, 0)] * x.ndim
    pad[axis] = (-lo, hi)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, tuple(dims), (1,) * x.ndim, tuple(pad)
    )


def _nms_keep_mask_planes(hm: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Parity-domain form of `_nms_keep_mask` (bitwise identical).

    hm: (N, 2, 2, H/2, W/2) parity planes [p][q] of the interleaved
    (N, H, W) heatmap (full-res pixel (2i+p, 2j+q) = hm[:, p, q, i, j]).
    reduce_window SAME padding gives the full-res window offsets
    [lo, hi] = [-(k-1)//2, k//2] (asymmetric for even k). It decomposes
    into a same-parity window (2e in [lo, hi]) and a cross-parity
    window that depends on the own parity p (cross rows 2(i+e')+(1-p),
    delta = 2e'+1-2p in [lo, hi]). Separable over rows then columns
    like the full-res path; bitwise identical for any kernel_size.
    """
    lo_f, hi_f = -((kernel_size - 1) // 2), kernel_size // 2
    # ceil(x/2) = (x+1)//2 with python floor division
    s_lo, s_hi = (lo_f + 1) // 2, hi_f // 2

    def bounds(par):
        return (lo_f + 2 * par) // 2, (hi_f - 1 + 2 * par) // 2

    rp = []
    for p in (0, 1):
        own = hm[:, p]  # (N, 2, H/2, W/2), rows axis 2
        other = hm[:, 1 - p]
        lo, hi = bounds(p)
        rp.append(jnp.maximum(
            _pool1d(own, s_lo, s_hi, axis=2),
            _pool1d(other, lo, hi, axis=2),
        ))
    rp = jnp.stack(rp, axis=1)  # (N, 2, 2, H/2, W/2)

    cp = []
    for q in (0, 1):
        own = rp[:, :, q]  # (N, 2, H/2, W/2), cols axis 3
        other = rp[:, :, 1 - q]
        lo, hi = bounds(q)
        cp.append(jnp.maximum(
            _pool1d(own, s_lo, s_hi, axis=3),
            _pool1d(other, lo, hi, axis=3),
        ))
    pooled = jnp.stack(cp, axis=2)  # (N, 2, 2, H/2, W/2)
    return hm >= pooled


def _suppress_duplicate_centers(
    yx: jnp.ndarray,
    valid: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Drop tied-plateau duplicate centers after top-k (bf16 tie-break).

    The maxpool-equality NMS (`x >= maxpool_k(x)`) keeps EVERY pixel of
    an equal-valued plateau. In f32 (the reference's torch pipeline,
    nicr_mt_scene_analysis M6) exact ties essentially never happen; in
    this bf16 inference pipeline a smooth learned bump quantizes to a
    flat plateau (ulp ~2^-9 near 0.5), and a single instance can emit
    dozens of tied centers a few px apart which shatter it into
    sub-IoU-0.5 fragments (measured: 49 and 55 "instances" on two
    overfit images, instance RQ 0.29 vs 0.90 panoptic).

    Two NON-tied kept centers can never lie within the maxpool radius of
    each other (each would have suppressed the other), so removing any
    center with a higher-ranked candidate within Chebyshev `radius` is
    exactly a tie-break: a no-op on tie-free inputs. top_k sorts scores
    descending (ties by flat index), so rank order == priority order.
    Chained suppression (relative to ANY earlier candidate, kept or
    dropped) deliberately collapses plateaus wider than `radius` into
    one center; chains cannot bridge distinct bumps because the dip
    between them never enters the top-k list.
    """
    y = yx[..., 0]
    x = yx[..., 1]
    close = (
        (jnp.abs(y[:, :, None] - y[:, None, :]) <= radius)
        & (jnp.abs(x[:, :, None] - x[:, None, :]) <= radius)
    )  # (N, K, K): [n, j, i] -> candidate j near candidate i
    k = yx.shape[1]
    earlier = jnp.tril(jnp.ones((k, k), bool), -1)  # i < j (higher rank)
    dup = jnp.any(close & earlier[None] & valid[:, None, :], axis=-1)
    return valid & ~dup


def find_instance_centers_planes(
    heatmap_planes: jnp.ndarray,
    threshold: float = 0.1,
    nms_kernel_size: int = 17,
    top_k: int = 64,
    foreground_planes: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """`find_instance_centers` on (N, 4, H/2, W/2) parity planes.

    Returns the same structure as the full-res variant: 'yx' in
    FULL-RES coordinates, 'scores', 'valid'.
    """
    n, four, h2, w2 = heatmap_planes.shape
    hm = heatmap_planes
    if foreground_planes is not None:
        hm = jnp.where(foreground_planes, hm, 0.0)
    keep = _nms_keep_mask_planes(
        hm.reshape(n, 2, 2, h2, w2), nms_kernel_size
    ).reshape(n, 4, h2, w2)
    hm = jnp.where(keep & (hm > threshold), hm, 0.0)

    flat = hm.reshape(n, 4 * h2 * w2)
    scores, flat_idx = jax.lax.top_k(flat, top_k)
    valid = scores > 0.0
    par = flat_idx // (h2 * w2)
    rem = flat_idx % (h2 * w2)
    ys = 2 * (rem // w2) + par // 2
    xs = 2 * (rem % w2) + par % 2
    yx = jnp.stack([ys.astype(jnp.int32), xs.astype(jnp.int32)], axis=-1)
    valid = _suppress_duplicate_centers(yx, valid, nms_kernel_size // 2)
    return {"yx": yx, "scores": scores, "valid": valid}


def group_pixels_to_instances_planes(
    centers_yx: jnp.ndarray,
    centers_valid: jnp.ndarray,
    offset_y_planes: jnp.ndarray,
    offset_x_planes: jnp.ndarray,
    foreground_flat: jnp.ndarray,
    full_hw: Tuple[int, int],
    normalized_offset: bool = True,
    offset_distance_threshold: Optional[float] = None,
) -> jnp.ndarray:
    """`group_pixels_to_instances` in parity-major flat pixel order.

    offset planes: (N, 4, H/2, W/2) f32 (dy / dx); foreground_flat:
    (N, P) bool with P = 4*h2*w2 in the same parity-major order.
    Returns (N, P) int32 instance ids in [0, K]. The voted-center math
    is identical to the interleaved path — only the pixel ORDER differs,
    and the grouping argmin is order-independent. Building the (N, 2, P)
    kernel input from rank-4 lane-major planes skips the (N, P, 2)
    swapaxes relayout the interleaved path pays.
    """
    n, four, h2, w2 = offset_y_planes.shape
    h, w = full_hw
    p_total = four * h2 * w2
    k = centers_yx.shape[1]

    par = jax.lax.broadcasted_iota(jnp.int32, (four, h2, w2), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (four, h2, w2), 1)
    jx = jax.lax.broadcasted_iota(jnp.int32, (four, h2, w2), 2)
    loc_y = (2 * iy + par // 2).astype(jnp.float32)
    loc_x = (2 * jx + par % 2).astype(jnp.float32)

    off_y = offset_y_planes.astype(jnp.float32)
    off_x = offset_x_planes.astype(jnp.float32)
    if normalized_offset:
        off_y = off_y * jnp.float32(h)
        off_x = off_x * jnp.float32(w)
    vy = (loc_y[None] + off_y).reshape(n, p_total)
    vx = (loc_x[None] + off_x).reshape(n, p_total)
    voted_t = jnp.stack([vy, vx], axis=1)  # (N, 2, P) — no relayout

    from emsanet_tpu.ops.grouping import (
        group_pixels_argmin_reference,
        group_pixels_argmin_t,
    )

    c = centers_yx.astype(jnp.float32)
    if jax.default_backend() == "tpu":
        best, best_d = group_pixels_argmin_t(voted_t, c, centers_valid)
    else:
        best, best_d = group_pixels_argmin_reference(
            jnp.swapaxes(voted_t, 1, 2), c, centers_valid
        )

    instance_id = best + 1
    any_valid = jnp.any(centers_valid, axis=-1)[:, None]
    if offset_distance_threshold is not None:
        near = best_d <= jnp.float32(offset_distance_threshold) ** 2
        instance_id = jnp.where(near, instance_id, 0)
    instance_id = jnp.where(any_valid, instance_id, 0)
    return jnp.where(foreground_flat, instance_id, 0)


def interleave_plane(planes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4, H/2, W/2) parity planes (p*2+q) -> (N, H, W)."""
    n, _, h2, w2 = planes.shape
    a = planes.reshape(n, 2, 2, h2, w2)
    a = jnp.transpose(a, (0, 3, 1, 4, 2))
    return a.reshape(n, 2 * h2, 2 * w2)


def deinterleave_plane(full: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N, 4, H/2, W/2) parity planes (p*2+q)."""
    n, h, w = full.shape
    a = full.reshape(n, h // 2, 2, w // 2, 2)
    return jnp.transpose(a, (0, 2, 4, 1, 3)).reshape(
        n, 4, h // 2, w // 2
    )


def interleave_planes_batched(
    named: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Interleave MANY (N, 4, H/2, W/2) maps with ONE stacked transpose.

    Separate `interleave_plane` calls are fixed-overhead-dominated XLA
    relayouts (b1: ~0.13 ms each for 1.2 MB maps — tools/b1_stage_probe.py
    measured 0.515 ms for four). Stacking every final map on a trailing
    axis amortizes that overhead into one transpose; f32 maps ride as
    bitcast int32 (bit-exact), bool/other dtypes round-trip through a
    cast. Exactness locked by tests/test_postproc_planes.py.
    """
    if _PLANE_INTERLEAVE_PALLAS and jax.default_backend() == "tpu":
        from emsanet_tpu.ops.plane_interleave import (
            interleave_planes_pallas,
        )

        return interleave_planes_pallas(named)
    if not _BATCHED_INTERLEAVE:  # trace-time A/B knob (tools/decode_ab.py)
        return {name: interleave_plane(x) for name, x in named.items()}
    packed, metas = [], []
    for name, x in named.items():
        if x.dtype == jnp.float32:
            packed.append(jax.lax.bitcast_convert_type(x, jnp.int32))
        elif x.dtype == jnp.int32:
            packed.append(x)
        else:
            packed.append(x.astype(jnp.int32))
        metas.append((name, x.dtype))
    z = jnp.stack(packed, axis=-1)  # (N, 4, H2, W2, M)
    n, _, h2, w2, m_ = z.shape
    a = z.reshape(n, 2, 2, h2, w2, m_)
    a = jnp.transpose(a, (0, 3, 1, 4, 2, 5))
    full = a.reshape(n, 2 * h2, 2 * w2, m_)
    out = {}
    for i, (name, dt) in enumerate(metas):
        v = full[..., i]
        if dt == jnp.float32:
            v = jax.lax.bitcast_convert_type(v, jnp.float32)
        elif dt != jnp.int32:
            v = v.astype(dt)
        out[name] = v
    return out


def interleave_planes_np(planes) -> "np.ndarray":  # noqa: F821
    """numpy parity-plane interleave for host-side consumers.

    planes: (..., 4, H/2, W/2) -> (..., H, W). Used by visualization /
    metric helpers that receive `instance_head_planes` instead of the
    full-res channel-minor maps (the hot path never materializes those).
    """
    import numpy as np

    planes = np.asarray(planes)
    *lead, four, h2, w2 = planes.shape
    a = planes.reshape(*lead, 2, 2, h2, w2)
    a = np.moveaxis(a, (-4, -3), (-3, -1))
    return a.reshape(*lead, 2 * h2, 2 * w2)


def find_instance_centers(
    center_heatmap: jnp.ndarray,
    threshold: float = 0.1,
    nms_kernel_size: int = 17,
    top_k: int = 64,
    foreground_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Detect up to `top_k` instance centers per image.

    center_heatmap: (N, H, W) in [0, 1].
    Returns dict with 'yx' (N, K, 2) int32, 'scores' (N, K), 'valid' (N, K).
    """
    n, h, w = center_heatmap.shape
    hm = center_heatmap
    if foreground_mask is not None:
        hm = jnp.where(foreground_mask, hm, 0.0)
    keep = _nms_keep_mask(hm, nms_kernel_size)
    hm = jnp.where(keep & (hm > threshold), hm, 0.0)

    flat = hm.reshape(n, h * w)
    # measured on v5e @ (32, 307200): lax.top_k 1.9 ms — faster than a
    # 2-stage chunked top-k (5.9 ms; see ops/segment_ops.exact_top_k)
    scores, flat_idx = jax.lax.top_k(flat, top_k)
    valid = scores > 0.0
    ys = (flat_idx // w).astype(jnp.int32)
    xs = (flat_idx % w).astype(jnp.int32)
    yx = jnp.stack([ys, xs], axis=-1)
    valid = _suppress_duplicate_centers(yx, valid, nms_kernel_size // 2)
    return {"yx": yx, "scores": scores, "valid": valid}


def group_pixels_to_instances(
    centers_yx: jnp.ndarray,
    centers_valid: jnp.ndarray,
    offset: jnp.ndarray,
    foreground_mask: jnp.ndarray,
    normalized_offset: bool = True,
    offset_distance_threshold: Optional[float] = None,
) -> jnp.ndarray:
    """Assign each foreground pixel to its nearest voted center.

    centers_yx: (N, K, 2); offset: (N, H, W, 2) storing (dy, dx) in
    normalized ([-1,1] * image size) or absolute pixels; returns
    (N, H, W) int32 instance ids in [0, K] with 0 = unassigned.

    The argmin over centers is computed from the expanded squared
    distance |v|^2 - 2 v.c + |c|^2 whose middle term is a batched
    (H*W, 2) x (2, K) matmul — MXU work instead of a gather loop.
    """
    n, h, w, _ = offset.shape
    k = centers_yx.shape[1]

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    loc = jnp.stack([ys, xs], axis=-1)  # (H, W, 2)

    off = offset.astype(jnp.float32)
    if normalized_offset:
        off = off * jnp.asarray([h, w], jnp.float32)

    voted = loc[None] + off  # (N, H, W, 2) voted center position
    v = voted.reshape(n, h * w, 2)
    c = centers_yx.astype(jnp.float32)  # (N, K, 2)

    # hot op: Pallas kernel on TPU streams the (HW, K) distances through
    # VMEM; jnp fallback materializes them in HBM (CPU / debugging)
    from emsanet_tpu.ops.grouping import (
        group_pixels_argmin,
        group_pixels_argmin_reference,
    )

    if jax.default_backend() == "tpu":
        best, best_d = group_pixels_argmin(v, c, centers_valid)
    else:
        best, best_d = group_pixels_argmin_reference(v, c, centers_valid)

    instance_id = best + 1
    any_valid = jnp.any(centers_valid, axis=-1)[:, None]
    if offset_distance_threshold is not None:
        near = best_d <= jnp.float32(offset_distance_threshold) ** 2
        instance_id = jnp.where(near, instance_id, 0)
    instance_id = jnp.where(any_valid, instance_id, 0)
    instance_id = instance_id.reshape(n, h, w)
    return jnp.where(foreground_mask, instance_id, 0)


def postprocess_instance(
    center: jnp.ndarray,
    offset: jnp.ndarray,
    foreground_mask: jnp.ndarray,
    threshold: float = 0.1,
    nms_kernel_size: int = 17,
    top_k: int = 64,
    apply_foreground_mask_to_heatmap: bool = False,
    normalized_offset: bool = True,
    offset_distance_threshold: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Full instance postprocessing (heatmap -> centers -> grouping).

    center: (N, H, W, 1); offset: (N, H, W, 2); foreground_mask (N, H, W)
    bool (thing-class pixels; GT foreground at training time, predicted
    semantic things at inference — decoder.py:95-104 / args.py:469-538).
    """
    heatmap = center[..., 0]
    centers = find_instance_centers(
        heatmap,
        threshold=threshold,
        nms_kernel_size=nms_kernel_size,
        top_k=top_k,
        foreground_mask=(
            foreground_mask if apply_foreground_mask_to_heatmap else None
        ),
    )
    instance_seg = group_pixels_to_instances(
        centers["yx"],
        centers["valid"],
        offset,
        foreground_mask,
        normalized_offset=normalized_offset,
        offset_distance_threshold=offset_distance_threshold,
    )
    return {
        "segmentation": instance_seg,  # (N, H, W) ids in [0, K]
        "centers_yx": centers["yx"],
        "centers_score": centers["scores"],
        "centers_valid": centers["valid"],
    }


# ---------------------------------------------------------------------------
# panoptic merge (deeplab semantics)


def panoptic_merge(
    semantic_idx: jnp.ndarray,
    semantic_score: jnp.ndarray,
    instance_seg: jnp.ndarray,
    centers_score: jnp.ndarray,
    centers_valid: jnp.ndarray,
    is_thing: jnp.ndarray,
    n_classes: int,
    label_divisor: int = LABEL_DIVISOR,
    void_label: int = VOID_LABEL,
    orientation_vectors: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Panoptic-DeepLab merge, fully on-device (SURVEY.md M6/M13).

    semantic_idx: (N, H, W) int32 in the *full* label space (0 = void).
    instance_seg: (N, H, W) int32 in [0, K] (0 = unassigned).
    is_thing: (C_full,) bool lookup (void False).
    orientation_vectors: optional (N, H, W, 2) biternion field; when
    given, the per-instance circular means ride the SAME segment pass as
    the vote histogram (one full-image kernel sweep instead of two) and
    come back as 'instance_orientations' (N, K) angles in [0, 2*pi).

    Per instance id, the semantic class is decided by majority vote over
    the instance's pixels (one-hot segment sums -> (K+1, C) histogram ->
    argmax), restricted to thing classes. panoptic = class * divisor +
    instance for things; class * divisor for stuff; void for thing pixels
    without an instance.

    The math is per-pixel / per-segment and does not depend on the pixel
    ORDER — `panoptic_merge_flat` is the same computation on flat (N, P)
    tensors (used by the parity-plane pipeline, which keeps everything
    in parity-major order and interleaves only the final maps).
    """
    n, h, w = semantic_idx.shape
    flat = panoptic_merge_flat(
        semantic_idx.reshape(n, h * w),
        semantic_score.reshape(n, h * w),
        instance_seg.reshape(n, h * w),
        centers_score,
        centers_valid,
        is_thing,
        n_classes,
        label_divisor=label_divisor,
        void_label=void_label,
        orientation_vectors=(
            orientation_vectors.reshape(n, h * w, 2)
            if orientation_vectors is not None else None
        ),
    )
    out = dict(flat)
    for key in ("panoptic", "panoptic_score", "pixel_instance_semantic",
                "foreground_mask"):
        out[key] = flat[key].reshape(n, h, w)
    return out


def panoptic_merge_flat(
    semantic_idx: jnp.ndarray,
    semantic_score: jnp.ndarray,
    instance_seg: jnp.ndarray,
    centers_score: jnp.ndarray,
    centers_valid: jnp.ndarray,
    is_thing: jnp.ndarray,
    n_classes: int,
    label_divisor: int = LABEL_DIVISOR,
    void_label: int = VOID_LABEL,
    orientation_vectors: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """`panoptic_merge` on flat (N, P) pixel tensors (order-agnostic)."""
    n, n_pix = semantic_idx.shape
    k = centers_score.shape[1]

    from emsanet_tpu.ops.segment_ops import small_table_lookup

    # compare-based lookup: table gathers cost ~76 ms at this size (v5e)
    thing_mask = small_table_lookup(semantic_idx, is_thing)  # (N, P)
    has_instance = instance_seg > 0

    # --- majority vote: histogram over (instance id, semantic class) ------
    # one-hot segment sum; votes only from thing pixels of each instance
    flat_inst = instance_seg
    flat_sem = semantic_idx
    flat_thing = thing_mask

    vote_weight = flat_thing.astype(jnp.float32)
    # (instance, class) vote histogram: Pallas segment-reduce kernel on
    # TPU (masks in-register, MXU dots); factored one-hot matmuls as the
    # jnp fallback/oracle. Votes are 0/1 -> exact.
    flat_or = (
        orientation_vectors.astype(jnp.float32)
        if orientation_vectors is not None else None
    )
    ori_sums = None
    if jax.default_backend() == "tpu":
        from emsanet_tpu.ops.segment_pallas import segment_hist_and_sums

        hist, sums = segment_hist_and_sums(
            flat_inst, flat_sem, vote_weight,
            flat_or if flat_or is not None
            else jnp.zeros((*flat_inst.shape, 1), jnp.float32),
            num_segments=k + 1, num_classes=n_classes,
        )
        if flat_or is not None:
            ori_sums = sums
    else:
        from emsanet_tpu.ops.segment_ops import (
            segment_histogram_factored,
            segment_sum_vectors,
        )

        hist = segment_histogram_factored(
            flat_inst, flat_sem, vote_weight, k + 1, n_classes
        )
        if flat_or is not None:
            ori_sums = segment_sum_vectors(flat_inst, flat_or, k + 1)
    # restrict to thing classes; instance 0 is "no instance"
    hist = jnp.where(is_thing[None, None, :], hist, 0.0)
    inst_semantic = jnp.argmax(hist, axis=-1).astype(jnp.int32)  # (N, K+1)
    inst_has_votes = jnp.max(hist, axis=-1) > 0
    inst_area = jnp.sum(hist, axis=-1)  # thing-pixel area per instance

    # invalid instances (no pixels / no votes) get void semantics
    inst_semantic = jnp.where(inst_has_votes, inst_semantic, void_label)

    # --- compose panoptic ids ---------------------------------------------
    # per-pixel lookups of the per-instance tables (voted class + center
    # score). Batched gathers of 32x307k indices measured ~150 ms on v5e;
    # the Pallas lookup kernel does (D, K) x (K, T) dots in VMEM instead.
    center_score_padded = jnp.concatenate(
        [jnp.zeros((n, 1), centers_score.dtype), centers_score], axis=1
    )  # (N, K+1), index by instance id
    if jax.default_backend() == "tpu":
        from emsanet_tpu.ops.segment_pallas import segment_lookup

        tables = jnp.stack(
            [inst_semantic.astype(jnp.float32), center_score_padded], axis=1
        )  # (N, 2, K+1)
        looked_up = segment_lookup(flat_inst, tables)  # (N, 2, P)
        pixel_inst_sem = looked_up[:, 0].astype(jnp.int32)
        pixel_inst_score = looked_up[:, 1]
    else:
        from emsanet_tpu.ops.segment_ops import segment_gather

        pixel_inst_sem = segment_gather(
            flat_inst, inst_semantic.astype(jnp.float32)
        ).astype(jnp.int32)
        pixel_inst_score = segment_gather(
            flat_inst, center_score_padded
        )

    thing_assigned = thing_mask & has_instance & (pixel_inst_sem > 0)
    panoptic = jnp.where(
        thing_assigned,
        pixel_inst_sem * label_divisor + instance_seg,
        jnp.where(
            thing_mask,
            void_label,  # unassigned thing pixels -> void
            semantic_idx * label_divisor,  # stuff passthrough
        ),
    ).astype(jnp.int32)  # max id = C*2^16 + K, well within int32

    # --- scores & meta ------------------------------------------------------
    panoptic_score = jnp.where(
        thing_assigned,
        pixel_inst_score * semantic_score,
        jnp.where(thing_mask, 0.0, semantic_score),
    )

    meta_valid = inst_has_votes[:, 1:] & centers_valid
    out_extra = {}
    if ori_sums is not None:
        angles = jnp.arctan2(ori_sums[:, 1:, 0], ori_sums[:, 1:, 1])
        out_extra["instance_orientations"] = jnp.mod(angles, 2 * jnp.pi)
    return {
        **out_extra,
        "panoptic": panoptic,
        "panoptic_score": panoptic_score.astype(jnp.float32),
        "pixel_instance_semantic": pixel_inst_sem,
        "foreground_mask": thing_mask,
        # fixed-shape instance meta (reference meta dicts, SURVEY.md §3.4)
        "instance_meta_semantic_idx": inst_semantic[:, 1:],
        "instance_meta_area": inst_area[:, 1:].astype(jnp.int32),
        "instance_meta_score": centers_score,
        "instance_meta_valid": meta_valid,
    }


# ---------------------------------------------------------------------------
# orientation


def aggregate_instance_orientations(
    orientation: jnp.ndarray,
    instance_seg: jnp.ndarray,
    top_k: int,
) -> Dict[str, jnp.ndarray]:
    """Per-instance orientation: circular mean of the biternion field.

    orientation: (N, H, W, 2) raw (sin, cos)-like outputs; mean over each
    instance's pixels then atan2 (von-Mises/biternion decoding,
    SURVEY.md M5/M11). Returns angles in [0, 2*pi) (N, K).
    """
    n, h, w, _ = orientation.shape
    flat_inst = instance_seg.reshape(n, h * w)
    flat_or = orientation.reshape(n, h * w, 2).astype(jnp.float32)

    if jax.default_backend() == "tpu":
        from emsanet_tpu.ops.segment_pallas import segment_hist_and_sums

        _, sums = segment_hist_and_sums(
            flat_inst,
            jnp.zeros_like(flat_inst),
            jnp.zeros(flat_inst.shape, jnp.float32),
            flat_or,
            num_segments=top_k + 1,
            num_classes=8,  # histogram unused on this path
        )
    else:
        from emsanet_tpu.ops.segment_ops import segment_sum_vectors

        sums = segment_sum_vectors(flat_inst, flat_or, top_k + 1)
    sums = sums[:, 1:, :]  # (N, K, 2)
    angles = jnp.arctan2(sums[..., 0], sums[..., 1])  # (sin, cos)
    return {"instance_orientations": jnp.mod(angles, 2 * jnp.pi)}


# ---------------------------------------------------------------------------
# scene


def postprocess_scene(logits: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return {
        "class_idx": jnp.argmax(probs, axis=-1).astype(jnp.int32),
        "class_score": jnp.max(probs, axis=-1),
    }


# ---------------------------------------------------------------------------
# top-level


def postprocess(
    outputs: Dict[str, Any],
    is_thing: jnp.ndarray,
    cfg=None,
    gt_foreground: Optional[jnp.ndarray] = None,
    use_orientations: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full postprocessing over raw model outputs (flat key contract §3.4).

    is_thing: (C_full,) bool for the full label space including void at 0.
    The semantic head predicts void-free classes; +1 maps into the full
    space. If `gt_foreground` is given (training-time postprocessing),
    instance grouping uses it instead of predicted semantics
    (reference: instance postprocessing with GT foreground masks).
    """
    from emsanet_tpu.config import ModelConfig

    cfg = cfg or ModelConfig()
    results: Dict[str, jnp.ndarray] = {}
    n_classes_full = int(is_thing.shape[0])

    if (
        "semantic" in outputs
        and "decode_input" in outputs["semantic"]
        and "instance" in outputs
        and "decode_input" in outputs["instance"]
        and getattr(cfg, "head_decode_fusion", "decode") != "decode-both"
    ):
        # both heads fully deferred: run the parity-plane pipeline
        # (everything in parity-major order; interleave only final maps).
        # 'decode-both' instead falls through: both head KERNELS run but
        # the instance planes are interleaved into the legacy full-res
        # maps and the interleaved postprocessing pipeline takes over.
        return _postprocess_planes(
            outputs, is_thing, cfg,
            gt_foreground=gt_foreground,
            use_orientations=use_orientations,
        )

    semantic_full = None
    semantic_score = None
    if "semantic" in outputs:
        if "decode_input" in outputs["semantic"]:
            # fully deferred final x2 stage: the fused Pallas
            # upsample+decode megakernel on TPU (14.4 -> 7.3 ms at b32,
            # ops/semantic_decode.py), jnp conv oracle elsewhere
            di = outputs["semantic"]["decode_input"]
            if jax.default_backend() == "tpu":
                if _SEMANTIC_MAP_INTERLEAVE == "kernel":
                    from emsanet_tpu.ops.semantic_decode import (
                        semantic_decode_fused_interleaved,
                    )

                    idx, score = semantic_decode_fused_interleaved(
                        di["x"], di["kernel"]
                    )
                else:
                    from emsanet_tpu.ops.semantic_decode import (
                        semantic_decode_fused,
                    )

                    idx, score = semantic_decode_fused(
                        di["x"], di["kernel"]
                    )
            else:
                from emsanet_tpu.ops.semantic_decode import (
                    semantic_decode_reference,
                )

                idx, score = semantic_decode_reference(di["x"], di["kernel"])
            sem = {"segmentation_idx": idx, "score": score}
        elif "logits_polyphase" in outputs["semantic"]:
            # fused-inference deferred-interleave head (decoder left the
            # final x2 stage in the polyphase domain)
            sem = postprocess_semantic_polyphase(
                outputs["semantic"]["logits_polyphase"]
            )
        else:
            sem = postprocess_semantic(outputs["semantic"]["logits"])
        results["semantic_segmentation_idx"] = sem["segmentation_idx"]
        results["semantic_segmentation_score"] = sem["score"]
        semantic_full = sem["segmentation_idx"] + 1  # -> full label space
        semantic_score = sem["score"]

    if "instance" in outputs and "decode_input" in outputs["instance"]:
        # fully deferred instance head: run the fused Pallas
        # upsample+encode kernel (ops/instance_head.py) and materialize
        # the legacy center/offset/orientation maps from its parity
        # planes — everything downstream is unchanged
        di = outputs["instance"]["decode_input"]
        c_head = di["x"].shape[-1]
        from emsanet_tpu.ops.instance_head import (
            encodings_for,
            instance_head_upsample,
            instance_head_upsample_interleaved,
            instance_head_upsample_reference,
            interleave_all_channels,
            interleave_channel,
        )

        enc = encodings_for(
            c_head, cfg.instance_sigmoid_for_center,
            cfg.instance_tanh_for_offset,
        )
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and _INSTANCE_MAP_INTERLEAVE == "kernel":
            full = instance_head_upsample_interleaved(
                di["x"], di["kernel"], enc
            )
            maps = [full[:, ch] for ch in range(c_head)]
        else:
            if on_tpu:
                planes = instance_head_upsample(di["x"], di["kernel"], enc)
            else:
                planes = instance_head_upsample_reference(
                    di["x"], di["kernel"], enc
                )
            if _INSTANCE_MAP_INTERLEAVE == "batched":
                full = interleave_all_channels(planes)
                maps = [full[:, ch] for ch in range(c_head)]
            else:
                maps = [
                    interleave_channel(planes, ch) for ch in range(c_head)
                ]
        inst_decoded: Dict[str, Any] = {
            "center": maps[0][..., None],
            "offset": jnp.stack(maps[1:3], axis=-1),
        }
        if c_head >= 5:
            inst_decoded["orientation"] = jnp.stack(maps[3:5], axis=-1)
        outputs = dict(outputs)
        outputs["instance"] = inst_decoded

    if "instance" in outputs:
        if semantic_full is not None:
            from emsanet_tpu.ops.segment_ops import small_table_lookup

            foreground = small_table_lookup(semantic_full, is_thing)
        else:
            foreground = jnp.ones(
                outputs["instance"]["center"].shape[:3], bool
            )
        if gt_foreground is not None:
            # GT-foreground variant for the instance-only metrics
            # (reference 'instance_segmentation_gt_foreground', §3.4)
            inst_gt_fg = postprocess_instance(
                outputs["instance"]["center"],
                outputs["instance"]["offset"],
                gt_foreground.astype(bool),
                threshold=cfg.instance_center_heatmap_threshold,
                nms_kernel_size=cfg.instance_center_heatmap_nms_kernel_size,
                top_k=cfg.instance_center_heatmap_top_k,
                apply_foreground_mask_to_heatmap=(
                    cfg.instance_center_heatmap_apply_foreground_mask
                ),
                normalized_offset=cfg.instance_normalized_offset,
                offset_distance_threshold=(
                    cfg.instance_offset_distance_threshold
                ),
            )
            results["instance_segmentation_gt_foreground"] = inst_gt_fg[
                "segmentation"
            ]
        inst = postprocess_instance(
            outputs["instance"]["center"],
            outputs["instance"]["offset"],
            foreground,
            threshold=cfg.instance_center_heatmap_threshold,
            nms_kernel_size=cfg.instance_center_heatmap_nms_kernel_size,
            top_k=cfg.instance_center_heatmap_top_k,
            apply_foreground_mask_to_heatmap=(
                cfg.instance_center_heatmap_apply_foreground_mask
            ),
            normalized_offset=cfg.instance_normalized_offset,
            offset_distance_threshold=cfg.instance_offset_distance_threshold,
        )
        results["instance_segmentation"] = inst["segmentation"]
        results["instance_centers"] = outputs["instance"]["center"]
        results["instance_offsets"] = outputs["instance"]["offset"]
        results["instance_centers_yx"] = inst["centers_yx"]
        results["instance_centers_score"] = inst["centers_score"]
        results["instance_centers_valid"] = inst["centers_valid"]
        results["instance_foreground"] = foreground

        if semantic_full is not None and getattr(cfg, "enable_panoptic", False):
            pan = panoptic_merge(
                semantic_full,
                semantic_score,
                inst["segmentation"],
                inst["centers_score"],
                inst["centers_valid"],
                is_thing,
                n_classes=n_classes_full,
                # orientation circular means ride the same segment pass
                orientation_vectors=outputs["instance"].get("orientation"),
            )
            results["panoptic_segmentation_deeplab"] = pan["panoptic"]
            results["panoptic_segmentation_deeplab_panoptic_score"] = pan[
                "panoptic_score"
            ]
            results["panoptic_segmentation_deeplab_semantic_idx"] = pan[
                "pixel_instance_semantic"
            ]
            results["panoptic_foreground_mask"] = pan["foreground_mask"]
            results["panoptic_instance_meta_semantic_idx"] = pan[
                "instance_meta_semantic_idx"
            ]
            results["panoptic_instance_meta_area"] = pan["instance_meta_area"]
            results["panoptic_instance_meta_score"] = pan["instance_meta_score"]
            results["panoptic_instance_meta_valid"] = pan["instance_meta_valid"]

        if "orientation" in outputs.get("instance", {}):
            if "panoptic_segmentation_deeplab" in results and (
                "instance_orientations" in pan
            ):
                results["orientations_instance"] = pan[
                    "instance_orientations"
                ]
            else:
                ors = aggregate_instance_orientations(
                    outputs["instance"]["orientation"],
                    inst["segmentation"],
                    top_k=cfg.instance_center_heatmap_top_k,
                )
                results["orientations_instance"] = ors[
                    "instance_orientations"
                ]
            results["instance_orientation"] = outputs["instance"]["orientation"]
            # reference: orientations only for classes flagged
            # use_orientations (SURVEY.md M6 'semantic_class_has_orientation')
            if (
                use_orientations is not None
                and "panoptic_instance_meta_semantic_idx" in results
            ):
                inst_sem = results["panoptic_instance_meta_semantic_idx"]
                results["orientations_panoptic_instance_valid"] = (
                    use_orientations[inst_sem]
                    & results["panoptic_instance_meta_valid"]
                )

    if "normal" in outputs:
        results["normal"] = outputs["normal"]["normal"]

    if "scene" in outputs:
        scene = postprocess_scene(outputs["scene"]["logits"])
        results["scene_class_idx"] = scene["class_idx"]
        results["scene_class_score"] = scene["class_score"]

    return results


def _postprocess_planes(
    outputs: Dict[str, Any],
    is_thing: jnp.ndarray,
    cfg,
    gt_foreground: Optional[jnp.ndarray] = None,
    use_orientations: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Parity-domain postprocessing (both heads fully deferred).

    The semantic decode kernel and the instance head kernel emit
    (N, 4, H/2, W/2) parity planes; every per-pixel stage (foreground
    lookup, NMS, grouping, the panoptic-merge segment passes) runs in
    parity-major flat order, and only the FINAL user-facing maps are
    interleaved — the full-res channel-minor center/offset/orientation
    tensors never materialize. Their information is returned as
    `instance_head_planes` (N, C, 4, H/2, W/2) f32 (+ helpers:
    `interleave_planes_np` on the host, `interleave_plane` on device).

    Numerics match the interleaved pipeline exactly on the same inputs
    (tests/test_postproc_planes.py): the per-pixel math is identical,
    only the pixel ORDER inside the order-agnostic segment/grouping ops
    differs.
    """
    results: Dict[str, jnp.ndarray] = {}
    n_classes_full = int(is_thing.shape[0])
    on_tpu = jax.default_backend() == "tpu"

    from emsanet_tpu.ops.instance_head import (
        encodings_for,
        instance_head_upsample,
        instance_head_upsample_reference,
    )
    from emsanet_tpu.ops.segment_ops import small_table_lookup

    # --- semantic: decode to parity planes --------------------------------
    sdi = outputs["semantic"]["decode_input"]
    if on_tpu:
        from emsanet_tpu.ops.semantic_decode import (
            semantic_decode_fused_planes,
        )

        idx4, score4 = semantic_decode_fused_planes(
            sdi["x"], sdi["kernel"]
        )
    else:
        from emsanet_tpu.ops.semantic_decode import semantic_decode_reference

        idx_full, score_full = semantic_decode_reference(
            sdi["x"], sdi["kernel"]
        )
        idx4 = deinterleave_plane(idx_full)
        score4 = deinterleave_plane(score_full)

    n, _, h2, w2 = idx4.shape
    h, w = 2 * h2, 2 * w2
    p_total = 4 * h2 * w2
    # all final full-res maps are interleaved together at the end by
    # interleave_planes_batched (one stacked transpose instead of one
    # fixed-overhead relayout per map)
    to_interleave: Dict[str, jnp.ndarray] = {
        "semantic_segmentation_idx": idx4,
        "semantic_segmentation_score": score4,
    }

    sem_full_planes = idx4 + 1  # -> full label space (void at 0)
    fg_planes = small_table_lookup(sem_full_planes, is_thing)
    fg_flat = fg_planes.reshape(n, p_total)

    # --- instance head: fused upsample+encode into planes ------------------
    di = outputs["instance"]["decode_input"]
    c_head = di["x"].shape[-1]
    enc = encodings_for(
        c_head, cfg.instance_sigmoid_for_center, cfg.instance_tanh_for_offset
    )
    if on_tpu:
        planes = instance_head_upsample(di["x"], di["kernel"], enc)
    else:
        planes = instance_head_upsample_reference(di["x"], di["kernel"], enc)
    center_planes = planes[:, 0]  # (N, 4, H/2, W/2) f32
    off_y_planes, off_x_planes = planes[:, 1], planes[:, 2]

    apply_fg = cfg.instance_center_heatmap_apply_foreground_mask
    centers = find_instance_centers_planes(
        center_planes,
        threshold=cfg.instance_center_heatmap_threshold,
        nms_kernel_size=cfg.instance_center_heatmap_nms_kernel_size,
        top_k=cfg.instance_center_heatmap_top_k,
        foreground_planes=fg_planes if apply_fg else None,
    )
    inst_flat = group_pixels_to_instances_planes(
        centers["yx"], centers["valid"], off_y_planes, off_x_planes,
        fg_flat, (h, w),
        normalized_offset=cfg.instance_normalized_offset,
        offset_distance_threshold=cfg.instance_offset_distance_threshold,
    )

    if gt_foreground is not None:
        # GT-foreground variant (reference
        # 'instance_segmentation_gt_foreground', §3.4)
        gt_planes = deinterleave_plane(gt_foreground.astype(bool))
        centers_gt = find_instance_centers_planes(
            center_planes,
            threshold=cfg.instance_center_heatmap_threshold,
            nms_kernel_size=cfg.instance_center_heatmap_nms_kernel_size,
            top_k=cfg.instance_center_heatmap_top_k,
            foreground_planes=gt_planes if apply_fg else None,
        )
        inst_gt_flat = group_pixels_to_instances_planes(
            centers_gt["yx"], centers_gt["valid"], off_y_planes,
            off_x_planes, gt_planes.reshape(n, p_total), (h, w),
            normalized_offset=cfg.instance_normalized_offset,
            offset_distance_threshold=cfg.instance_offset_distance_threshold,
        )
        to_interleave["instance_segmentation_gt_foreground"] = (
            inst_gt_flat.reshape(n, 4, h2, w2)
        )

    to_interleave["instance_segmentation"] = inst_flat.reshape(
        n, 4, h2, w2
    )
    results["instance_centers_yx"] = centers["yx"]
    results["instance_centers_score"] = centers["scores"]
    results["instance_centers_valid"] = centers["valid"]
    to_interleave["instance_foreground"] = fg_planes
    # raw head outputs in parity-plane layout (center, offset_y,
    # offset_x[, orientation]); host consumers interleave on demand
    results["instance_head_planes"] = planes

    ori_flat = None
    if c_head >= 5:
        ori_flat = jnp.stack(
            [planes[:, 3].reshape(n, p_total),
             planes[:, 4].reshape(n, p_total)], axis=-1,
        )
        results["instance_orientation_planes"] = planes[:, 3:5]

    pan = None
    if getattr(cfg, "enable_panoptic", False):
        pan = panoptic_merge_flat(
            sem_full_planes.reshape(n, p_total),
            score4.reshape(n, p_total),
            inst_flat,
            centers["scores"],
            centers["valid"],
            is_thing,
            n_classes=n_classes_full,
            orientation_vectors=ori_flat,
        )
        to_interleave["panoptic_segmentation_deeplab"] = pan[
            "panoptic"].reshape(n, 4, h2, w2)
        to_interleave["panoptic_segmentation_deeplab_panoptic_score"] = (
            pan["panoptic_score"].astype(jnp.float32).reshape(n, 4, h2, w2)
        )
        to_interleave["panoptic_segmentation_deeplab_semantic_idx"] = (
            pan["pixel_instance_semantic"].reshape(n, 4, h2, w2)
        )
        results["panoptic_instance_meta_semantic_idx"] = pan[
            "instance_meta_semantic_idx"
        ]
        results["panoptic_instance_meta_area"] = pan["instance_meta_area"]
        results["panoptic_instance_meta_score"] = pan["instance_meta_score"]
        results["panoptic_instance_meta_valid"] = pan["instance_meta_valid"]

    if ori_flat is not None:
        if pan is not None and "instance_orientations" in pan:
            results["orientations_instance"] = pan["instance_orientations"]
        else:
            # flat variant of aggregate_instance_orientations: the
            # function only reshapes (N, H, W[, 2]) -> (N, P[, 2]), so
            # feeding (N, P, 1[, 2]) flat tensors is exact
            ors = aggregate_instance_orientations(
                ori_flat[:, :, None, :],
                inst_flat[:, :, None],
                top_k=cfg.instance_center_heatmap_top_k,
            )
            results["orientations_instance"] = ors["instance_orientations"]
        if (
            use_orientations is not None
            and "panoptic_instance_meta_semantic_idx" in results
        ):
            inst_sem = results["panoptic_instance_meta_semantic_idx"]
            results["orientations_panoptic_instance_valid"] = (
                use_orientations[inst_sem]
                & results["panoptic_instance_meta_valid"]
            )

    if "normal" in outputs:
        results["normal"] = outputs["normal"]["normal"]

    if "scene" in outputs:
        scene = postprocess_scene(outputs["scene"]["logits"])
        results["scene_class_idx"] = scene["class_idx"]
        results["scene_class_score"] = scene["class_score"]

    results.update(interleave_planes_batched(to_interleave))
    if pan is not None:
        results["panoptic_foreground_mask"] = results["instance_foreground"]

    return results
