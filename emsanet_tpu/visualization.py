"""Visualization: renderers for every prediction/GT output key.

Reference: `emsanet/visualization.py` + `nicr_mt_scene_analysis.
visualization` (SURVEY.md R11/M16): semantic (palette), instance
(distinct colors via stateful generators for cross-image consistency,
visualization.py:54-75), center heatmaps, offsets (color wheel), dense +
per-instance orientation, panoptic, score heatmaps, depth, blended
overlays, and batch/prediction writers producing PNG/JSON per sample
identifier (visualization.py:197-228).

Pure numpy + PIL; no JAX dependency (runs host-side after device_get).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from emsanet_tpu.datasets.base import generate_distinct_colors
from emsanet_tpu.metrics import LABEL_DIVISOR


# ---------------------------------------------------------------------------
# color generators (stateful for cross-image consistency, viz.py:54-75)


class InstanceColorGenerator:
    """Assigns each instance id a stable distinct color."""

    def __init__(self, seed: int = 1):
        self._colors = generate_distinct_colors(256, seed=seed)
        self._assigned: Dict[int, Tuple[int, int, int]] = {0: (0, 0, 0)}

    def color(self, instance_id: int) -> Tuple[int, int, int]:
        if instance_id not in self._assigned:
            idx = len(self._assigned) % len(self._colors)
            self._assigned[instance_id] = self._colors[idx]
        return self._assigned[instance_id]

    def colorize(self, instance_map: np.ndarray) -> np.ndarray:
        out = np.zeros((*instance_map.shape, 3), np.uint8)
        for iid in np.unique(instance_map):
            out[instance_map == iid] = self.color(int(iid))
        return out


class PanopticColorGenerator:
    """Stuff classes get their semantic color; things get per-instance
    shades of their class color."""

    def __init__(self, semantic_colors: np.ndarray,
                 is_thing: Sequence[bool], seed: int = 2):
        self.semantic_colors = np.asarray(semantic_colors, np.uint8)
        self.is_thing = np.asarray(is_thing, bool)
        self._shade_cache: Dict[int, np.ndarray] = {}
        self._rng = np.random.RandomState(seed)

    def _shade(self, panoptic_id: int) -> np.ndarray:
        if panoptic_id not in self._shade_cache:
            sem = panoptic_id // LABEL_DIVISOR
            base = self.semantic_colors[sem % len(self.semantic_colors)]
            jitter = self._rng.randint(-40, 41, 3)
            self._shade_cache[panoptic_id] = np.clip(
                base.astype(int) + jitter, 0, 255
            ).astype(np.uint8)
        return self._shade_cache[panoptic_id]

    def colorize(self, panoptic_map: np.ndarray) -> np.ndarray:
        out = np.zeros((*panoptic_map.shape, 3), np.uint8)
        for pid in np.unique(panoptic_map):
            sem = int(pid) // LABEL_DIVISOR
            if pid == 0 or sem >= len(self.is_thing):
                continue
            if self.is_thing[sem]:
                out[panoptic_map == pid] = self._shade(int(pid))
            else:
                out[panoptic_map == pid] = self.semantic_colors[sem]
        return out


_SHARED: Dict[str, Any] = {}


def setup_shared_color_generators(dataset_config) -> None:
    """Shared generators for cross-image color consistency (R11)."""
    _SHARED["instance"] = InstanceColorGenerator()
    _SHARED["panoptic"] = PanopticColorGenerator(
        dataset_config.semantic_label_list.colors_array,
        dataset_config.semantic_label_list.classes_is_thing,
    )


# ---------------------------------------------------------------------------
# stateless renderers


def visualize_semantic(semantic: np.ndarray, colors: np.ndarray) -> np.ndarray:
    """semantic: (H, W) ids in the full label space; colors: (C, 3)."""
    colors = np.asarray(colors, np.uint8)
    return colors[np.clip(semantic, 0, len(colors) - 1)]


def visualize_heatmap(heatmap: np.ndarray) -> np.ndarray:
    """Scalar map in [0, 1] -> inferno-like colormap (no mpl dependency)."""
    x = np.clip(np.asarray(heatmap, np.float32), 0, 1)
    r = np.clip(2.0 * x, 0, 1)
    g = np.clip(2.0 * x - 0.5, 0, 1) ** 1.5
    b = np.clip(1.0 - 2.0 * x, 0, 1) * 0.5 + 0.1 * x
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def visualize_score(score: np.ndarray) -> np.ndarray:
    return visualize_heatmap(score)


def visualize_depth(depth: np.ndarray) -> np.ndarray:
    d = np.asarray(depth, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    valid = d > 0
    if valid.any():
        lo, hi = np.percentile(d[valid], [2, 98])
        d = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    return visualize_heatmap(np.where(valid, d, 0))


def _hsv_to_rgb(h, s, v):
    i = np.floor(h * 6).astype(int) % 6
    f = h * 6 - np.floor(h * 6)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    lut = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1),
        np.stack([p, v, t], -1), np.stack([p, q, v], -1),
        np.stack([t, p, v], -1), np.stack([v, p, q], -1),
    ])
    return np.take_along_axis(lut, i[None, ..., None], 0)[0]


def visualize_instance_offset(offset: np.ndarray) -> np.ndarray:
    """Offset vectors as a color wheel (hue = direction, sat = magnitude)."""
    off = np.asarray(offset, np.float32)
    angle = np.arctan2(off[..., 0], off[..., 1])
    mag = np.linalg.norm(off, axis=-1)
    mag = mag / max(mag.max(), 1e-6)
    rgb = _hsv_to_rgb((angle / (2 * np.pi)) % 1.0, mag, np.ones_like(mag))
    return (rgb * 255).astype(np.uint8)


def visualize_instance_center(center: np.ndarray) -> np.ndarray:
    c = np.asarray(center)
    if c.ndim == 3:
        c = c[..., 0]
    return visualize_heatmap(c)


def visualize_instance(instance: np.ndarray,
                       color_generator: Optional[InstanceColorGenerator] = None
                       ) -> np.ndarray:
    gen = color_generator or _SHARED.get("instance") or InstanceColorGenerator()
    return gen.colorize(np.asarray(instance))


def visualize_panoptic(panoptic: np.ndarray, dataset_config=None,
                       color_generator: Optional[PanopticColorGenerator] = None
                       ) -> np.ndarray:
    gen = color_generator or _SHARED.get("panoptic")
    if gen is None:
        if dataset_config is None:
            raise ValueError(
                "visualize_panoptic needs a color generator or dataset_config"
            )
        gen = PanopticColorGenerator(
            dataset_config.semantic_label_list.colors_array,
            dataset_config.semantic_label_list.classes_is_thing,
        )
    return gen.colorize(np.asarray(panoptic))


def visualize_orientation(orientation: np.ndarray,
                          foreground: Optional[np.ndarray] = None
                          ) -> np.ndarray:
    """Dense biternion field -> hue by angle."""
    o = np.asarray(orientation, np.float32)
    angle = (np.arctan2(o[..., 0], o[..., 1]) / (2 * np.pi)) % 1.0
    rgb = _hsv_to_rgb(angle, np.ones_like(angle), np.ones_like(angle))
    img = (rgb * 255).astype(np.uint8)
    if foreground is not None:
        img[~np.asarray(foreground, bool)] = 0
    return img


def visualize_instance_orientations(
    instance: np.ndarray,
    orientations: Dict[int, float],
    shared_color_generator: Optional[InstanceColorGenerator] = None,
    thickness: int = 3,
    font_size: int = 45,
    bg_color: int = 0,
    bg_color_font: str = "black",
    draw_arrows: bool = True,
) -> np.ndarray:
    """Per-instance orientation overlay: instance masks filled with the
    shared instance color plus a centroid arrow along the yaw (0 deg =
    image-up, clockwise) and the angle in degrees as text.

    Mirrors the reference overlay surface (emsanet/visualization.py:37-49
    KWARGS_INSTANCE_ORIENTATION{_WHITEBG} with thickness/font_size/
    bg_color/bg_color_font; renderer in the unvendored
    nicr_mt_scene_analysis.visualization).
    """
    inst = np.asarray(instance)
    out = np.full((*inst.shape, 3), np.uint8(bg_color), np.uint8)
    items = sorted((orientations or {}).items())
    for iid, theta in items:
        mask = inst == iid
        if not mask.any():
            continue
        if shared_color_generator is not None:
            color = np.asarray(shared_color_generator.color(int(iid)),
                               np.uint8)
        else:
            hue = (theta / (2 * np.pi)) % 1.0
            color = (_hsv_to_rgb(np.asarray([hue]), np.asarray([1.0]),
                                 np.asarray([1.0]))[0] * 255
                     ).astype(np.uint8)
        out[mask] = color
    if not draw_arrows or not items:
        return out

    from PIL import Image, ImageDraw

    img = Image.fromarray(out)
    draw = ImageDraw.Draw(img)
    try:
        from PIL import ImageFont

        font = ImageFont.load_default(size=max(font_size // 3, 8))
    except Exception:  # older Pillow: fixed-size bitmap font
        font = None
    for iid, theta in items:
        ys, xs = np.nonzero(inst == iid)
        if ys.size == 0:
            continue
        cy, cx = float(ys.mean()), float(xs.mean())
        # arrow length scales with the instance footprint
        length = max(np.sqrt(ys.size) * 0.6, 8.0)
        dx = np.sin(theta) * length
        dy = -np.cos(theta) * length
        tip = (cx + dx, cy + dy)
        draw.line([(cx, cy), tip], fill=(255, 255, 255), width=thickness)
        # arrowhead: two short lines rotated +-150 deg from the shaft
        for rot in (np.deg2rad(150), -np.deg2rad(150)):
            hx = np.sin(theta + rot) * length * 0.35
            hy = -np.cos(theta + rot) * length * 0.35
            draw.line([tip, (tip[0] + hx, tip[1] + hy)],
                      fill=(255, 255, 255), width=thickness)
        deg = int(round(np.degrees(theta))) % 360
        draw.text((cx + 2, cy + 2), f"{deg}°",
                  fill=bg_color_font, font=font)
    return np.asarray(img)


def dense_instance_maps(predictions, b):
    """(center (H,W,1), offset (H,W,2), orientation (H,W,2)) for sample b.

    Accepts both postprocessing layouts: the legacy dense keys
    ('instance_centers' / 'instance_offsets' / 'instance_orientation')
    and the parity-plane layout ('instance_head_planes' (N, C, 4, H/2,
    W/2) — the TPU hot path never materializes the dense channel-minor
    maps, so host consumers interleave here). Missing entries are None.
    """
    center = offset = orientation = None
    if "instance_centers" in predictions:
        center = np.asarray(predictions["instance_centers"][b])
        offset = np.asarray(predictions["instance_offsets"][b])
        if "instance_orientation" in predictions:
            orientation = np.asarray(predictions["instance_orientation"][b])
    elif "instance_head_planes" in predictions:
        from emsanet_tpu.postprocessing import interleave_planes_np

        planes = np.asarray(predictions["instance_head_planes"][b])
        maps = interleave_planes_np(planes)  # (C, H, W)
        center = maps[0][..., None]
        offset = np.moveaxis(maps[1:3], 0, -1)
        if maps.shape[0] >= 5:
            orientation = np.moveaxis(maps[3:5], 0, -1)
    return center, offset, orientation


def blend(rgb: np.ndarray, overlay: np.ndarray, alpha: float = 0.5
          ) -> np.ndarray:
    rgb = np.asarray(rgb, np.float32)
    overlay = np.asarray(overlay, np.float32)
    return np.clip((1 - alpha) * rgb + alpha * overlay, 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# writers (R11: PNG/JSON per identifier)


def _save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(img).save(path)


def visualize_predictions(
    predictions: Dict[str, np.ndarray],
    batch: Dict[str, Any],
    output_path: str,
    dataset_config,
    batch_index: Optional[int] = None,
) -> None:
    """Write one PNG per prediction key per sample (reference
    `visualize_predictions`, visualization.py:197+)."""
    colors = dataset_config.semantic_label_list.colors_array
    identifiers = batch.get("identifier")
    n = None
    for v in predictions.values():
        if hasattr(v, "shape") and len(getattr(v, "shape", ())) >= 1:
            n = v.shape[0]
            break
    if n is None:
        return
    indices = range(n) if batch_index is None else [batch_index]
    for b in indices:
        ident = (
            identifiers[b].to_filename()
            if identifiers is not None and hasattr(identifiers[b], "to_filename")
            else f"sample_{b:04d}"
        )
        if "semantic_segmentation_idx" in predictions:
            sem = np.asarray(predictions["semantic_segmentation_idx"][b]) + 1
            _save_png(os.path.join(output_path, "semantic", f"{ident}.png"),
                      visualize_semantic(sem, colors))
            _save_png(
                os.path.join(output_path, "semantic_score", f"{ident}.png"),
                visualize_score(
                    np.asarray(predictions["semantic_segmentation_score"][b])
                ),
            )
        # one host-side plane interleave per sample feeds the center /
        # offset / orientation renderers below
        center, offset, orientation = dense_instance_maps(predictions, b)
        if "instance_segmentation" in predictions:
            _save_png(
                os.path.join(output_path, "instance", f"{ident}.png"),
                visualize_instance(
                    np.asarray(predictions["instance_segmentation"][b])
                ),
            )
            if center is not None:
                _save_png(
                    os.path.join(
                        output_path, "instance_center", f"{ident}.png"
                    ),
                    visualize_instance_center(center),
                )
            if offset is not None:
                _save_png(
                    os.path.join(
                        output_path, "instance_offset", f"{ident}.png"
                    ),
                    visualize_instance_offset(offset),
                )
        if "panoptic_segmentation_deeplab" in predictions:
            _save_png(
                os.path.join(output_path, "panoptic", f"{ident}.png"),
                visualize_panoptic(
                    np.asarray(predictions["panoptic_segmentation_deeplab"][b]),
                    dataset_config,
                ),
            )
        if orientation is not None:
            fg = None
            if "panoptic_foreground_mask" in predictions:
                fg = np.asarray(predictions["panoptic_foreground_mask"][b])
            _save_png(
                os.path.join(output_path, "orientation", f"{ident}.png"),
                visualize_orientation(orientation, fg),
            )
        if (
            "orientations_instance" in predictions
            and "instance_segmentation" in predictions
        ):
            # per-instance overlay with arrows + degree text (reference
            # *_orientations / *_orientations_white_bg outputs)
            angles = np.asarray(predictions["orientations_instance"][b])
            valid = predictions.get("orientations_panoptic_instance_valid")
            inst_map = np.asarray(predictions["instance_segmentation"][b])
            present = set(np.unique(inst_map)) - {0}
            oris = {
                k + 1: float(angles[k])
                for k in range(angles.shape[0])
                if (k + 1) in present
                and (valid is None or bool(np.asarray(valid[b])[k]))
            }
            gen = _SHARED.get("instance")
            for suffix, kw in (
                ("orientations", dict(bg_color=0, bg_color_font="black")),
                ("orientations_white_bg",
                 dict(bg_color=255, bg_color_font="white")),
            ):
                _save_png(
                    os.path.join(output_path, suffix, f"{ident}.png"),
                    visualize_instance_orientations(
                        inst_map, oris, shared_color_generator=gen, **kw
                    ),
                )
        if "scene_class_idx" in predictions:
            scene_idx = int(predictions["scene_class_idx"][b]) + 1
            labels = dataset_config.scene_label_list
            meta = {
                "scene_class_idx": scene_idx,
                "scene_class_name": labels[scene_idx].class_name
                if scene_idx < len(labels) else str(scene_idx),
                "scene_class_score": float(
                    predictions["scene_class_score"][b]
                ),
            }
            path = os.path.join(output_path, "scene", f"{ident}.json")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                json.dump(meta, fh, indent=2)


def visualize_batches(
    batch: Dict[str, Any],
    output_path: str,
    dataset_config,
) -> None:
    """Write GT-side visualizations for a batch (reference
    `visualize_batches`)."""
    colors = dataset_config.semantic_label_list.colors_array
    identifiers = batch.get("identifier")
    rgb = batch.get("rgb")
    n = len(identifiers) if identifiers is not None else (
        rgb.shape[0] if rgb is not None else 0
    )
    for b in range(n):
        ident = (
            identifiers[b].to_filename()
            if identifiers is not None and hasattr(identifiers[b], "to_filename")
            else f"sample_{b:04d}"
        )
        if "semantic" in batch:
            _save_png(os.path.join(output_path, "gt_semantic", f"{ident}.png"),
                      visualize_semantic(np.asarray(batch["semantic"][b]),
                                         colors))
        if "instance" in batch:
            _save_png(os.path.join(output_path, "gt_instance", f"{ident}.png"),
                      visualize_instance(np.asarray(batch["instance"][b])))
        if "instance_center" in batch:
            _save_png(
                os.path.join(output_path, "gt_instance_center",
                             f"{ident}.png"),
                visualize_instance_center(
                    np.asarray(batch["instance_center"][b])
                ),
            )
        if "panoptic" in batch:
            _save_png(os.path.join(output_path, "gt_panoptic", f"{ident}.png"),
                      visualize_panoptic(np.asarray(batch["panoptic"][b]),
                                         dataset_config))
        if "instance" in batch and "orientations" in batch:
            oris = batch["orientations"][b] or {}
            gen = _SHARED.get("instance")
            for suffix, kw in (
                ("gt_orientations",
                 dict(bg_color=0, bg_color_font="black")),
                ("gt_orientations_white_bg",
                 dict(bg_color=255, bg_color_font="white")),
            ):
                _save_png(
                    os.path.join(output_path, suffix, f"{ident}.png"),
                    visualize_instance_orientations(
                        np.asarray(batch["instance"][b]),
                        {int(k): float(v) for k, v in oris.items()},
                        shared_color_generator=gen, **kw,
                    ),
                )
        if "depth" in batch:
            _save_png(os.path.join(output_path, "gt_depth", f"{ident}.png"),
                      visualize_depth(np.asarray(batch["depth"][b])))
