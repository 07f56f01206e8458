"""Dataset abstraction: label lists, configs, sample contract.

TPU-native equivalent of `nicr_scene_analysis_datasets.dataset_base`
(SURVEY.md D1): `SemanticLabel` (class_name, is_thing, use_orientations,
color), `SemanticLabelList` with the `*_without_void` views and mask
accessors, scene label lists, per-dataset depth statistics, and
`DatasetConfig` bundling them.

Samples are plain dicts of numpy arrays (the JAX-side pipeline keeps all
heavy work in numpy on host and jnp on device):

    rgb        HWC uint8
    depth      HW uint16/float32 (raw sensor units, e.g. millimeters)
    semantic   HW uint8/int32 (0 = void)
    instance   HW int32 (0 = no instance)
    orientations  dict {instance_id: yaw_rad}
    scene      int
    normal     HWC float32 (unit vectors)
    identifier SampleIdentifier (tuple of path components)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class SampleIdentifier(tuple):
    """Hierarchical sample identifier (e.g. ('test', '0001')).

    Mirrors `nicr_scene_analysis_datasets` SampleIdentifier: a tuple of
    path components joinable into a filename.
    """

    def to_filename(self, separator: str = "__") -> str:
        return separator.join(self)


@dataclass(frozen=True)
class SemanticLabel:
    class_name: str
    is_thing: bool = False
    use_orientations: bool = False
    color: Tuple[int, int, int] = (0, 0, 0)


class SemanticLabelList:
    """Ordered label list; index 0 is conventionally void."""

    def __init__(self, labels: Sequence[SemanticLabel]):
        self._labels: Tuple[SemanticLabel, ...] = tuple(labels)

    def __len__(self) -> int:
        return len(self._labels)

    def __iter__(self) -> Iterator[SemanticLabel]:
        return iter(self._labels)

    def __getitem__(self, idx: int) -> SemanticLabel:
        return self._labels[idx]

    def index(self, class_name: str) -> int:
        for i, lab in enumerate(self._labels):
            if lab.class_name == class_name:
                return i
        raise ValueError(f"No label named '{class_name}'")

    def add_label(self, label: SemanticLabel) -> "SemanticLabelList":
        return SemanticLabelList(self._labels + (label,))

    @property
    def class_names(self) -> Tuple[str, ...]:
        return tuple(l.class_name for l in self._labels)

    @property
    def classes_is_thing(self) -> Tuple[bool, ...]:
        return tuple(l.is_thing for l in self._labels)

    @property
    def classes_use_orientations(self) -> Tuple[bool, ...]:
        return tuple(l.use_orientations for l in self._labels)

    @property
    def colors(self) -> Tuple[Tuple[int, int, int], ...]:
        return tuple(l.color for l in self._labels)

    @property
    def colors_array(self) -> np.ndarray:
        return np.asarray(self.colors, dtype=np.uint8)

    def without_void(self) -> "SemanticLabelList":
        return SemanticLabelList(self._labels[1:])


@dataclass(frozen=True)
class DepthStats:
    min: float
    max: float
    mean: float
    std: float


@dataclass
class DatasetConfig:
    """Static per-dataset metadata (reference `DatasetConfig`, SURVEY.md D1)."""

    semantic_label_list: SemanticLabelList
    scene_label_list: SemanticLabelList
    depth_stats: DepthStats

    @property
    def semantic_label_list_without_void(self) -> SemanticLabelList:
        return self.semantic_label_list.without_void()

    @property
    def scene_label_list_without_void(self) -> SemanticLabelList:
        return self.scene_label_list.without_void()

    @property
    def n_semantic_classes_without_void(self) -> int:
        return len(self.semantic_label_list) - 1

    @property
    def n_scene_classes_without_void(self) -> int:
        return len(self.scene_label_list) - 1


def build_dataset_config(
    semantic_label_list: SemanticLabelList,
    scene_label_list: SemanticLabelList,
    depth_stats: DepthStats,
) -> DatasetConfig:
    return DatasetConfig(
        semantic_label_list=semantic_label_list,
        scene_label_list=scene_label_list,
        depth_stats=depth_stats,
    )


def generate_distinct_colors(n: int, seed: int = 0) -> List[Tuple[int, int, int]]:
    """Deterministic visually-distinct colormap (reference
    `utils.img.get_visual_distinct_colormap`, SURVEY.md D5)."""
    colors: List[Tuple[int, int, int]] = []
    golden = 0.6180339887498949
    h = seed * golden % 1.0
    for i in range(n):
        h = (h + golden) % 1.0
        s = 0.55 + 0.35 * ((i * 7) % 3) / 2.0
        v = 0.65 + 0.3 * ((i * 5) % 2)
        # hsv -> rgb
        hh = h * 6.0
        c = v * s
        x = c * (1 - abs(hh % 2 - 1))
        m = v - c
        r, g, b = [
            (c, x, 0), (x, c, 0), (0, c, x), (0, x, c), (x, 0, c), (c, 0, x)
        ][int(hh) % 6]
        colors.append(
            (int((r + m) * 255), int((g + m) * 255), int((b + m) * 255))
        )
    return colors


class SceneAnalysisDataset:
    """Base class for map-style sample-dict datasets (SURVEY.md D2).

    Subclasses implement `__len__` and `_load(idx) -> dict`. The
    `preprocessor` attribute (a callable dict -> dict) is applied on
    access, mirroring the reference's `.preprocessor` setter
    (emsanet/data.py:451-459). `filter_camera` narrows the sample list to
    one camera (per-camera validation, emsanet/data.py:483-487).
    """

    def __init__(
        self,
        sample_keys: Sequence[str],
        use_cache: bool = False,
    ):
        self.sample_keys = tuple(sample_keys)
        self.preprocessor = None
        self._use_cache = use_cache
        self._cache: Dict[int, dict] = {}

    # -- to implement -------------------------------------------------------
    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def _load(self, idx: int) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def config(self) -> DatasetConfig:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def cameras(self) -> Tuple[str, ...]:
        return ("default",)

    @property
    def camera(self) -> Optional[str]:
        return getattr(self, "_camera", None)

    def filter_camera(self, camera: str) -> "SceneAnalysisDataset":
        self._camera = camera
        return self

    # -- shared -------------------------------------------------------------
    def load_raw(self, idx: int) -> dict:
        """Load a sample without applying the preprocessor (cache-aware).

        Thread-safe: no shared mutable state beyond the append-only cache.
        """
        if self._use_cache and idx in self._cache:
            return {
                k: (v.copy() if isinstance(v, np.ndarray) else v)
                for k, v in self._cache[idx].items()
            }
        sample = self._load(idx)
        if self._use_cache:
            self._cache[idx] = {
                k: (v.copy() if isinstance(v, np.ndarray) else v)
                for k, v in sample.items()
            }
        return sample

    def __getitem__(self, idx: int) -> dict:
        sample = self.load_raw(idx)
        if self.preprocessor is not None:
            sample = self.preprocessor(sample)
        return sample

    @property
    def depth_mean(self) -> float:
        return self.config.depth_stats.mean

    @property
    def depth_std(self) -> float:
        return self.config.depth_stats.std

    def semantic_compute_class_weights(
        self,
        weight_mode: str = "median-frequency",
        c: float = 1.02,
        n_threads: int = 1,
        debug: bool = False,
    ) -> np.ndarray:
        """Per-class weights for the semantic CE loss (SURVEY.md D2/R7).

        median-frequency: w_c = median(freq) / freq_c
        logarithmic:      w_c = 1 / ln(c + p_c)
        Void (class 0) is excluded; returns weights for classes 1..C.
        """
        n_classes = len(self.config.semantic_label_list)
        counts = np.zeros(n_classes, dtype=np.int64)
        pixel_totals = np.zeros(n_classes, dtype=np.int64)
        had_preprocessor = self.preprocessor
        self.preprocessor = None
        try:
            for i in range(len(self)):
                sem = self._load(i)["semantic"]
                binc = np.bincount(sem.reshape(-1), minlength=n_classes)
                pixel_totals += binc[:n_classes]
                counts += (binc[:n_classes] > 0).astype(np.int64)
        finally:
            self.preprocessor = had_preprocessor

        pixel_totals = pixel_totals[1:]
        counts = np.maximum(counts[1:], 1)
        if weight_mode == "none":
            return np.ones(n_classes - 1, dtype=np.float32)
        if weight_mode == "median-frequency":
            freq = pixel_totals / counts
            freq = np.maximum(freq, 1)
            return (np.median(freq) / freq).astype(np.float32)
        if weight_mode == "logarithmic":
            p = pixel_totals / max(pixel_totals.sum(), 1)
            return (1.0 / np.log(c + p)).astype(np.float32)
        if weight_mode == "linear":
            p = pixel_totals / max(pixel_totals.sum(), 1)
            return (1.0 - p).astype(np.float32)
        raise ValueError(f"Unknown class weighting '{weight_mode}'")


class ConcatDataset(SceneAnalysisDataset):
    """Concatenation of datasets sharing a sample contract (data.py:338-339)."""

    def __init__(self, datasets: Sequence[SceneAnalysisDataset]):
        assert datasets
        super().__init__(sample_keys=datasets[0].sample_keys)
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    @property
    def config(self) -> DatasetConfig:
        return self.datasets[0].config

    @property
    def cameras(self) -> Tuple[str, ...]:
        cams: List[str] = []
        for d in self.datasets:
            cams.extend(d.cameras)
        return tuple(dict.fromkeys(cams))

    def _load(self, idx: int) -> dict:
        ds_idx = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds_idx]._load(idx - int(self._offsets[ds_idx]))

    def semantic_compute_class_weights(self, *args, **kwargs) -> np.ndarray:
        # weight by first dataset's label space over all member datasets
        weights = [
            d.semantic_compute_class_weights(*args, **kwargs)
            for d in self.datasets
        ]
        max_len = max(len(w) for w in weights)
        acc = np.zeros(max_len, dtype=np.float64)
        cnt = np.zeros(max_len, dtype=np.int64)
        for w in weights:
            acc[: len(w)] += w
            cnt[: len(w)] += 1
        return (acc / np.maximum(cnt, 1)).astype(np.float32)
