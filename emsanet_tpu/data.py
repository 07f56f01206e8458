"""Data pipeline: samplers, loaders, DataHelper.

Reference: `emsanet/data.py:342-473` (DataHelper wrapping train/valid
DataLoaders with mt_collate, RandomSamplerSubset, per-camera validation
loaders, overfitting mode).

TPU-first differences: workers are a thread pool feeding a double-buffered
prefetch queue (host decode/augment overlaps device compute; the
reference relies on torch DataLoader processes), batches are fixed-shape
(train drops the last partial batch, validation pads it and carries a
`_valid_mask`), and arrays are NHWC numpy ready for `jax.device_put`.
"""

from __future__ import annotations



import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
from emsanet_tpu.datasets.base import SceneAnalysisDataset
from emsanet_tpu.datasets.registry import get_dataset
from emsanet_tpu.preprocessing.collate import batch_collate


class RandomSamplerSubset:
    """Random per-epoch subset sampler (SURVEY.md M8 'RandomSamplerSubset').

    subset: fraction (0, 1] of samples drawn each epoch, OR one fraction
    per concatenated dataset ('0.2:1.0' CLI syntax, args.py:865-881) with
    `section_lengths` giving the member dataset sizes. deterministic =
    same subset every epoch (args.py:867-881).
    """

    def __init__(
        self,
        n_samples: int,
        subset=1.0,
        deterministic: bool = False,
        seed: int = 0,
        section_lengths: Optional[Sequence[int]] = None,
    ):
        self.n_samples = n_samples
        fractions = (
            (float(subset),) if np.isscalar(subset) else tuple(subset)
        )
        if len(fractions) == 1:
            self.sections = ((0, n_samples, fractions[0]),)
        else:
            if section_lengths is None or len(section_lengths) != len(
                fractions
            ):
                raise ValueError(
                    f"{len(fractions)} subset fractions need "
                    f"{len(fractions)} concatenated datasets "
                    f"(got lengths {section_lengths})"
                )
            offsets = np.cumsum([0] + list(section_lengths))
            assert int(offsets[-1]) == n_samples
            self.sections = tuple(
                (int(offsets[i]), int(section_lengths[i]), fractions[i])
                for i in range(len(fractions))
            )
        self.subset = fractions[0] if len(fractions) == 1 else None
        self.deterministic = deterministic
        self.seed = seed

    @property
    def n_draw(self) -> int:
        return sum(
            max(int(round(n * frac)), 1) for _, n, frac in self.sections
        )

    def indices(self, epoch: int) -> np.ndarray:
        rng_seed = self.seed if self.deterministic else self.seed + epoch
        rng = np.random.default_rng(rng_seed)
        parts = []
        for offset, n, frac in self.sections:
            k = max(int(round(n * frac)), 1)
            parts.append(offset + rng.permutation(n)[:k])
        out = np.concatenate(parts)
        rng.shuffle(out)  # interleave datasets within the epoch
        return out


def _load_one(dataset: SceneAnalysisDataset, idx: int, rng_seed: int) -> dict:
    """Load + preprocess one sample with a deterministic per-sample rng."""
    sample = dataset.load_raw(idx)
    preprocessor = dataset.preprocessor
    if preprocessor is not None:
        sample["_rng"] = np.random.default_rng(rng_seed)
        sample = preprocessor(sample)
        sample.pop("_rng", None)
    return sample


# --- process-worker plumbing -------------------------------------------------
# ProcessPoolExecutor workers hold the dataset in a module global set by the
# pool initializer (fork start method: inherited copy-on-write, so the
# dataset is never pickled per task — only (idx, seed) goes over the pipe
# and the preprocessed sample comes back).
_WORKER_DATASET: Optional[SceneAnalysisDataset] = None


def _process_worker_init(dataset: SceneAnalysisDataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _load_one_in_worker(idx: int, rng_seed: int) -> dict:
    return _load_one(_WORKER_DATASET, idx, rng_seed)


class DataLoader:
    """Prefetching batch loader with thread or process workers.

    worker_mode:
      'thread'  (default) — sample loads go to a thread pool; the PIL
                decode and the ctypes native kernels release the GIL, but
                ~1/3 of the per-sample preprocessing holds it, so threads
                top out at ~3x (PARITY.md loader analysis).
      'process' — forked worker processes (the torch-DataLoader analog,
                reference data.py:342-398 n_workers). No GIL ceiling;
                pays one pickle round-trip per sample. The right mode on
                multi-core hosts feeding multi-chip training.
    """

    def __init__(
        self,
        dataset: SceneAnalysisDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        n_workers: int = 4,
        sampler: Optional[RandomSamplerSubset] = None,
        seed: int = 0,
        prefetch: int = 2,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # clamp to the cores actually available: on a 1-core host, worker
        # threads FIGHT the consumer over the GIL/cache (measured 9 vs 24
        # samples/s); threads only pay off when cores exist to run them
        try:
            n_cores = len(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            n_cores = os.cpu_count() or 1
        self.n_workers = max(min(n_workers, n_cores), 1)
        self.sampler = sampler
        self.seed = seed
        self.prefetch = prefetch
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"Unknown worker_mode '{worker_mode}'")
        import multiprocessing

        if worker_mode == "process" and (
            "fork" not in multiprocessing.get_all_start_methods()
        ):
            worker_mode = "thread"  # no fork (non-Linux): keep threads
        self.worker_mode = worker_mode

    def __len__(self) -> int:
        n = (
            self.sampler.n_draw
            if self.sampler is not None
            else len(self.dataset)
        )
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        if self.sampler is not None:
            return self.sampler.indices(epoch)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            return rng.permutation(len(self.dataset))
        return np.arange(len(self.dataset))

    def batches(self, epoch: int = 0) -> Iterator[Dict]:
        indices = self._epoch_indices(epoch)
        n = len(indices)
        n_batches = n // self.batch_size if self.drop_last else -(-n // self.batch_size)

        def make_batch(b: int) -> Dict:
            lo = b * self.batch_size
            idxs = indices[lo : lo + self.batch_size].tolist()
            n_real = len(idxs)
            # pad last batch to fixed shape (validation path)
            while len(idxs) < self.batch_size:
                idxs.append(idxs[-1])
            samples = [
                _load_one(
                    self.dataset, int(i),
                    rng_seed=(self.seed + epoch) * 1_000_003 + int(i),
                )
                for i in idxs
            ]
            batch = batch_collate(samples)
            batch["_valid_mask"] = np.arange(self.batch_size) < n_real
            return batch

        if self.n_workers <= 1 or n_batches <= 1:
            for b in range(n_batches):
                yield make_batch(b)
            return

        # Sample-level parallelism: individual _load_one calls go to the
        # pool (threads: GIL released in PIL decode + ctypes native
        # kernels; processes: forked workers, no GIL ceiling), a prefetch
        # window of whole batches stays in flight, and the consumer
        # thread collates completed batches in order.
        def submit(pool, i):
            seed_i = (self.seed + epoch) * 1_000_003 + int(i)
            if self.worker_mode == "process":
                return pool.submit(_load_one_in_worker, int(i), seed_i)
            return pool.submit(_load_one, self.dataset, int(i), seed_i)

        def batch_futures(pool, b):
            lo = b * self.batch_size
            idxs = indices[lo : lo + self.batch_size].tolist()
            n_real = len(idxs)
            while len(idxs) < self.batch_size:
                idxs.append(idxs[-1])
            return [submit(pool, i) for i in idxs], n_real

        if self.worker_mode == "process":
            import multiprocessing

            pool_cm = ProcessPoolExecutor(
                max_workers=self.n_workers,
                mp_context=multiprocessing.get_context("fork"),
                initializer=_process_worker_init,
                initargs=(self.dataset,),
            )
        else:
            pool_cm = ThreadPoolExecutor(max_workers=self.n_workers)

        with pool_cm as pool:
            window = self.prefetch + 1
            pending = [
                batch_futures(pool, b)
                for b in range(min(window, n_batches))
            ]
            next_submit = len(pending)
            for _ in range(n_batches):
                futs, n_real = pending.pop(0)
                samples = [f.result() for f in futs]
                if next_submit < n_batches:
                    pending.append(batch_futures(pool, next_submit))
                    next_submit += 1
                batch = batch_collate(samples)
                batch["_valid_mask"] = np.arange(self.batch_size) < n_real
                yield batch

    def __iter__(self):
        return self.batches(0)


class DataHelper:
    """Bundles train loader + per-camera validation loaders (data.py:342+)."""

    def __init__(
        self,
        dataset_train: SceneAnalysisDataset,
        dataset_valid: SceneAnalysisDataset,
        batch_size: int,
        valid_batch_size: int,
        n_workers: int = 4,
        subset_train=1.0,  # float or per-concatenated-dataset fractions
        subset_deterministic: bool = False,
        overfit_n_batches: int = -1,
        seed: int = 0,
        worker_mode: str = "thread",
    ):
        self.dataset_train = dataset_train
        self.dataset_valid = dataset_valid
        self.overfit_n_batches = overfit_n_batches

        sampler = None
        if overfit_n_batches > 0:
            # overfitting mode (data.py:400-436): fixed deterministic subset
            sampler = RandomSamplerSubset(
                len(dataset_train),
                subset=min(
                    overfit_n_batches * batch_size / max(len(dataset_train), 1),
                    1.0,
                ),
                deterministic=True,
                seed=seed,
            )
        else:
            fractions = (
                (float(subset_train),)
                if np.isscalar(subset_train)
                else tuple(subset_train)
            )
            if len(fractions) > 1 or fractions[0] < 1.0:
                # per-dataset fractions apply to the concat sections
                # (reference args.py:865-881 '0.2:1.0' syntax)
                section_lengths = (
                    [len(d) for d in dataset_train.datasets]
                    if hasattr(dataset_train, "datasets")
                    else None
                )
                sampler = RandomSamplerSubset(
                    len(dataset_train),
                    fractions if len(fractions) > 1 else fractions[0],
                    subset_deterministic,
                    seed,
                    section_lengths=section_lengths,
                )

        self.train_loader = DataLoader(
            dataset_train,
            batch_size=batch_size,
            shuffle=True,
            drop_last=True,
            n_workers=n_workers,
            sampler=sampler,
            seed=seed,
            worker_mode=worker_mode,
        )

        # per-camera validation loaders (data.py:483-487)
        import copy

        self.valid_loaders: Dict[str, DataLoader] = {}
        cameras = dataset_valid.cameras
        if len(cameras) <= 1:
            self.valid_loaders[cameras[0] if cameras else "default"] = (
                DataLoader(
                    dataset_valid, valid_batch_size, shuffle=False,
                    drop_last=False, n_workers=n_workers, seed=seed,
                )
            )
        else:
            for cam in cameras:
                ds = copy.deepcopy(dataset_valid).filter_camera(cam)
                self.valid_loaders[cam] = DataLoader(
                    ds, valid_batch_size, shuffle=False, drop_last=False,
                    n_workers=n_workers, seed=seed,
                )

    def set_train_preprocessor(self, preprocessor):
        self.dataset_train.preprocessor = preprocessor

    def set_valid_preprocessor(self, preprocessor):
        self.dataset_valid.preprocessor = preprocessor
        for loader in self.valid_loaders.values():
            loader.dataset.preprocessor = preprocessor


class TrainSubsetView:
    """Read-only view of a dataset restricted to fixed indices.

    Used by `--validation-on-train` to validate on the exact overfit
    training subset (through the eval preprocessor). Delegates sample
    access to a private base dataset instance; `preprocessor` assignment
    forwards to the base (the DataLoader sets it via `loader.dataset`).
    """

    def __init__(self, base: SceneAnalysisDataset, indices):
        self._base = base
        self._indices = np.asarray(indices, dtype=np.int64)

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, idx):
        return self._base[int(self._indices[idx])]

    def load_raw(self, idx):
        return self._base.load_raw(int(self._indices[idx]))

    @property
    def cameras(self):
        return self._base.cameras

    @property
    def config(self):
        return self._base.config

    @property
    def preprocessor(self):
        return self._base.preprocessor

    @preprocessor.setter
    def preprocessor(self, value):
        self._base.preprocessor = value

    def __getattr__(self, name):
        # any other dataset attribute (depth stats, label lists, ...);
        # private names raise to keep deepcopy/pickle reconstruction safe
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._base, name)


def get_datahelper(cfg: EMSANetConfig) -> DataHelper:
    """Factory mirroring `get_datahelper` (emsanet/data.py:476-498)."""
    dataset_train = get_dataset(cfg.data, cfg.model, cfg.data.split)
    if cfg.train.validation_on_train:
        # validate on the train split; restricted to the deterministic
        # overfit subset when overfit mode is active (the convergence proof)
        dataset_valid = get_dataset(cfg.data, cfg.model, cfg.data.split)
        if cfg.train.overfit_n_batches > 0:
            sampler = RandomSamplerSubset(
                len(dataset_train),
                subset=min(
                    cfg.train.overfit_n_batches * cfg.data.batch_size
                    / max(len(dataset_train), 1),
                    1.0,
                ),
                deterministic=True,
                seed=cfg.train.seed,
            )
            if len(dataset_valid.cameras) > 1:
                print("[emsanet-tpu] --validation-on-train: multi-camera "
                      "dataset; validating on the FULL train split "
                      "(per-camera subsetting unsupported)")
            else:
                dataset_valid = TrainSubsetView(
                    dataset_valid, np.sort(sampler.indices(0))
                )
    else:
        dataset_valid = get_dataset(
            cfg.data, cfg.model, cfg.data.validation_split
        )
    return DataHelper(
        dataset_train=dataset_train,
        dataset_valid=dataset_valid,
        batch_size=cfg.data.batch_size,
        valid_batch_size=cfg.data.validation_batch_size or cfg.data.batch_size,
        n_workers=cfg.data.n_workers,
        subset_train=cfg.data.subset_train,
        subset_deterministic=cfg.data.subset_deterministic,
        overfit_n_batches=cfg.train.overfit_n_batches,
        seed=cfg.train.seed,
        worker_mode=cfg.data.worker_mode,
    )
