"""Batching / prefetching data loader feeding the TPU.

Replaces the reference's torch ``DataLoader`` with 24 worker processes +
pinned memory (``vo/dataset/vo_loader.py:200-218``): decode/augment runs on a
thread pool (cv2/PIL release the GIL), batches are collated into contiguous
numpy arrays, and ``device_prefetch`` keeps N batches in flight on-device so
host IO overlaps TPU compute.

``VoDataLoader`` mirrors the reference's config-gated multi-dataset assembly
(``vo/dataset/vo_loader.py:19-225``): each enabled source contributes its
train/valid/test datasets, concatenated.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import os
import itertools
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np


class ConcatDataset:
    """Concatenation of indexable datasets (torch ConcatDataset equivalent)."""

    def __init__(self, datasets: Sequence):
        self.datasets = [d for d in datasets if d is not None and len(d) > 0]
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1]) if self.datasets else 0

    def __getitem__(self, idx: int, rng=None):
        i = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[i].__getitem__(idx - int(self._offsets[i]), rng)


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of sample dicts into one batch dict of arrays."""
    batch = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        batch[key] = np.stack(vals, axis=0)
    return batch


class DataLoader:
    """Epoch iterator over an indexable dataset with threaded decode.

    Matches the reference loader semantics: shuffle per epoch, ``drop_last``
    for static batch shapes (mandatory on TPU), per-sample RNG derived from a
    seed so runs are reproducible (the reference uses unseeded
    ``random.randint``; seeding is an improvement, not a divergence).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self._epoch = 0
        self._skip_batches = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        """Deterministic sample order for the CURRENT epoch (shared across
        hosts: seeded by (seed, epoch) only). Multi-process runs slice it
        per host in ``__iter__``."""
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self._epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]
        return order

    def __iter__(self) -> Iterator[Dict]:
        order = self._epoch_order()
        local_bs = self.batch_size
        # Multi-host feeding (SPMD, one process per host): every process
        # computes the SAME global order, then loads only its contiguous
        # column of each global batch — batch b is the concatenation over
        # process_index of the local batches, so
        # ``jax.make_array_from_process_local_data`` in ``device_prefetch``
        # reassembles exactly the single-host batch.
        pc, pi = jax.process_count(), jax.process_index()
        if pc > 1:
            if self.batch_size % pc:
                raise ValueError(
                    f"global batch_size {self.batch_size} must divide by "
                    f"process_count {pc}"
                )
            local_bs = self.batch_size // pc
            order = (
                order[: (len(order) // self.batch_size) * self.batch_size]
                .reshape(-1, pc, local_bs)[:, pi]
                .reshape(-1)
            )
        self._epoch += 1

        def fetch(args):
            pos, idx = args
            # Per-sample rng keyed on the LOCAL position; include the
            # process index so no two hosts reuse an augmentation stream.
            sample_rng = np.random.default_rng(
                (self.seed, self._epoch, int(pi), int(pos))
            )
            return self.dataset.__getitem__(int(idx), sample_rng)

        start = getattr(self, "_skip_batches", 0) * local_bs
        if start:
            order = order[start:]
            self._skip_batches = 0

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            it = pool.map(
                fetch,
                ((start + i, idx) for i, idx in enumerate(order)),
                chunksize=4,
            )
            while True:
                chunk = list(itertools.islice(it, local_bs))
                if not chunk:
                    return
                if len(chunk) < local_bs and self.drop_last:
                    return
                yield collate(chunk)

    def skip_batches(self, n: int) -> None:
        """Fast-forward the NEXT epoch iteration by ``n`` batches (mid-epoch
        resume: the deterministic order makes this exact — the skipped
        prefix is the set of batches the interrupted run already consumed)."""
        self._skip_batches = int(n)


def device_prefetch(
    iterator: Iterable[Dict],
    sharding: Optional[Any] = None,
    size: int = 2,
) -> Iterator[Dict]:
    """Keep ``size`` batches resident on device ahead of the consumer.

    With a ``NamedSharding`` the batch is split over the mesh "data" axis.
    Single process: one ``device_put`` scatters the global batch over the
    local devices. Multi-process (one process per TPU host): the iterator
    yields this process's LOCAL column of the global batch
    (``DataLoader.__iter__`` process slicing) and
    ``jax.make_array_from_process_local_data`` assembles the global jax
    Array from the per-host shards — no cross-host data transfer.
    """
    queue: collections.deque = collections.deque()
    multiprocess = jax.process_count() > 1

    def put(batch: Dict) -> Dict:
        def _place(x):
            if isinstance(x, np.ndarray) and x.dtype == np.float64:
                x = x.astype(np.float32)
            if sharding is not None and isinstance(x, np.ndarray):
                if multiprocess:
                    return jax.make_array_from_process_local_data(sharding, x)
                return jax.device_put(x, sharding)
            return jax.device_put(x)

        return {k: _place(v) for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def denormalize_image(image: np.ndarray) -> np.ndarray:
    """[0,1] float image -> uint8 (reference ``vo/dataset/vo_loader.py:220-225``)."""
    return (np.clip(image, 0.0, 1.0) * 255.0).astype(np.uint8)


class VoDataLoader:
    """Config-gated multi-dataset VO loader (reference ``vo/dataset/vo_loader.py``).

    Exposes ``train_loader`` / ``valid_loader`` / ``test_loader`` plus the
    underlying concatenated datasets, and — under the ``Dataset.*.stereo``
    flags — ``train_stereo_loader`` / ``valid_stereo_loader`` over
    known-baseline pairs (``None`` when no stereo source is enabled). The
    reference assembles the same stereo loaders
    (``vo/dataset/vo_loader.py:76-107``) though its train loop never consumes
    them; here ``training.vo_trainer`` interleaves them into the epoch.
    """

    def __init__(self, config: Dict, root_dir: Optional[str] = None):
        t = config["Train"]
        self.batch_size = t["batch_size"]
        self.num_workers = t.get("num_workers", 8)
        self.seed = t.get("seed", 42)
        image_size = (t["img_h"], t["img_w"])

        train_sets: List = []
        valid_sets: List = []
        test_sets: List = []
        train_stereo_sets: List = []
        valid_stereo_sets: List = []

        if config["Dataset"].get("redwood", {}).get("mono", False):
            from deep_visual_slam_tpu.data.redwood import RedwoodDataHandler

            h = RedwoodDataHandler(config, root_dir=root_dir)
            train_sets.append(h.train_dataset)
            valid_sets.append(h.valid_dataset)
            test_sets.append(h.test_dataset)

        if config["Dataset"].get("mars_logger", {}).get("mono", False):
            from deep_visual_slam_tpu.data.handlers import MarsLoggerDataHandler

            h = MarsLoggerDataHandler(config, root_dir=root_dir)
            train_sets.append(h.train_dataset)
            valid_sets.append(h.valid_dataset)

        if config["Dataset"].get("custom_data", {}).get("mono", False):
            from deep_visual_slam_tpu.data.handlers import CustomRigDataset, _scene_dirs

            root = os.path.join(config["Directory"]["data_dir"], "custom_data")
            for fold, target, is_train in (
                ("train", train_sets, True), ("valid", valid_sets, False)
            ):
                scenes = []
                for scene in _scene_dirs(os.path.join(root, fold)):
                    try:
                        scenes.append(
                            CustomRigDataset(scene, image_size, is_train, is_train)
                        )
                    except Exception as e:
                        print(f"Warning: skipping custom scene {scene}: {e}")
                if scenes:
                    target.append(ConcatDataset(scenes))

        if config["Dataset"].get("custom_data", {}).get("stereo", False):
            from deep_visual_slam_tpu.data.handlers import (
                custom_stereo_dataset,
                _scene_dirs,
            )

            root = os.path.join(config["Directory"]["data_dir"], "custom_data")
            for fold, target, is_train in (
                ("train", train_stereo_sets, True),
                ("valid", valid_stereo_sets, False),
            ):
                for scene in _scene_dirs(os.path.join(root, fold)):
                    try:
                        target.append(
                            custom_stereo_dataset(scene, image_size, is_train)
                        )
                    except Exception as e:
                        print(f"Warning: skipping custom stereo {scene}: {e}")

        if config["Dataset"].get("irs", {}).get("mono", False):
            from deep_visual_slam_tpu.data.handlers import IrsDataset, _scene_dirs

            root = os.path.join(config["Directory"]["data_dir"], "irs")
            for fold, target, is_train in (
                ("train", train_sets, True), ("valid", valid_sets, False)
            ):
                scenes = []
                for scene in _scene_dirs(os.path.join(root, fold)):
                    try:
                        scenes.append(IrsDataset(scene, image_size, is_train, is_train))
                    except Exception as e:
                        print(f"Warning: skipping irs scene {scene}: {e}")
                if scenes:
                    target.append(ConcatDataset(scenes))

        if config["Dataset"].get("irs", {}).get("stereo", False):
            from deep_visual_slam_tpu.data.handlers import (
                irs_stereo_dataset,
                _scene_dirs,
            )

            root = os.path.join(config["Directory"]["data_dir"], "irs")
            for fold, target, is_train in (
                ("train", train_stereo_sets, True),
                ("valid", valid_stereo_sets, False),
            ):
                for scene in _scene_dirs(os.path.join(root, fold)):
                    try:
                        target.append(
                            irs_stereo_dataset(scene, image_size, is_train)
                        )
                    except Exception as e:
                        print(f"Warning: skipping irs stereo {scene}: {e}")

        # Packed-record source (TPU-native, data/packed.py): pre-resized
        # uint8 memmap shards written by scripts/pack_dataset.py. Layout:
        # <root>/{train,valid,test}/<scene>/{images.npy,meta.npz}.
        packed_cfg = config["Dataset"].get("packed", {})
        if packed_cfg.get("mono", False):
            from deep_visual_slam_tpu.data.packed import (
                PackedSnippetDataset,
                list_packed_scenes,
            )

            root = packed_cfg.get("root") or os.path.join(
                config["Directory"]["data_dir"], "packed"
            )
            for fold, target, is_train in (
                ("train", train_sets, True),
                ("valid", valid_sets, False),
                ("test", test_sets, False),
            ):
                scenes = [
                    PackedSnippetDataset(scene, image_size, is_train, is_train)
                    for scene in list_packed_scenes(os.path.join(root, fold))
                ]
                if scenes:
                    target.append(ConcatDataset(scenes))

        syn_cfg = config["Dataset"].get("synthetic", {})
        if syn_cfg.get("stereo", False):
            from deep_visual_slam_tpu.data.synthetic import SyntheticStereoDataset

            length = syn_cfg.get("length", 256)
            train_stereo_sets.append(
                SyntheticStereoDataset(image_size, length=length, seed=self.seed + 3)
            )
            valid_stereo_sets.append(
                SyntheticStereoDataset(
                    image_size,
                    length=max(length // 8, self.batch_size),
                    seed=self.seed + 4,
                    is_train=False,
                )
            )
        if syn_cfg.get("mono", False):
            from deep_visual_slam_tpu.data.synthetic import SyntheticVoDataset

            length = syn_cfg.get("length", 256)
            train_sets.append(
                SyntheticVoDataset(image_size, length=length, seed=self.seed)
            )
            valid_sets.append(
                SyntheticVoDataset(
                    image_size,
                    length=max(length // 8, self.batch_size),
                    seed=self.seed + 1,
                    is_train=False,
                )
            )
            test_sets.append(
                SyntheticVoDataset(
                    image_size,
                    length=max(length // 8, 4),
                    seed=self.seed + 2,
                    is_train=False,
                )
            )

        self.train_dataset = ConcatDataset(train_sets)
        self.valid_dataset = ConcatDataset(valid_sets)
        self.test_dataset = ConcatDataset(test_sets)

        # Train.device_augment: the triplet ColorJitter runs INSIDE the
        # jitted train step (training/augment.py) — turn the host-side
        # jitter off everywhere so it isn't applied twice. Every snippet
        # source gates its jitter on a ``.augment`` attribute.
        def _walk(ds, fn):
            if isinstance(ds, ConcatDataset):
                for d in ds.datasets:
                    _walk(d, fn)
            else:
                fn(ds)

        if t.get("device_augment", False):
            def _disable_host_augment(ds):
                if hasattr(ds, "augment"):
                    ds.augment = False

            _walk(self.train_dataset, _disable_host_augment)

        # Train.uint8_h2d: ship TRAIN batches as uint8 and scale on device
        # (training/steps.py) — 4x fewer H2D bytes, no host astype per
        # sample. Host jitter can't run on uint8, so it is forced off;
        # pair with Train.device_augment to keep the jitter semantics.
        if t.get("uint8_h2d", False):
            if not t.get("device_augment", False):
                print(
                    "Warning: Train.uint8_h2d without Train.device_augment "
                    "disables ColorJitter entirely (host jitter can't run "
                    "on uint8)"
                )

            # uint8_h2d is all-or-nothing: a ConcatDataset mixing uint8
            # snippet sources with f32 sources would hand collate() mixed
            # dtypes, and np.stack silently promotes the uint8 samples
            # (0..255) into an UNSCALED f32 batch — those samples would
            # train at 255x brightness with no error. If any train source
            # can't emit uint8, keep the whole train set f32.
            leaves: list = []
            _walk(self.train_dataset, leaves.append)
            unsupported = sorted(
                {type(d).__name__ for d in leaves
                 if not hasattr(d, "output_uint8")}
            )
            if unsupported:
                print(
                    "Warning: Train.uint8_h2d DISABLED — train sources "
                    f"without uint8 output: {', '.join(unsupported)} "
                    "(mixing uint8 and f32 samples in one batch would "
                    "silently train the uint8 ones unscaled)"
                )
            else:
                def _enable_uint8(ds):
                    ds.output_uint8 = True
                    ds.augment = False

                _walk(self.train_dataset, _enable_uint8)

        use_shuffle = t.get("use_shuffle", True)
        self.train_loader = DataLoader(
            self.train_dataset,
            self.batch_size,
            shuffle=use_shuffle,
            drop_last=True,
            num_workers=self.num_workers,
            seed=self.seed,
        )
        self.valid_loader = DataLoader(
            self.valid_dataset,
            self.batch_size,
            shuffle=False,
            drop_last=True,
            num_workers=self.num_workers,
            seed=self.seed,
        )
        self.test_loader = DataLoader(
            self.test_dataset,
            t.get("vis_batch_size", 1),
            shuffle=False,
            drop_last=True,
            num_workers=self.num_workers,
            seed=self.seed,
        )

        # Stereo stream (known-baseline pairs), when any source enables it.
        self.train_stereo_dataset = ConcatDataset(train_stereo_sets)
        self.valid_stereo_dataset = ConcatDataset(valid_stereo_sets)
        self.train_stereo_loader = (
            DataLoader(
                self.train_stereo_dataset,
                self.batch_size,
                shuffle=use_shuffle,
                drop_last=True,
                num_workers=self.num_workers,
                seed=self.seed + 10,
            )
            if len(self.train_stereo_dataset)
            else None
        )
        self.valid_stereo_loader = (
            DataLoader(
                self.valid_stereo_dataset,
                self.batch_size,
                shuffle=False,
                drop_last=True,
                num_workers=self.num_workers,
                seed=self.seed + 10,
            )
            if len(self.valid_stereo_dataset)
            else None
        )
