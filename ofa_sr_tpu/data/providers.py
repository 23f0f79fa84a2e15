"""Data providers: datasets + deterministic loaders feeding NHWC batches.

Replaces the reference's DataProvider subclasses + vendored PyTorch
DataLoader (SURVEY.md §2.4). Semantics preserved:

- fixed split seeds SUB_SEED/VALID_SEED and the torch.randperm-based valid
  split (base_provider.py:17-56) — torch is used host-side only, to keep the
  split indices bit-identical with the reference;
- per-epoch deterministic shuffle (seed = epoch, like DistributedSampler /
  MyDistributedSampler, base_provider.py:106-132);
- multi-host sharding by rank-strided indices;
- elastic resolution sampled per batch from a seed folded from
  (batch_id, epoch) (MyRandomResizedCrop.sample_image_size,
  base_provider.py:95-103) — a plain object here, not class statics;
- BN-calibration subset loader (build_sub_train_loader, imagenet.py:198).

The loader is a thread-pool prefetcher (images decode on host threads while
the TPU runs the previous step); the C++ decode path can slot in underneath
without changing this API.
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .datasets import PairedImageDataset, SRImageDataset, SyntheticSRDataset
from .transforms import (
    CenterCrop,
    Compose,
    ModCrop,
    RandomCrop,
    RandomHorizontalFlip,
    RandomRotation,
)


class ElasticResolution:
    """Synchronized randomized train resolution (MyRandomResizedCrop
    statics, base_provider.py:65-103, as an explicit object)."""

    def __init__(self, image_size_list: Sequence[int], continuous=False,
                 sync_distributed=True):
        self.image_size_list = sorted(int2(image_size_list))
        self.continuous = continuous
        self.sync_distributed = sync_distributed

    def candidates(self) -> List[int]:
        if self.continuous:
            lo, hi = min(self.image_size_list), max(self.image_size_list)
            return [i for i in range(lo, hi + 1) if i % 4 == 0]
        return list(self.image_size_list)

    def sample(self, batch_id: int, epoch: int) -> int:
        """seed = int('%d%.3d' % (batch_id, epoch)) when synchronized
        (base_provider.py:95-103)."""
        if self.sync_distributed:
            seed = int("%d%.3d" % (batch_id, epoch))
        else:
            seed = random.randrange(2 ** 31)
        return random.Random(seed).choice(self.candidates())


def int2(v):
    return [v] if isinstance(v, int) else list(v)


def _valid_split_indices(train_size: int, valid_size: int):
    """Bit-identical with the reference split (base_provider.py:46-56)."""
    import torch
    g = torch.Generator()
    g.manual_seed(DataProvider.VALID_SEED)
    rand_indexes = torch.randperm(train_size, generator=g).tolist()
    return rand_indexes[valid_size:], rand_indexes[:valid_size]


def _sub_sample_indices(train_size: int, n_images: int):
    """BN-calibration subset (imagenet.py:198 uses SUB_SEED randperm)."""
    import torch
    g = torch.Generator()
    g.manual_seed(DataProvider.SUB_SEED)
    return torch.randperm(train_size, generator=g).tolist()[:n_images]


class Loader:
    """Deterministic, sharded, prefetching batch iterator.

    Each epoch: indices shuffled with seed=epoch (when shuffle), rank-strided
    across `num_replicas` hosts, batched; each sample's random transform rng
    is seeded from (epoch, index) so results are independent of worker
    scheduling — unlike the reference's global `random` in torchvision.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle=False,
                 drop_last=False, num_replicas=1, rank=0, num_workers=8,
                 indices: Optional[Sequence[int]] = None, epoch=0,
                 per_batch_setting=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_replicas = num_replicas
        self.rank = rank
        self.num_workers = num_workers
        self.indices = list(indices) if indices is not None else list(range(len(dataset)))
        self.epoch = epoch
        # (batch_id, epoch) -> kwargs for dataset.__getitem__, applied to a
        # whole batch — the elastic-resolution hook (my_data_loader.py:146
        # calls MyRandomResizedCrop.sample_image_size before collating)
        self.per_batch_setting = per_batch_setting

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> List[int]:
        idx = list(self.indices)
        if self.shuffle:
            rng = np.random.RandomState(self.epoch)
            idx = [idx[i] for i in rng.permutation(len(idx))]
        if self.num_replicas > 1:
            # pad to divisible then rank-stride (MyDistributedSampler,
            # base_provider.py:106-132)
            n = -(-len(idx) // self.num_replicas) * self.num_replicas
            idx = (idx + idx[: n - len(idx)])[self.rank::self.num_replicas]
        return idx

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = self._epoch_indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def load_one(i, setting):
            rng = random.Random(self.epoch * 1_000_003 + i)
            return self.dataset.__getitem__(i, rng=rng, **setting)

        def setting_for(batch_id):
            if self.per_batch_setting is None:
                return {}
            return self.per_batch_setting(batch_id, self.epoch)

        def collate(samples):
            keys = samples[0].keys()
            return {k: np.stack([s[k] for s in samples]) for k in keys}

        if self.num_workers <= 1:
            for bid, b in enumerate(batches):
                st = setting_for(bid)
                yield collate([load_one(i, st) for i in b])
            return

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            def submit(bid, b):
                st = setting_for(bid)
                return pool.map(lambda i: load_one(i, st), b)

            pending = []
            it = iter(enumerate(batches))
            # keep a 2-batch prefetch window
            for _ in range(2):
                nb = next(it, None)
                if nb is not None:
                    pending.append(submit(*nb))
            while pending:
                done = pending.pop(0)
                nb = next(it, None)
                if nb is not None:
                    pending.append(submit(*nb))
                yield collate(list(done))


class DataProvider:
    """Base provider (reference base_provider.py:17-62)."""

    SUB_SEED = 937162211
    VALID_SEED = 2147483647

    @staticmethod
    def name():
        raise NotImplementedError

    @property
    def data_shape(self):
        raise NotImplementedError


class _SRFolderProvider(DataProvider):
    """Shared machinery for the three SR providers."""

    def __init__(self, root, *, train_batch_size=16, test_batch_size=1,
                 valid_size=None, image_size=96, num_replicas=1, rank=0,
                 num_workers=8, train_transform=None, valid_transform=None,
                 numeric_sort=False, dataset_cls=SRImageDataset):
        import os
        self.root = root
        self.image_size = image_size
        self._train_ds = dataset_cls(os.path.join(root, "train"),
                                     transform=train_transform,
                                     numeric_sort=numeric_sort)
        self._valid_ds = dataset_cls(os.path.join(root, "val"),
                                     transform=valid_transform,
                                     numeric_sort=numeric_sort)

        train_indices, valid_indices = None, None
        if valid_size is not None:
            train_indices, valid_indices = _valid_split_indices(
                len(self._train_ds), valid_size)

        self.train = Loader(self._train_ds, train_batch_size, shuffle=True,
                            drop_last=True, num_replicas=num_replicas,
                            rank=rank, num_workers=num_workers,
                            indices=train_indices)
        if valid_indices is not None:
            self.valid = Loader(self._train_ds, test_batch_size,
                                num_workers=num_workers, indices=valid_indices)
        else:
            self.valid = Loader(self._valid_ds, test_batch_size,
                                num_workers=num_workers)
        # test loader: bs=1, sequential (train_*_sr_simple.py:166,
        # oracle_video.py:97-98)
        self.test = Loader(self._valid_ds, test_batch_size,
                           num_workers=num_workers)

    @property
    def data_shape(self):
        return (self.image_size, self.image_size, 3)

    def build_sub_train_loader(self, n_images, batch_size, num_workers=None):
        """Calibration subset for BN recalibration (SUB_SEED contract)."""
        idx = _sub_sample_indices(len(self._train_ds), n_images)
        return Loader(self._train_ds, batch_size, indices=idx,
                      num_workers=num_workers or self.train.num_workers)


class Div2KSetXXProvider(_SRFolderProvider):
    """DIV2K train / Set5+Set14 val (reference Div2K_SetXXDataProvider,
    div2k_setxx.py:17-249: RandomCrop(96)+flip+rot90 train, ModCrop(4) val).

    use_native=True swaps the train loader for the C++ threaded pipeline
    (csrc/loader; same transform semantics, own deterministic RNG) — the
    PIL path stays the bit-parity reference for evaluation."""

    DEFAULT_PATH = "/SSD/div2k_setxx"

    def __init__(self, root=None, image_size=96, use_native=False, **kw):
        root = root or self.DEFAULT_PATH
        super().__init__(
            root,
            image_size=image_size,
            train_transform=Compose([RandomCrop(image_size),
                                     RandomHorizontalFlip(),
                                     RandomRotation(90)]),
            valid_transform=Compose([ModCrop(4)]),
            **kw)
        if use_native:
            from .native import NativeSRLoader, native_available
            if native_available():
                self.train = NativeSRLoader(
                    self._train_ds.paths, crop=image_size,
                    batch_size=self.train.batch_size,
                    augment=True, n_threads=self.train.num_workers)

    @staticmethod
    def name():
        return "div2k_setxx"


class OracleVideoProvider(_SRFolderProvider):
    """Video-frame dirs, numerically sorted, CenterCrop train & valid
    (reference Oracle_VideoDataProvider, oracle_video.py:18-200)."""

    DEFAULT_PATH = "/SSD/kaist_paper_video_dataset"

    def __init__(self, root=None, image_size=448, **kw):
        root = root or self.DEFAULT_PATH
        super().__init__(
            root,
            image_size=image_size,
            train_transform=Compose([CenterCrop(image_size)]),
            valid_transform=Compose([CenterCrop(image_size)]),
            numeric_sort=True,
            **kw)

    @staticmethod
    def name():
        return "oracle_video"


class CodecDecoderProvider(_SRFolderProvider):
    """Precomputed codec-decoded LR / pristine HR pairs (reference
    Codec_DecoderDataProvider, codec_decoder.py:18-200)."""

    DEFAULT_PATH = "/SSD/uvg-1080p"

    def __init__(self, root=None, image_size=448, **kw):
        root = root or self.DEFAULT_PATH
        super().__init__(
            root,
            image_size=image_size,
            train_transform=None,
            valid_transform=None,
            numeric_sort=True,
            dataset_cls=_paired_cls(),
            **kw)

    @staticmethod
    def name():
        return "codec_decoder"


def _paired_cls():
    class _Paired(PairedImageDataset):
        def __init__(self, root, transform=None, numeric_sort=True):
            super().__init__(root, transform=transform, numeric_sort=numeric_sort)
    return _Paired


class SyntheticSRProvider(DataProvider):
    """Synthetic provider for tests and benchmarks."""

    def __init__(self, n_train=64, n_valid=8, hr_size=96, train_batch_size=16,
                 test_batch_size=1, num_replicas=1, rank=0, seed=0):
        self.image_size = hr_size
        self._train_ds = SyntheticSRDataset(n_train, hr_size, seed)
        self._valid_ds = SyntheticSRDataset(n_valid, hr_size, seed + 1)
        self.train = Loader(self._train_ds, train_batch_size, shuffle=True,
                            drop_last=True, num_replicas=num_replicas,
                            rank=rank, num_workers=1)
        self.valid = Loader(self._valid_ds, test_batch_size, num_workers=1)
        self.test = self.valid

    @staticmethod
    def name():
        return "synthetic_sr"

    @property
    def data_shape(self):
        return (self.image_size, self.image_size, 3)

    def build_sub_train_loader(self, n_images, batch_size, num_workers=None):
        idx = _sub_sample_indices(len(self._train_ds), n_images)
        return Loader(self._train_ds, batch_size, indices=idx, num_workers=1)
