"""Cross-host per-epoch global reshuffle (VERDICT r03 item 5).

The reference's ``DistributedSampler`` re-permutes the GLOBAL dataset
every epoch (``hydragnn/preprocess/load_data.py:264-282``, ``set_epoch``)
and DDStore lets any rank fetch any sample
(``hydragnn/utils/datasets/distdataset.py:229-343``).  The r02/r03 design
(``parallel/runtime.py:shard_samples_for_host``) fixed each host's
samples once with seed 43 forever, making cross-host reshuffling
impossible.  This module closes that divergence:

``DistributedShuffleView`` wraps any random-access dataset — an
in-memory sample list, or a ``GraphContainerDataset`` over ALL shard
directories on a shared filesystem (lazy mmap reads mean "any rank
fetches any sample" costs one page-in, the DDStore get semantics) — and
exposes this rank's slice of a fresh epoch-seeded global permutation.
``PaddedBatcher`` detects the view and delegates ``set_epoch`` so the
existing trainer loop (``train/loop.py``) drives the reshuffle with no
further wiring.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class _Subset:
    """Random-access restriction of a dataset to fixed global indices
    (a size bucket's global members)."""

    def __init__(self, dataset: Sequence, indices):
        self.base = dataset
        self.indices = np.asarray(indices, np.int64)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.base[int(self.indices[int(i)])]

    def __iter__(self):
        for i in range(len(self.indices)):
            yield self[i]


class DistributedShuffleView:
    """This rank's view of an epoch-seeded global permutation.

    Epoch ``e``'s assignment: ``perm = default_rng(seed + e).permutation
    (N)`` split into ``world`` contiguous near-equal chunks (the
    reference's DistributedSampler padding-free variant); rank ``r``
    serves chunk ``r``.  Every global sample appears on exactly one rank
    per epoch, and the rank -> sample assignment changes every epoch.

    ``dataset`` needs only ``__len__`` + ``__getitem__``; pass a
    ``GraphContainerDataset`` over all shard dirs for lazy shared-FS
    reads, or a plain list.  ``subset`` restricts the permutation to
    fixed global indices (size-bucket composition — each bucket
    reshuffles globally within itself, data/batching.py
    BucketedBatcher)."""

    def __init__(
        self,
        dataset: Sequence,
        world: Optional[int] = None,
        rank: Optional[int] = None,
        seed: int = 43,
        subset=None,
    ):
        if world is None or rank is None:
            import jax

            world = jax.process_count() if world is None else world
            rank = jax.process_index() if rank is None else rank
        assert 0 <= rank < world
        if subset is not None:
            dataset = _Subset(dataset, subset)
        self.dataset = dataset
        self.world = int(world)
        self.rank = int(rank)
        self.seed = int(seed)
        self._n_global = len(dataset)
        # constant local length across epochs (jit-stable batch counts):
        # the first `m` ranks get one extra sample
        k, m = divmod(self._n_global, self.world)
        self._local_n = k + (1 if self.rank < m else 0)
        self._start = self.rank * k + min(self.rank, m)
        self._epoch = None
        self._local = None
        self.set_epoch(0)

    def set_epoch(self, epoch: int):
        if epoch == self._epoch:
            return
        perm = np.random.default_rng(self.seed + int(epoch)).permutation(
            self._n_global
        )
        self._local = perm[self._start : self._start + self._local_n]
        self._epoch = int(epoch)

    def global_indices(self) -> np.ndarray:
        """This epoch's global sample ids served by this rank."""
        return self._local.copy()

    def __len__(self) -> int:
        return self._local_n

    def __getitem__(self, i: int):
        if isinstance(i, (int, np.integer)):
            return self.dataset[int(self._local[i])]
        raise TypeError(f"integer index required, got {type(i)}")

    def __iter__(self):
        for i in range(self._local_n):
            yield self[i]
