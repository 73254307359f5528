"""DataModule base: stage-wise loaders over (index, seed) samplers.

The TPU-native analogue of the reference's LightningDataModule subclasses
(e.g. sms_wsj_plus.py:254-413): four stages (train/val/test/predict) with
per-stage datasets, batch sizes, clip lengths and seeds. Sharding across
hosts uses jax.process_index/count (per-host data loading for multi-host
data parallelism); the reference's fixed stage seeds ([None, 2, 3, 3] — None
meaning "fresh randomness per run") are the defaults here too.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from nbss_tpu.data.sampler import BatchLoader, DistributedSampler

STAGES = ("train", "val", "test", "predict")


@dataclass
class DataModule:
    batch_size: Tuple[int, ...] = (2, 1)
    seeds: Tuple[Optional[int], ...] = (None, 2, 3, 3)
    num_replicas: Optional[int] = None  # default: jax process count
    rank: Optional[int] = None
    # threaded item fetch + batch prefetch by default so the accelerator
    # step overlaps host IO/synthesis (the reference defaults to 10 worker
    # processes; 0 disables for strictly-serial debugging)
    num_workers: int = 2

    def _make_dataset(self, stage_idx: int):
        raise NotImplementedError

    def _stage_batch_size(self, stage_idx: int) -> int:
        if stage_idx < len(self.batch_size):
            return self.batch_size[stage_idx]
        return 1  # test / predict default to batch 1 (full-length utterances)

    def _loader(self, stage_idx: int, epoch: int = 0, shuffle: Optional[bool] = None):
        ds = self._make_dataset(stage_idx)
        seed = self.seeds[stage_idx] if stage_idx < len(self.seeds) else 2
        if seed is None:
            seed = secrets.randbits(31)
        sampler = DistributedSampler(
            len(ds),
            seed=seed,
            shuffle=(stage_idx == 0) if shuffle is None else shuffle,
            num_replicas=self.num_replicas or jax.process_count(),
            rank=self.rank if self.rank is not None else jax.process_index(),
            last_epoch=epoch,
        )
        if self.num_workers and self.num_workers > 0:
            from nbss_tpu.data.prefetch import ThreadedLoader

            return ThreadedLoader(ds, self._stage_batch_size(stage_idx), sampler,
                                  num_workers=self.num_workers,
                                  drop_last=(stage_idx == 0))
        return BatchLoader(ds, self._stage_batch_size(stage_idx), sampler,
                           drop_last=(stage_idx == 0))

    def train_dataloader(self, epoch: int = 0):
        return self._loader(0, epoch)

    def val_dataloader(self, epoch: int = 0):
        return self._loader(1, epoch)

    def test_dataloader(self):
        return self._loader(2)

    def predict_dataloader(self):
        return self._loader(3)
