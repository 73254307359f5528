from nbss_tpu.data.sampler import BatchLoader, DistributedSampler
from nbss_tpu.data.synthetic import SyntheticDataset

__all__ = ["BatchLoader", "DistributedSampler", "SyntheticDataset"]
