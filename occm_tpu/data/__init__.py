from occm_tpu.data.sampler import PFSampler, VOCODER_NAMES
from occm_tpu.data.datasets import (
    PFDataset,
    ASVDataset,
    ASVspoof2019TrainDataset,
    ASVspoof2021EvalDataset,
)
from occm_tpu.data.pipeline import MetaBatchPipeline, Prefetcher

__all__ = [
    "PFSampler",
    "VOCODER_NAMES",
    "PFDataset",
    "ASVDataset",
    "ASVspoof2019TrainDataset",
    "ASVspoof2021EvalDataset",
    "MetaBatchPipeline",
    "Prefetcher",
]
