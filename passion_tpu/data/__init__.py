"""Data layer: transforms, datasets, loader, preprocessing, synthetic data."""

from passion_tpu.data.datasets import (  # noqa: F401
    BratsTest,
    BratsTrainIDT,
    BratsTrainPDT,
    BratsVal,
)
from passion_tpu.data.loader import PrefetchLoader  # noqa: F401
from passion_tpu.data.samplers import (  # noqa: F401
    CycleSampler,
    MSampler,
    RandomCycleIter,
    RandomSampler,
)
