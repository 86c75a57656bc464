"""dffx.data — dataset readers, augmentation, EXR codec, input pipeline."""

from dffx.data.datasets import (
    DDFFBenchmark,
    DDFFTrainval,
    DefocusNetDataset,
    FlyingThings3DDataset,
    HCIDataset,
    MiddleburyDataset,
    RealScenesDataset,
    SmartphoneDataset,
    ddff_focus_dists,
)
from dffx.data.pipeline import Loader, device_prefetch
from dffx.data.simulated import SimulatedScenesDataset

__all__ = [
    "DDFFBenchmark",
    "DDFFTrainval",
    "DefocusNetDataset",
    "FlyingThings3DDataset",
    "HCIDataset",
    "MiddleburyDataset",
    "RealScenesDataset",
    "SmartphoneDataset",
    "ddff_focus_dists",
    "Loader",
    "SimulatedScenesDataset",
    "device_prefetch",
]
