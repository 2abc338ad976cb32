from .config import MVAEOption, MVAE_OPT_REGISTRY
from .model import PoseMixtureVAE
from .dataset import (PoseSequenceDataset, phase_from_hits,
                      make_synthetic_pose_dataset, load_video_dataset,
                      write_video_dataset)
from .train import MVAETrainer

__all__ = [
    "MVAEOption", "MVAE_OPT_REGISTRY", "PoseMixtureVAE",
    "PoseSequenceDataset", "phase_from_hits", "make_synthetic_pose_dataset",
    "load_video_dataset", "write_video_dataset",
    "MVAETrainer",
]
