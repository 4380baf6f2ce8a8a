from .base import FootprintsDataset
from .kitti import KITTIDataset
from .matterport import MatterportDataset
from .inference import (
    InferenceDataset,
    KITTIInferenceDataset,
    MatterportInferenceDataset,
)
from .loader import DataLoader, DevicePrefetcher

_DATASETS = {"kitti": KITTIDataset, "matterport": MatterportDataset}
_INFERENCE_DATASETS = {
    "kitti": KITTIInferenceDataset,
    "matterport": MatterportInferenceDataset,
}


def get_dataset_class(name: str):
    """Training-dataset registry (reference: datasets/__init__.py:13-30)."""
    try:
        return _DATASETS[name]
    except KeyError:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(_DATASETS)}")


def get_inference_dataset_class(name: str):
    try:
        return _INFERENCE_DATASETS[name]
    except KeyError:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(_INFERENCE_DATASETS)}")


__all__ = [
    "FootprintsDataset",
    "KITTIDataset",
    "MatterportDataset",
    "InferenceDataset",
    "KITTIInferenceDataset",
    "MatterportInferenceDataset",
    "DataLoader",
    "DevicePrefetcher",
    "get_dataset_class",
    "get_inference_dataset_class",
]
