from .torch_checkpoint import (
    load_torch_state_dict,
    footprint_params_from_state_dict,
    segmentor_params_from_state_dict,
)
from .torchvision_resnet import (
    download_imagenet_encoder_if_doesnt_exist,
    encoder_from_torchvision_state_dict,
    load_pretrained_encoder,
    resolve_pretrained_encoder,
)

__all__ = [
    "load_torch_state_dict",
    "footprint_params_from_state_dict",
    "segmentor_params_from_state_dict",
    "encoder_from_torchvision_state_dict",
    "load_pretrained_encoder",
    "download_imagenet_encoder_if_doesnt_exist",
    "resolve_pretrained_encoder",
]
