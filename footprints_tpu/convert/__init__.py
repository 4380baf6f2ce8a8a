from .torch_checkpoint import (
    load_torch_state_dict,
    footprint_params_from_state_dict,
    segmentor_params_from_state_dict,
)

__all__ = [
    "load_torch_state_dict",
    "footprint_params_from_state_dict",
    "segmentor_params_from_state_dict",
]
