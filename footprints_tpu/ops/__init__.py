from .upconv import conv3x3_on_nearest_up

__all__ = ["conv3x3_on_nearest_up"]
