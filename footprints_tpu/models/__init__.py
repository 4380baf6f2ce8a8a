from .footprint import FootprintNetwork
from .segmentor import Segmentor

__all__ = ["FootprintNetwork", "Segmentor"]
