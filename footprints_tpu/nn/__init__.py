from . import layers, init, blocks, resnet

__all__ = ["layers", "init", "blocks", "resnet"]
