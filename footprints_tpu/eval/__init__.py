from .evaluate_model import evaluate, evaluate_depth, evaluate_mask

__all__ = ["evaluate", "evaluate_depth", "evaluate_mask"]
