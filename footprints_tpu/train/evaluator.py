"""Metric accumulation across steps, device-resident.

The reference Evaluator `.detach().cpu()`'d every loss term every step —
a device->host sync per step (/root/reference/footprints/training/
evaluation.py:38-43, SURVEY.md §3.2).  Here we keep the per-step loss dicts
as device scalars; nothing syncs until `get_averaged_losses` is called at
logging cadence.
"""

import collections

import numpy as np


class Evaluator:
    def __init__(self):
        self._tracked = {
            "train": collections.defaultdict(list),
            "val": collections.defaultdict(list),
        }

    def accumulate(self, losses, mode="train"):
        """Record one step's loss dict (device scalars; no sync)."""
        for key, val in losses.items():
            self._tracked[mode][key].append(val)

    def get_averaged_losses(self, mode="train", reset=True):
        """Average tracked losses -> python floats (this is the sync point)."""
        out = {}
        for key, vals in self._tracked[mode].items():
            out[key] = float(np.mean([np.asarray(v) for v in vals])) if vals else float("nan")
        if reset:
            self._tracked[mode] = collections.defaultdict(list)
        return out
