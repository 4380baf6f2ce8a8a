"""Config + small file helpers (yaml paths file, split lists)."""

import yaml


def load_config(config_path: str) -> dict:
    """Load the dataset-paths yaml (see paths.yaml at the repo root)."""
    with open(config_path) as f:
        return yaml.safe_load(f)


def readlines(filename: str) -> list:
    """Read a text file into a list of stripped lines."""
    with open(filename) as f:
        return f.read().splitlines()
