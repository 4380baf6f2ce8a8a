"""Checkpointing: full train-state (params + BN state + optimizer state +
step) as a single flat ``.npz`` per save — self-describing, torch-free, and
readable on any host.

The reference saved ``weights_<epoch>/{model.pth, optimiser.pth}`` but lost
the step counter and LR-schedule position on resume
(/root/reference/footprints/model_manager.py:46-56; SURVEY.md §5).  Here the
step counter is part of the state, so resume continues the schedule exactly.

Pytree <-> flat mapping: keys are '/'-joined paths; list indices are encoded
as plain path segments.  ``None`` leaves (e.g. bias-free convs) are recorded
with a sentinel so the tree structure round-trips exactly.

Format history: the optimizer state's pytree layout follows the live
optimizer definition — when train/step.py wrapped Adam in ``optax.flatten``
(r2, perf), the saved opt_state layout changed with it.  Checkpoints written
before that carry per-leaf Adam state and can resume weights+step but not
the optimizer moments; ``restore_into`` raises a clear KeyError rather than
silently mixing layouts.  Params/state/step keys are stable across versions.
"""

import os

import numpy as np

_NONE_SENTINEL = "__none__"


def _flatten(tree, prefix, out):
    if tree is None:
        out[prefix] = _NONE_SENTINEL
    elif isinstance(tree, dict):
        if not tree:
            out[prefix + "/__empty_dict__"] = np.zeros(0)
        for k, v in tree.items():
            assert "/" not in str(k), f"key {k!r} contains '/'"
            assert str(k) not in ("__list__", "__tuple__", "__empty_dict__",
                                  "__none_keys__"), f"reserved key {k!r}"
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    elif isinstance(tree, (list, tuple)):
        tag = "__list__" if isinstance(tree, list) else "__tuple__"
        out[f"{prefix}/{tag}" if prefix else tag] = np.asarray(len(tree))
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}" if prefix else str(i), out)
    else:
        out[prefix] = np.asarray(tree)


def save_checkpoint(path, train_state):
    """Write the train-state pytree to ``<path>`` (a .npz file)."""
    flat = {}
    _flatten(train_state, "", flat)
    arrays = {
        k: (np.asarray(0) if isinstance(v, str) else v) for k, v in flat.items()
    }
    none_keys = [k for k, v in flat.items() if isinstance(v, str)]
    arrays["__none_keys__"] = np.asarray(none_keys)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path):
    """Read a checkpoint back into a nested pytree of numpy arrays."""
    with np.load(path, allow_pickle=False) as data:
        none_keys = set(data["__none_keys__"].tolist()) if "__none_keys__" in data else set()
        flat = {k: data[k] for k in data.files if k != "__none_keys__"}

    root = {}
    lists = {}  # path -> (kind, length)
    for key in list(flat):
        if key.endswith("__list__") or key.endswith("__tuple__"):
            base, _, tag = key.rpartition("/")
            lists[base] = ("list" if tag == "__list__" else "tuple", int(flat.pop(key)))

    # materialize nodes for every sequence path — an empty list/tuple has no
    # element entries, so it would otherwise never appear in the tree
    for base in lists:
        parts = base.split("/") if base else []
        node = root
        for p in parts:
            node = node.setdefault(p, {})

    for key, val in flat.items():
        if key.endswith("/__empty_dict__"):
            key = key[: -len("/__empty_dict__")]
            val = {}
        elif key in none_keys:
            val = None
        parts = key.split("/") if key else []
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts:
            node[parts[-1]] = val
        else:
            return val  # scalar/None root

    def fix(node, path):
        if isinstance(node, dict):
            if path in lists:
                kind, n = lists[path]
                seq = [fix(node[str(i)], f"{path}/{i}" if path else str(i))
                       for i in range(n)]
                return seq if kind == "list" else tuple(seq)
            return {k: fix(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        return node

    return fix(root, "")


def restore_into(template, loaded):
    """Rebuild ``loaded`` (dicts/lists/tuples/arrays from load_checkpoint)
    with the container *types* of ``template`` — needed because optax
    optimizer states are NamedTuples, which flatten to plain tuples on disk.
    """
    if template is None:
        return None
    if isinstance(template, dict):
        return {k: restore_into(v, loaded[k]) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        vals = [restore_into(t, l) for t, l in zip(template, loaded)]
        assert len(template) == len(loaded), "checkpoint/template length mismatch"
        if hasattr(template, "_fields"):  # NamedTuple
            return type(template)(*vals)
        return type(template)(vals)
    return loaded
