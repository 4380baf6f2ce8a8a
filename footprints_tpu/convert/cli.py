"""Offline checkpoint conversion CLI.

  python -m footprints_tpu.convert.cli --input models/kitti/model.pth \
      --output models/kitti_native --model footprint

Reads a reference PyTorch checkpoint (torch-free) and writes this
framework's native checkpoint.npz, so TPU serving hosts never parse pickle
at load time.
"""

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Convert .pth -> checkpoint.npz")
    parser.add_argument("--input", required=True, help="path to model.pth")
    parser.add_argument("--output", required=True,
                        help="output directory for checkpoint.npz")
    parser.add_argument("--model", choices=["footprint", "segmentor"],
                        default="footprint")
    parser.add_argument("--encoder_depth", type=int, default=34,
                        choices=[18, 34, 50])
    parser.add_argument("--no_psp", action="store_true",
                        help="segmentor without the PSP bottleneck")
    args = parser.parse_args(argv)

    from ..train.checkpoint import save_checkpoint
    from .torch_checkpoint import (
        footprint_params_from_state_dict,
        load_torch_state_dict,
        segmentor_params_from_state_dict,
    )

    sd = load_torch_state_dict(args.input)
    if args.model == "footprint":
        params, state = footprint_params_from_state_dict(sd, args.encoder_depth)
    else:
        params, state = segmentor_params_from_state_dict(
            sd, args.encoder_depth, use_psp=not args.no_psp)

    dest = os.path.join(args.output, "checkpoint.npz")
    save_checkpoint(dest, {
        "params": params,
        "state": state,
        "opt_state": None,
        "step": np.zeros((), np.int32),
    })
    n_params = sum(int(np.asarray(x).size) for x in
                   _leaves(params))
    print(f"wrote {dest} ({n_params / 1e6:.1f}M params)")


def _leaves(tree):
    if tree is None:
        return
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
