"""Entry point: train or batch-inference (reference:
/root/reference/footprints/main.py).

  python -m footprints_tpu.main --mode train --training_dataset kitti ...
  python -m footprints_tpu.main --mode inference --load_path <dir> ...
"""

from .options import Options
from .platform_config import configure_from_env


def main(argv=None):
    configure_from_env()
    opts = Options().parse(argv)
    if opts.mode == "train":
        from .train.trainer import TrainManager

        TrainManager(opts).train()
    else:
        from .eval.inference import InferenceManager

        InferenceManager(opts).run()


if __name__ == "__main__":
    main()
