"""Segmentation pipeline entry point:

  python -m footprints_tpu.preprocessing.segmentation.main --mode train ...
  python -m footprints_tpu.preprocessing.segmentation.main --mode inference ...
"""

from ...platform_config import configure_from_env
from .options import Options


def main(argv=None):
    configure_from_env()
    opts = Options().parse(argv)
    if opts.mode == "train":
        print("In training mode!")
        from .trainer import Trainer

        Trainer(opts).train()
    else:
        print("In inference mode!")
        from .inference import Tester

        Tester(opts).test()


if __name__ == "__main__":
    main()
