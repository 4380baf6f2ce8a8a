"""Segmentation Tester — runs the trained Segmentor over train+val splits to
produce the ``ground_seg`` float16 npy tree consumed by GT generation and
main training (reference:
/root/reference/footprints/preprocessing/segmentation/inference.py:21-113).
"""

import os

import numpy as np

from ...core.config import load_config, readlines
from ...data.loader import DataLoader
from ...models import Segmentor
from .datasets import get_inference_dataset_class
from .trainer import _load_segmentor_weights


class Tester:
    def __init__(self, options):
        print("setting up...")
        self.opt = options
        self.config = load_config(self.opt.config_path)
        path_data = self.config[self.opt.test_data_type]
        self.save_path = os.path.join(path_data["training_data"],
                                      self.opt.test_save_folder)

        self.net = Segmentor(depth=getattr(self.opt, "encoder_depth", 34),
                             use_psp=not self.opt.no_PSP)
        self.params, self.state = _load_segmentor_weights(
            self.net, self.opt.load_path)

        split_root = getattr(self.opt, "split_root", "splits")
        filenames = []
        for textfile in ["train.txt", "val.txt"]:
            filenames += readlines(os.path.join(
                split_root, self.opt.test_data_type, textfile))
        filenames = sorted(filenames)

        self.dataset = get_inference_dataset_class(self.opt.test_data_type)(
            path_data["dataset"], filenames, self.opt.height, self.opt.width)
        self.loader = DataLoader(self.dataset, self.opt.batch_size,
                                 shuffle=False, drop_last=False,
                                 num_workers=self.opt.num_workers)
        self._forward = self._build_forward()

    def _build_forward(self):
        import jax

        net, params, state = self.net, self.params, self.state

        @jax.jit
        def forward(images):
            outputs, _ = net.apply(params, state, images, train=False)
            # full-scale logits -> sigmoid; squeeze channel on device and
            # return [N,H,W] f16 (W is the minor dim -> clean fetch layout)
            return jax.nn.sigmoid(outputs[3][..., 0]).astype(jax.numpy.float16)

        return forward

    def test(self, overlap=True):
        """Dump ground_seg predictions over train+val (~95k KITTI images —
        this feeds the whole GT pipeline, so dump rate is a production
        lever).  `overlap=True` (default) dispatches batch n+1's forward
        before fetching batch n and queues the per-image saves on a writer
        thread (same pipeline as eval/inference.py:run; A/B:
        tools/bench_dump.py).
        """
        import jax.numpy as jnp

        from ...data.loader import BackgroundWriter

        print("running inference...")
        bs = self.opt.batch_size

        def submit(inputs):
            images = inputs["image"]
            n = images.shape[0]
            if n < bs:
                pad = np.zeros((bs - n,) + images.shape[1:], images.dtype)
                images = np.concatenate([images, pad])
            return self._forward(jnp.asarray(images)), inputs, n

        def drain(writer, dev_preds, inputs, n):
            preds = np.asarray(dev_preds)[:n]
            for i in range(n):
                viz = None
                if self.opt.save_test_visualisations:
                    import matplotlib.pyplot as plt

                    cm = plt.get_cmap("plasma")
                    viz = np.concatenate(
                        [inputs["image"][i],
                         cm(preds[i].astype(np.float32))[..., :3]], axis=1)
                # saved shape [1,H,W] matches the reference artifact
                writer.submit(self.dataset.save_result, inputs["idx"][i],
                              preds[i][None], self.save_path, viz)

        with BackgroundWriter() as writer:
            pending = None
            for inputs in self.loader:
                nxt = submit(inputs)
                if not overlap:
                    drain(writer, *nxt)
                    continue
                if pending is not None:
                    drain(writer, *pending)
                pending = nxt
            if pending is not None:
                drain(writer, *pending)
        print("finished testing!")
