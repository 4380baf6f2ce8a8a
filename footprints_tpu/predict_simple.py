"""One-shot prediction CLI.

API parity with the reference
(/root/reference/footprints/predict_simple.py): same flags, same output
layout (``<save_dir>/outputs/<name>.npy`` float32 4xHxW-equivalent and
``<save_dir>/visualisations/<name>.jpg``), same visualization recipe —
including the reference's quirk of thresholding the hidden-ground channel at
0.5 on RAW LOGITS (sigmoid is never applied on this path; predict_simple.py:77).
Pass ``--apply_sigmoid`` for the arguably-intended behavior; default keeps
parity.

TPU-native differences:
  * the forward pass is one jitted XLA graph, compiled once per resolution;
  * folder prediction is batched (images grouped per compiled batch shape)
    instead of one forward per file;
  * predictions are saved channels-first [4,H,W] to match the reference's
    artifact contract.

Usage:
  python -m footprints_tpu.predict_simple --image test_data/cyclist.jpg \
      --model kitti --save_dir predictions
"""

import argparse
import glob
import os

import numpy as np

from .core.ops import np_sigmoid_to_depth
from .model_manager import ModelManager
from .utils import MODEL_DIR, download_model_if_doesnt_exist, pil_loader

MODEL_HEIGHT_WIDTH = {
    "kitti": (192, 640),
    "matterport": (512, 640),
    "handheld": (256, 448),
}
IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png"}

from PIL import Image

LANCZOS = Image.LANCZOS


class InferenceManager:
    def __init__(self, model_name, save_dir, save_visualisations=True,
                 model_load_folder=None, height=None, width=None,
                 apply_sigmoid=False, batch_size=4, artifact=None):
        if artifact is not None:
            # serve from an AOT-exported StableHLO artifact (see
            # footprints_tpu/export.py) — no checkpoint or tracing needed
            from .export import load_serving

            serving = load_serving(artifact)
            if height is not None and (height, width) != (serving.height,
                                                          serving.width):
                raise ValueError(
                    f"--height/--width {height}x{width} conflict with the "
                    f"artifact's compiled {serving.height}x{serving.width}")
            self.height, self.width = serving.height, serving.width
            self.batch_size = serving.batch
            self.apply_sigmoid = apply_sigmoid
            self._forward = None
            self._serving = serving
            self.save_dir = save_dir
            os.makedirs(os.path.join(save_dir, "outputs"), exist_ok=True)
            self.save_visualisations = save_visualisations
            if save_visualisations:
                os.makedirs(os.path.join(save_dir, "visualisations"),
                            exist_ok=True)
            return
        self._serving = None
        if model_load_folder is None:
            if model_name is None:
                raise ValueError(
                    "pass --model <kitti|matterport|handheld> (downloads the "
                    "pretrained checkpoint) or --model_path <weights dir>")
            download_model_if_doesnt_exist(model_name)
            model_load_folder = os.path.join(MODEL_DIR, model_name)
        self.model_manager = ModelManager(is_inference=True)
        self.model_manager.load_model(weights_path=model_load_folder)

        if height is None or width is None:
            if model_name is None:
                # --model_path without --model: no named resolution to look
                # up — default to the KITTI training resolution, overridable
                # via --height/--width
                height, width = MODEL_HEIGHT_WIDTH["kitti"]
                print(f"note: no --model given; assuming {height}x{width} "
                      "input (override with --height/--width)")
            else:
                height, width = MODEL_HEIGHT_WIDTH[model_name]
        self.height, self.width = height, width
        self.apply_sigmoid = apply_sigmoid
        self.batch_size = batch_size

        self.save_dir = save_dir
        os.makedirs(os.path.join(save_dir, "outputs"), exist_ok=True)
        self.save_visualisations = save_visualisations
        if save_visualisations:
            os.makedirs(os.path.join(save_dir, "visualisations"), exist_ok=True)

        self._forward = self._build_forward()

    def _build_forward(self):
        import jax
        import jax.numpy as jnp

        net = self.model_manager.net
        params, state = self.model_manager.params, self.model_manager.state

        @jax.jit
        def forward(images):
            out, _ = net.apply(params, state, images, train=False)
            # transpose to channels-first ON DEVICE: the host artifact is
            # [4,H,W] anyway, and fetching an NHWC C=4 buffer would transfer
            # the lane-padded (4->128) layout — 32x the bytes
            return jnp.transpose(out["1/1"], (0, 3, 1, 2))

        return forward

    def _load_and_preprocess_image(self, image_path):
        original = pil_loader(image_path)
        pre = original.resize((self.width, self.height), LANCZOS)
        arr = np.asarray(pre, np.float32) / 255.0
        return original, arr

    def _predict_batch(self, arrs):
        """arrs: list of [H,W,3] -> [B,4,H,W] numpy (channels-first)."""
        if self._serving is not None:
            preds = self._serving.call(np.stack(arrs))
        else:
            import jax.numpy as jnp

            batch = np.zeros(
                (self.batch_size, self.height, self.width, 3), np.float32)
            batch[: len(arrs)] = np.stack(arrs)
            preds = np.asarray(self._forward(jnp.asarray(batch))[: len(arrs)])
        if self.apply_sigmoid:
            preds[:, :2] = 1.0 / (1.0 + np.exp(-preds[:, :2]))
        return preds

    def predict_for_single_image(self, image_path):
        self.predict_for_paths([image_path])

    def predict_for_paths(self, paths):
        import cv2

        for start in range(0, len(paths), self.batch_size):
            chunk = paths[start:start + self.batch_size]
            originals, arrs = zip(*(self._load_and_preprocess_image(p) for p in chunk))
            preds = self._predict_batch(list(arrs))
            for path, original, pred in zip(chunk, originals, preds):
                print(f"Predicting for {path}")
                filename, _ = os.path.splitext(os.path.basename(path))
                npy_save_path = os.path.join(self.save_dir, "outputs", filename + ".npy")
                print(f"-> Saving predictions to {npy_save_path}")
                np.save(npy_save_path, pred)

                if self.save_visualisations:
                    vis = self._visualise(pred, original)
                    vis_save_path = os.path.join(
                        self.save_dir, "visualisations", filename + ".jpg")
                    print(f"-> Saving visualisation to {vis_save_path}")
                    cv2.imwrite(vis_save_path, (vis[:, :, ::-1] * 255).astype(np.uint8))

    def _visualise(self, pred, original):
        """Overlay plasma-mapped hidden depth on the hidden-ground region."""
        import cv2
        import matplotlib.pyplot as plt

        colormap = plt.get_cmap("plasma", 256)
        hidden_ground = cv2.resize(pred[1], original.size) > 0.5
        hidden_depth = cv2.resize(np_sigmoid_to_depth(pred[3]), original.size)
        img = np.array(original) / 255.0
        if hidden_ground.any():
            _max = hidden_depth[hidden_ground].max()
            _min = hidden_depth[hidden_ground].min()
            hidden_depth = (hidden_depth - _min) / max(_max - _min, 1e-7)
        depth_color = colormap(hidden_depth)[:, :, :3]
        mask = hidden_ground[:, :, None]
        return img * (1 - mask) + depth_color * mask

    def predict_for_folder(self, folder_path):
        paths = [p for p in sorted(glob.glob(os.path.join(folder_path, "*")))
                 if os.path.splitext(p)[1].lower() in IMAGE_EXTENSIONS]
        self.predict_for_paths(paths)

    def predict(self, image_path):
        if os.path.isfile(image_path):
            self.predict_for_single_image(image_path)
        elif os.path.isdir(image_path):
            self.predict_for_folder(image_path)
        else:
            raise FileNotFoundError(f"Can not find args.image: {image_path}")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Simple prediction from a footprints model (TPU).")
    parser.add_argument("--image", type=str, required=True,
                        help="path to a test image or folder of images")
    parser.add_argument("--model", type=str,
                        choices=["kitti", "matterport", "handheld"],
                        help="name of a pretrained model to use")
    parser.add_argument("--model_path", type=str, default=None,
                        help="directory with model.pth or checkpoint.npz "
                             "(overrides --model download)")
    parser.add_argument("--artifact", type=str, default=None,
                        help="serve from an AOT-exported StableHLO artifact "
                             "(python -m footprints_tpu.export); resolution "
                             "and batch come from the artifact")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--no_save_vis", action="store_true",
                        help="if set, disables visualisation saving")
    parser.add_argument("--apply_sigmoid", action="store_true",
                        help="apply sigmoid to mask channels before saving "
                             "(reference parity default: raw logits)")
    parser.add_argument("--save_dir", type=str, default="predictions",
                        help="where to save npy and visualisations to")
    return parser.parse_args(argv)


def main(argv=None):
    from .platform_config import configure_from_env

    configure_from_env()
    args = parse_args(argv)
    manager = InferenceManager(
        model_name=args.model,
        save_dir=args.save_dir,
        save_visualisations=not args.no_save_vis,
        model_load_folder=args.model_path,
        height=args.height,
        width=args.width,
        apply_sigmoid=args.apply_sigmoid,
        artifact=args.artifact,
    )
    manager.predict(image_path=args.image)


if __name__ == "__main__":
    main()
