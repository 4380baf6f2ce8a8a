"""Ground-segmentation datasets (host-side numpy/PIL).

Behavioral contract (reference:
/root/reference/footprints/preprocessing/segmentation/datasets/):
  * BaseDataset: label IDs -> binary ground mask via per-dataset class lists;
    aspect-preserving resize-then-random-crop (`prepare_size`); train-time
    50% color jitter (brightness 0.3, contrast 0.2, saturation 0.3, hue 0.1)
    + 50% h-flip; returns {'image','ground_mask','labelled_pix'}
  * ADE20K: 14 ground IDs; RGB label decode ID = R//10*256 + G
  * Cityscapes: ground IDs {6,7,8,9,22}; ego-car crop to y<795; random
    0.4-1.0 downscale at train; gtFine with gtCoarse fallback, unlabeled
    (id 0) masked out via labelled_pix
  * Matterport: nia_ground_masks npy labels; random 0.25-1.0 downscale
  * KITTI (kitti-semantics): plain resize path, no crop
  * Inference datasets: LANCZOS resize + to-tensor; results under
    <save>/<per-dataset naming>/data/<name>.npy as float16

Deviations from the reference (latent bugs fixed, SURVEY.md §2.5):
  * matterport `generate_mask` -> `_generate_mask` (reference would raise
    AttributeError)
  * Matterport inference dataset's undefined `image_ext`/`datapath` fixed
  * `Image.from_array` (nonexistent) -> `Image.fromarray` on the has_gt=False
    path
"""

import os

import numpy as np
from PIL import Image

from ...data.augment import color_jitter
from ...utils import pil_loader

LANCZOS = Image.LANCZOS


def prepare_size(image, labels, feed_height, feed_width, rng,
                 keep_aspect_ratio=True):
    """Aspect-preserving resize so the crop fits, then random crop."""
    width, height = image.size

    if keep_aspect_ratio:
        if feed_height <= height and feed_width <= width:
            target_height, target_width = height, width
        else:
            current_ratio = height / width
            target_ratio = feed_height / feed_width
            if current_ratio < target_ratio:
                target_height = feed_height
                target_width = int(feed_height / height * width)
            elif current_ratio > target_ratio:
                target_height = int(feed_width / width * height)
                target_width = feed_width
            else:
                target_height = target_width = feed_width
    else:
        target_height = target_width = feed_width

    image = image.resize((target_width, target_height), LANCZOS)
    labels = labels.resize((target_width, target_height), Image.NEAREST)

    if (target_height, target_width) != (feed_height, feed_width):
        top = int(rng.random() * (target_height - feed_height))
        left = int(rng.random() * (target_width - feed_width))
        box = (left, top, left + feed_width, top + feed_height)
        image = image.crop(box)
        labels = labels.crop(box)
    return image, labels


class BaseDataset:
    brightness = (0.7, 1.3)
    contrast = (0.8, 1.2)
    saturation = (0.7, 1.3)
    hue = (-0.1, 0.1)
    ground_labels = None

    def __init__(self, datapath, filenames, height, width, is_train=False,
                 has_gt=True, seed=0):
        self.datapath = datapath
        self.filenames = filenames
        self.height = height
        self.width = width
        self.is_train = is_train
        self.has_gt = has_gt
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.filenames)

    def _load_image(self, index):
        raise NotImplementedError

    def _load_annotation(self, index):
        raise NotImplementedError

    def _preprocess(self, image, labels):
        return image, labels

    def _process_labels(self, labels):
        raise NotImplementedError

    def _generate_mask(self, labels):
        return np.isin(labels, self.ground_labels).astype(np.float32)

    def _augment_data(self, image, labels):
        if self._rng.random() > 0.5:
            image = color_jitter(image, self._rng, self.brightness,
                                 self.contrast, self.saturation, self.hue)
        if self._rng.random() > 0.5:
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            labels = labels.transpose(Image.FLIP_LEFT_RIGHT)
        return image, labels

    def __getitem__(self, index):
        image = self._load_image(index)
        if self.has_gt:
            labels = self._load_annotation(index)
        else:
            labels = Image.fromarray(
                np.zeros(np.array(image).shape[:2], np.uint8))

        image, labels = self._preprocess(image, labels)
        image, labels = prepare_size(image, labels, self.height, self.width,
                                     self._rng)
        if self.is_train:
            image, labels = self._augment_data(image, labels)

        arr = np.asarray(image, np.float32) / 255.0
        ground_mask, labelled_pix = self._process_labels(labels)
        return {
            "image": np.ascontiguousarray(arr[..., :3]),
            "ground_mask": ground_mask.astype(np.float32),
            "labelled_pix": labelled_pix.astype(np.float32),
        }


class ADE20KDataset(BaseDataset):
    # floor, road, grass, pavement, ground, field, sand, path, stairs,
    # runway, staircase, track, soil, manhole
    ground_labels = np.array([976, 2131, 1125, 2377, 838, 913, 2212, 1788,
                              2530, 2185, 2531, 738, 1401, 1494], np.float64)

    def _load_image(self, index):
        stem = os.path.splitext(self.filenames[index])[0]
        return pil_loader(os.path.join(self.datapath, stem + ".jpg"))

    def _load_annotation(self, index):
        stem = os.path.splitext(self.filenames[index])[0]
        return pil_loader(os.path.join(self.datapath, stem + "_seg.png"))

    def _process_labels(self, labels):
        arr = np.array(labels)
        ids = arr[..., 0].astype(np.int64) // 10 * 256 + arr[..., 1]
        mask = self._generate_mask(ids)
        return mask, np.ones_like(mask)


class CityscapesDataset(BaseDataset):
    # ground, road, pavement, parking, terrain
    ground_labels = np.array([6, 7, 8, 9, 22], np.float64)
    EGO_CAR_Y = 795

    def _load_image(self, index):
        folder, city, frame = self.filenames[index].split()
        return pil_loader(os.path.join(self.datapath, "leftImg8bit", folder,
                                       city, frame + "_leftImg8bit.png"))

    def _load_annotation(self, index):
        folder, city, frame = self.filenames[index].split()
        try:
            return pil_loader(os.path.join(self.datapath, "gtFine", folder,
                                           city, frame + "_gtFine_labelIds.png"))
        except FileNotFoundError:
            return pil_loader(os.path.join(
                self.datapath, "gtCoarse", folder + "_extra", city,
                frame + "_gtCoarse_labelIds.png"))

    def _preprocess(self, image, labels):
        image = image.crop((0, 0, image.size[0], self.EGO_CAR_Y))
        labels = labels.crop((0, 0, labels.size[0], self.EGO_CAR_Y))
        if self.is_train:
            w, h = image.size
            f = 0.4 + 0.6 * self._rng.random()
            image = image.resize((int(w * f), int(h * f)), LANCZOS)
            labels = labels.resize((int(w * f), int(h * f)), Image.NEAREST)
        return image, labels

    def _process_labels(self, labels):
        ids = np.array(labels)[..., 0]
        return self._generate_mask(ids), (ids != 0).astype(np.float32)


class MatterportSegDataset(BaseDataset):
    ground_labels = np.array([1], np.float64)

    def _load_image(self, index):
        scan, pos, h, d = self.filenames[index].split()
        return pil_loader(os.path.join(
            self.datapath, "sample_dataset/v1/scans", scan, scan,
            "matterport_color_images", f"{pos}_i{h}_{d}.jpg"))

    def _load_annotation(self, index):
        scan, pos, h, d = self.filenames[index].split()
        labels = np.load(os.path.join(
            self.datapath, "sample_dataset/v1/scans", scan, "nia_ground_masks",
            f"out_{pos}_{h}_{d}_visibleground.npy"))
        return Image.fromarray((labels > 0).astype(np.uint8))

    def _preprocess(self, image, labels):
        if self.is_train:
            w, h = image.size
            f = 0.25 + 0.75 * self._rng.random()
            image = image.resize((int(w * f), int(h * f)), LANCZOS)
            labels = labels.resize((int(w * f), int(h * f)), Image.NEAREST)
        return image, labels

    def _process_labels(self, labels):
        ids = np.array(labels)
        mask = self._generate_mask(ids)
        return mask, np.ones_like(mask)


class KITTISegDataset:
    """kitti-semantics training images (plain resize, no crop)."""

    ground_labels = np.array([6, 7, 8, 9, 22], np.float64)

    def __init__(self, datapath, filenames, height, width, is_train=False,
                 seed=0, **kwargs):
        self.datapath = datapath
        self.filenames = filenames
        self.height = height
        self.width = width
        self.is_train = is_train

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, index):
        frame = self.filenames[index].split()[0]
        image = pil_loader(os.path.join(self.datapath, frame)).resize(
            (self.width, self.height), LANCZOS)
        labels = pil_loader(os.path.join(
            self.datapath, frame.replace("image_2", "semantic"))).resize(
            (self.width, self.height), Image.NEAREST)
        ids = np.array(labels)[..., 0]
        mask = np.isin(ids, self.ground_labels).astype(np.float32)
        return {
            "image": np.asarray(image, np.float32) / 255.0,
            "ground_mask": mask,
            "labelled_pix": (ids != 0).astype(np.float32),
        }


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, index):
        di = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[di][index - int(self._offsets[di])]


# ---------------------------------------------------------------------------
# Inference datasets (produce the ground_seg npy tree)
# ---------------------------------------------------------------------------

class SegInferenceDataset:
    def __init__(self, data_path, filenames, height, width):
        self.data_path = data_path
        self.filenames = filenames
        self.height = height
        self.width = width

    def __len__(self):
        return len(self.filenames)

    def _load_image(self, index):
        raise NotImplementedError

    def __getitem__(self, index):
        image = self._load_image(index).resize((self.width, self.height), LANCZOS)
        return {"image": np.asarray(image, np.float32)[..., :3] / 255.0,
                "idx": index}

    def _write(self, savepath, filename, prediction, visualisation=None):
        data_dir = os.path.join(savepath, "data")
        os.makedirs(data_dir, exist_ok=True)
        np.save(os.path.join(data_dir, f"{str(filename).zfill(10)}.npy"),
                np.asarray(prediction).astype(np.float16))
        if visualisation is not None:
            import matplotlib.pyplot as plt

            vis_dir = os.path.join(savepath, "visualisations")
            os.makedirs(vis_dir, exist_ok=True)
            plt.imsave(os.path.join(vis_dir, f"{str(filename).zfill(10)}.jpg"),
                       visualisation)


class KITTISegInferenceDataset(SegInferenceDataset):
    def __init__(self, data_path, filenames, height, width, image_ext="jpg"):
        super().__init__(data_path, filenames, height, width)
        self.image_ext = image_ext

    def _parse_index(self, index):
        seq, frame, side = self.filenames[index].split()
        return seq, frame, "image_02" if side == "l" else "image_03"

    def _load_image(self, index):
        seq, frame, cam = self._parse_index(index)
        return pil_loader(os.path.join(
            self.data_path, seq, cam, "data",
            f"{frame.zfill(10)}.{self.image_ext}"))

    def save_result(self, index, prediction, savepath, visualisation=None):
        seq, frame, cam = self._parse_index(int(index))
        self._write(os.path.join(savepath, seq, cam), frame, prediction,
                    visualisation)


class MatterportSegInferenceDataset(SegInferenceDataset):
    def _load_image(self, index):
        scan, pos, h, d = self.filenames[index].split()
        return pil_loader(os.path.join(
            self.data_path, "sample_dataset/v1/scans", scan, scan,
            "matterport_color_images", f"{pos}_i{h}_{d}.jpg"))

    def save_result(self, index, prediction, savepath, visualisation=None):
        scan, pos, h, d = self.filenames[int(index)].split()
        self._write(os.path.join(savepath, scan), f"{pos}_{h}_{d}",
                    prediction, visualisation)


def get_dataset_class(name):
    return {
        "ADE20K": ADE20KDataset,
        "cityscapes": CityscapesDataset,
        "matterport": MatterportSegDataset,
        "kitti": KITTISegDataset,
    }[name]


def get_inference_dataset_class(name):
    return {
        "kitti": KITTISegInferenceDataset,
        "matterport": MatterportSegInferenceDataset,
    }[name]
