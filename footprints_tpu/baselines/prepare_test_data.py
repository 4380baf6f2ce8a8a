"""Test-time input loaders for the baselines (reference:
/root/reference/footprints/baselines/prepare_test_data.py).

The reference hardcoded NAS paths and read 'predictions' yaml keys missing
from its shipped paths.yaml; here all roots are constructor arguments with
paths.yaml-compatible defaults, and ground-truth downloads happen lazily
(the reference downloaded at import time).
"""

import os

import cv2
import numpy as np

from ..core.ops import np_sigmoid_to_depth
from ..utils import GROUND_TRUTH_DIR, download_ground_truths_if_dont_exist


def cv2_imread_strict(im_path, *args):
    if os.path.isfile(im_path):
        return cv2.imread(im_path, *args)[:, :, ::-1]
    raise FileNotFoundError(im_path)


class TestLoader:
    def __init__(self, load_bounding_box_predictions=False,
                 load_visible_ground="pred", baseline_type=""):
        self.load_bounding_box_predictions = load_bounding_box_predictions
        self.load_visible_ground = load_visible_ground
        self.baseline_type = baseline_type


class KittiTestLoader(TestLoader):
    W, H = 640, 192

    def __init__(self, predictions_root="predictions/kitti", gt_dir=None,
                 download=True, **kwargs):
        super().__init__(**kwargs)
        self.predictions_root = predictions_root
        if gt_dir is None:
            if download:
                download_ground_truths_if_dont_exist("kitti")
            gt_dir = os.path.join(GROUND_TRUTH_DIR, "kitti_ground_truth",
                                  "kitti_ground_truth")
        self.gt_dir = gt_dir

    def __call__(self, frame_num):
        inputs = {}
        if self.load_visible_ground == "pred":
            pred = np.load(os.path.join(self.predictions_root, "ours",
                                        f"{frame_num:03d}_color.npy"))
            inputs["visible_ground"] = pred[0]  # VISIBLE_GROUND channel
        elif self.load_visible_ground == "ground_truth":
            inputs["visible_ground"] = cv2_imread_strict(
                os.path.join(self.gt_dir, f"{frame_num:05d}_ground.png"))

        if self.load_bounding_box_predictions:
            inputs["bounding_box_mask"] = cv2_imread_strict(os.path.join(
                self.predictions_root, "bounding_box_detections",
                f"{frame_num:03d}_colorfootprint.png"))[:, :, 0]

        for key in inputs:
            inputs[key] = cv2.resize(
                inputs[key].astype(np.float32), (self.W, self.H))
        return inputs

    def get_save_path(self, baseline_type, test_file_line):
        save_path = os.path.join(self.predictions_root, "..",
                                 "predictions_rerun", baseline_type,
                                 str(test_file_line))
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        return save_path


class MatterportTestLoader(TestLoader):
    H, W = 512, 640
    FULL_W, FULL_H = 640, 512

    def __init__(self, predictions_root="predictions/matterport",
                 dataset_root=None, gt_dir=None, download=True, **kwargs):
        super().__init__(**kwargs)
        self.predictions_root = predictions_root
        self.dataset_root = dataset_root
        if gt_dir is None:
            if download:
                download_ground_truths_if_dont_exist("matterport")
            gt_dir = os.path.join(GROUND_TRUTH_DIR, "matterport_ground_truth",
                                  "matterport_ground_truth")
        self.gt_dir = gt_dir

    def _pred_path(self, frame_data):
        return os.path.join(self.predictions_root,
                            "{}_{}_{}_{}.npy".format(*frame_data))

    def load_intrinsics(self, frame_data, depth):
        path = os.path.join(
            self.dataset_root,
            "{}/{}/matterport_camera_intrinsics/{}_intrinsics_{}.txt".format(
                frame_data[0], frame_data[0], frame_data[1], frame_data[2]))
        vals = np.loadtxt(path)
        K = np.eye(3)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = vals[2], vals[3], vals[4], vals[5]
        K[0, :] *= depth.shape[1] / self.W
        K[1, :] *= depth.shape[0] / self.H
        return K, np.linalg.pinv(K)

    def __call__(self, test_file_line):
        frame_data = test_file_line.strip().split()
        inputs = {}
        if "ransac_plane" in self.baseline_type:
            pred = np.load(self._pred_path(frame_data))
            depth = cv2.resize(
                np_sigmoid_to_depth(pred[2]).astype(np.float32),
                (self.W, self.H))
            K, inv_K = self.load_intrinsics(frame_data, depth)
            inputs.update({"depth": depth, "inv_K": inv_K, "K": K})

        if self.load_visible_ground == "pred":
            pred = np.load(self._pred_path(frame_data))
            inputs["visible_ground"] = cv2.resize(
                pred[0].astype(np.float32), (self.W, self.H))
        elif self.load_visible_ground == "ground_truth":
            gt = np.load(os.path.join(
                self.gt_dir, "{}_{}_{}_{}_groundtruth.npy".format(*frame_data)))
            inputs["visible_ground"] = cv2.resize(
                gt.astype(np.float32), (self.W, self.H))

        if self.load_bounding_box_predictions:
            mask = cv2_imread_strict(os.path.join(
                self.predictions_root, "bounding_box_detections",
                self.bounding_box_training_data,
                "{}_{}_{}_{}.png".format(*frame_data)))
            inputs["bounding_box_mask"] = cv2.resize(
                mask.astype(np.float32), (self.W, self.H))[:, :, 0]
        return inputs

    def get_save_path(self, baseline_type, test_file_line):
        save_path = os.path.join(self.predictions_root, "..",
                                 "predictions_rerun", baseline_type,
                                 str(test_file_line).replace(" ", "_"))
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        return save_path
