"""Ground-truth generation CLI (reference:
/root/reference/footprints/preprocessing/ground_truth_generation/
ground_truth_generator.py).

  python -m footprints_tpu.preprocessing.ground_truth_generation.generator \
      --type hidden_depths --data_type kitti --textfile splits/kitti/train.txt

TPU-first design:
  * the per-frame aggregation (backproject -> transform -> splat -> robust
    median) is ONE compiled XLA graph (geometry.aggregate_hidden_depth);
  * frame windows are padded to a static size with zero-depth frames so a
    single executable serves every target frame (no per-frame recompiles);
  * Matterport's near-camera filter becomes a frame weight instead of a
    boolean gather — same effect, static shapes;
  * RANSAC evaluates all 100 plane hypotheses in one batched matmul.

Sharding across machines keeps the reference's --idx_start/--idx_end
contract.
"""

import argparse
import os
import time

import jax
import numpy as np

from ...core.config import load_config, readlines
from ...core.ops import np_pixel_disp_to_depth
from .data_loader import KITTILoader, MatterportLoader
from .geometry import aggregate_hidden_depth
from .processing import compute_depth_mask, compute_moving_object_mask


def _pad_frames(data, n_target):
    """Pad the frame batch to n_target with inert frames (zero depth)."""
    n = data["depths"].shape[0]
    if n > n_target:
        # keep the closest-to-target frames (should not happen for KITTI's
        # fixed window; Matterport pads to a multiple >= n)
        raise ValueError(f"frame batch {n} exceeds static size {n_target}")
    pad = n_target - n
    if pad == 0:
        return data
    out = dict(data)
    out["depths"] = np.concatenate(
        [data["depths"], np.zeros((pad,) + data["depths"].shape[1:], np.float32)])
    eye = np.tile(np.eye(4, dtype=np.float32)[None], (pad, 1, 1))
    for key in ("poses", "intrinsics", "inv_intrinsics"):
        out[key] = np.concatenate([data[key], eye])
    return out


class GroundTruthGenerator:
    height = width = None  # set by subclass

    def __init__(self, opts):
        self.opts = opts
        self.filenames = sorted(readlines(opts.textfile))
        end = None if opts.idx_end == -1 else opts.idx_end
        self.filenames = self.filenames[opts.idx_start:end]
        self.save_folder = opts.save_folder_name or "hidden_depths"
        self.footprint_threshold = opts.footprint_threshold
        self.robust_aggregation = True
        self._key = jax.random.PRNGKey(10)

    def parse_config(self, config_path, data_key):
        config = load_config(config_path)
        return config[data_key]["dataset"], config[data_key]["training_data"]

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def load_data(self, idx, filename):
        raise NotImplementedError

    def process_data(self, data):
        # returns the DEVICE array (async dispatch): run()'s pipeline
        # fetches it on the writer thread, overlapped with the next
        # frame's host-side loads (save_result's np.asarray blocks there)
        return aggregate_hidden_depth(
            data["depths"], data["poses"], data["intrinsics"],
            data["inv_intrinsics"], height=self.height, width=self.width,
            robust=self.robust_aggregation)

    def save_result(self, result, savepath, filename, save_viz=False):
        data_dir = os.path.join(savepath, "data")
        os.makedirs(data_dir, exist_ok=True)
        np.save(os.path.join(data_dir, f"{str(filename).zfill(10)}.npy"),
                np.asarray(result))
        if save_viz:
            import matplotlib.pyplot as plt

            viz_dir = os.path.join(savepath, "visualisations")
            os.makedirs(viz_dir, exist_ok=True)
            plt.imsave(os.path.join(viz_dir, f"{str(filename).zfill(10)}.jpg"),
                       np.asarray(result, np.float32))

    def run(self):
        """Per-frame loop, pipelined: the device aggregation for frame i is
        dispatched async and its fetch + np.save run on a writer thread
        while the main thread does frame i+1's host-side loads (reference
        loop was fully serial: ground_truth_generator.py:144-162)."""
        from ...data.loader import BackgroundWriter

        t0 = time.time()
        print(f"running ground truth generation on {len(self.filenames)} files...")
        # max_pending bounds in-flight device buffers awaiting fetch
        with BackgroundWriter(max_pending=8) as writer:
            for i, filename in enumerate(self.filenames):
                if i % 25 == 0 and i:
                    print(f"computing image {i} of {len(self.filenames)}; "
                          f"avg {(time.time() - t0) / i:.2f}s/image")
                data = self.load_data(i, filename)
                result = self.process_data(data)  # async device dispatch
                writer.submit(self.save_result_for, result, filename)


class KITTIGroundTruthGenerator(GroundTruthGenerator):
    height, width = 192, 640

    def __init__(self, opts):
        super().__init__(opts)
        self.raw_datapath, self.training_datapath = self.parse_config(
            opts.config_path, "kitti")
        self.loader = KITTILoader(self.raw_datapath, self.training_datapath,
                                  self.height, self.width,
                                  footprint_threshold=self.footprint_threshold)
        self.sequence_in_buffer = None

    def load_data(self, idx, filename):
        sequence, frame, side = filename.split()
        if sequence != self.sequence_in_buffer or len(self.loader.buffer) > 1000:
            self.loader.purge_buffer()
            self.sequence_in_buffer = sequence

        cam = "image_02" if side == "l" else "image_03"
        baseline = self.loader.stereo_baseline * (1.0 if side == "l" else -1.0)

        data = self.loader.load_data(sequence, int(frame))
        data["depths"] = data["depths"] * data["ground_segs"]

        base_pose = self.loader.load_frame_data(sequence, int(frame), cam)["pose"]
        inv_base = np.linalg.pinv(base_pose).astype(np.float32)
        data["poses"] = np.einsum("ij,njk->nik", inv_base, data["poses"])
        for i, s in enumerate(data["sides"]):
            if s != cam:
                data["poses"][i, 0, 3] += baseline
        return _pad_frames(data, self.loader.max_window_frames)

    def save_result_for(self, result, filename):
        sequence, frame, side = filename.split()
        cam = "image_02" if side == "l" else "image_03"
        savepath = os.path.join(self.training_datapath, self.save_folder,
                                sequence, cam)
        self.save_result(result, savepath, frame,
                         save_viz=self.opts.save_visualisations)


class KITTIMovingObjectDetector(KITTIGroundTruthGenerator):
    def __init__(self, opts):
        super().__init__(opts)
        self.save_folder = opts.save_folder_name or "moving_object_masks"

    def load_data(self, idx, filename):
        sequence, frame, side = filename.split()
        if sequence != self.sequence_in_buffer or len(self.loader.buffer) > 1000:
            self.loader.purge_buffer()
            self.sequence_in_buffer = sequence
        cam = "image_02" if side == "l" else "image_03"
        base = self.loader.load_frame_data(sequence, int(frame), cam,
                                           load_flow=True)
        lookup = self.loader.load_frame_data(sequence, int(frame) - 1, cam,
                                             load_flow=True)
        if lookup is None:
            lookup = self.loader.load_frame_data(sequence, int(frame) + 1, cam,
                                                 load_flow=True)
        return {"base_data": base, "lookup_data": lookup}

    def process_data(self, data):
        base, lookup = data["base_data"], data["lookup_data"]
        T = (np.linalg.pinv(lookup["pose"]) @ base["pose"]).astype(np.float32)
        # invalid disparity -> depth 0 -> never flagged moving (reference:
        # nan induced flow fails the >3px comparison)
        depth = np_pixel_disp_to_depth(
            base["disparity"], self.loader.K[0, 0],
            self.loader.stereo_baseline).astype(np.float32)
        mask = compute_moving_object_mask(
            depth, T, self.loader.K, self.loader.invK,
            base["flow"].astype(np.float32),
            height=self.height, width=self.width)
        return mask  # device array; fetched on the writer thread


class KITTIDepthMaskingGenerator(KITTIGroundTruthGenerator):
    def __init__(self, opts):
        super().__init__(opts)
        self.save_folder = opts.save_folder_name or "depth_masks"

    def load_data(self, idx, filename):
        sequence, frame, side = filename.split()
        cam = "image_02" if side == "l" else "image_03"
        return self.loader.load_frame_data(sequence, int(frame), cam,
                                           use_buffer=False,
                                           threshold_ground=False)

    def process_data(self, data):
        ground_seg = data["ground_seg"]
        if (ground_seg > self.footprint_threshold).sum() < 100:
            return np.zeros((self.height, self.width))
        depth = np_pixel_disp_to_depth(
            data["disparity"], self.loader.K[0, 0],
            self.loader.stereo_baseline).astype(np.float32)
        mask = compute_depth_mask(
            self.next_key(), depth, ground_seg.astype(np.float32),
            self.loader.K, self.loader.invK, height=self.height,
            width=self.width, footprint_threshold=self.footprint_threshold)
        return mask  # device array; fetched on the writer thread


class MatterportGroundTruthGenerator(GroundTruthGenerator):
    height, width = 480, 640
    FRAME_PAD = 64  # pad scans to a multiple -> few compiled shapes

    def __init__(self, opts):
        super().__init__(opts)
        self.raw_datapath, self.training_datapath = self.parse_config(
            opts.config_path, "matterport")
        self.loader = MatterportLoader(self.raw_datapath, self.training_datapath,
                                       self.height, self.width,
                                       footprint_threshold=self.footprint_threshold)
        self.robust_aggregation = False

    def load_data(self, idx, filename):
        scan, pos, height, direction = filename.split()
        data = self.loader.load_data(scan, pos, height, direction)
        data = dict(data)
        data["depths"] = data["depths"] * data["ground_segs"]

        base_pose = self.loader.pose_tracker[(pos, height, direction)]
        inv_base = np.linalg.pinv(base_pose).astype(np.float32)
        # near-camera filter as a frame weight (static shapes)
        close = ((np.abs(base_pose[0, 3] - data["poses"][:, 0, 3]) < 10)
                 & (np.abs(base_pose[1, 3] - data["poses"][:, 1, 3]) < 10)
                 & (np.abs(base_pose[2, 3] - data["poses"][:, 2, 3]) < 1))
        data["depths"] = data["depths"] * close[:, None, None]
        data["poses"] = np.einsum("ij,njk->nik", inv_base, data["poses"])

        n = data["depths"].shape[0]
        target = -(-n // self.FRAME_PAD) * self.FRAME_PAD
        return _pad_frames(data, target)

    def save_result_for(self, result, filename):
        scan, pos, height, direction = filename.split()
        savepath = os.path.join(self.training_datapath, self.save_folder, scan)
        self.save_result(result, savepath, f"{pos}_{height}_{direction}",
                         save_viz=self.opts.save_visualisations)


class MatterportDepthMaskingGenerator(MatterportGroundTruthGenerator):
    def __init__(self, opts):
        super().__init__(opts)
        self.save_folder = opts.save_folder_name or "depth_masks"

    def load_data(self, idx, filename):
        scan, pos, height, direction = filename.split()
        ground_seg, depth, _, K = self.loader.load_frame_data(
            scan, pos, height, direction)
        return {"depth": depth.astype(np.float32),
                "ground_seg": ground_seg.astype(np.float32),
                "K": K.astype(np.float32),
                "invK": np.linalg.pinv(K).astype(np.float32)}

    def process_data(self, data):
        if (data["ground_seg"] > self.footprint_threshold).sum() < 100:
            return np.zeros((self.height, self.width))
        mask = compute_depth_mask(
            self.next_key(), data["depth"], data["ground_seg"], data["K"],
            data["invK"], height=self.height, width=self.width,
            footprint_threshold=self.footprint_threshold)
        return mask  # device array; fetched on the writer thread


def get_options(argv=None):
    parser = argparse.ArgumentParser(
        description="process frames to generate footprint training data")
    parser.add_argument("--config_path", type=str, default="paths.yaml")
    parser.add_argument("--type", type=str,
                        choices=["hidden_depths", "moving_objects", "depth_masks"])
    parser.add_argument("--data_type", type=str,
                        choices=["kitti", "matterport"])
    parser.add_argument("--save_folder_name", type=str)
    parser.add_argument("--save_visualisations", action="store_true")
    parser.add_argument("--textfile", type=str,
                        help="textfile containing frames to be computed")
    parser.add_argument("--idx_start", type=int, default=0)
    parser.add_argument("--idx_end", type=int, default=-1)
    parser.add_argument("--footprint_threshold", type=float, default=0.75)
    return parser.parse_args(argv)


GENERATORS = {
    ("kitti", "hidden_depths"): KITTIGroundTruthGenerator,
    ("kitti", "moving_objects"): KITTIMovingObjectDetector,
    ("kitti", "depth_masks"): KITTIDepthMaskingGenerator,
    ("matterport", "hidden_depths"): MatterportGroundTruthGenerator,
    ("matterport", "depth_masks"): MatterportDepthMaskingGenerator,
}


def main(argv=None):
    from ...platform_config import configure_from_env

    configure_from_env()
    opts = get_options(argv)
    try:
        cls = GENERATORS[(opts.data_type, opts.type)]
    except KeyError:
        raise NotImplementedError(
            f"no generator for data_type={opts.data_type}, type={opts.type}")
    cls(opts).run()


if __name__ == "__main__":
    main()
