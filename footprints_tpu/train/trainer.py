"""TrainManager — the training orchestrator (reference:
/root/reference/footprints/training/train.py:42-227).

TPU-first differences from the reference loop:
  * the whole step (forward+loss+backward+update) is ONE compiled XLA graph
    with donated train state; losses stay on device until log cadence;
  * data parallelism comes from a `jax.sharding` mesh (pass n>1 devices);
    the batch is split over the `data` axis, XLA all-reduces gradients;
  * the input pipeline is a threaded prefetch loader + device double
    buffering, not forked worker processes;
  * checkpoints carry optimizer state AND step counter, so `--load_path`
    resume continues the LR schedule (the reference restarted it).

Cadences match the reference bit-for-bit: console log every 100 steps;
tensorboard + validation at steps divisible by both 100 AND `log_freq`
(the reference nests the log_freq test inside the %100 branch — see
`log_cadence`); checkpoint + LR step per epoch.
"""

import os
import signal
import time

import jax
import numpy as np

from ..core.config import load_config, readlines
from ..data import DataLoader, DevicePrefetcher, get_dataset_class
from ..data.compact import BatchCompactor, decompact_on_device
from ..model_manager import ModelManager
from ..parallel import make_mesh, replicate_tree, shard_batch
from ..utils import sec_to_hm_str
from .evaluator import Evaluator
from .logger import TimeLogger, Timer, log
from .losses import LossConfig
from .step import TrainStepConfig, build_eval_step, build_train_step

SEED = 10


def log_cadence(step, log_freq):
    """Return (console, tb_and_val) firing decisions for a train step.

    Bit-identical to the reference control flow (reference
    training/train.py:161-185): the console log fires every 100 steps, and
    the tensorboard-log + validation check is NESTED inside that branch, so
    tb+val fire only at steps divisible by BOTH 100 and log_freq — i.e.
    every lcm(100, log_freq) steps (500 at the default log_freq=250).  That
    nesting is the reference's own behavior, preserved deliberately for
    parity; pinned by tests/test_trainer_cadence.py against a simulation of
    the reference loop.
    """
    console = step % 100 == 0
    tb_and_val = console and step % log_freq == 0
    return console, tb_and_val


class TrainManager:
    def __init__(self, options, devices=None):
        print("---------------\nsetting up...")
        self.opt = options
        if getattr(options, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)
        self.config = load_config(self.opt.config_path)

        self.train_loader, self.val_loader = self.create_dataloaders()
        steps_per_epoch = max(len(self.train_loader), 1)
        print(f"datasets done! train size - {len(self.train_loader.dataset)} images; "
              f"validation size - {len(self.val_loader.dataset)} images")

        self.model_manager = ModelManager(
            save_folder=os.path.join(self.opt.log_path, self.opt.model_name, "models"),
            learning_rate=self.opt.lr,
            lr_step_size=10,
            steps_per_epoch=steps_per_epoch,
            depth=getattr(self.opt, "encoder_depth", 34),
            seed=SEED,
            pretrained_encoder=getattr(self.opt, "pretrained_encoder", None),
        )
        if self.opt.load_path is not None:
            self.model_manager.load_model(weights_path=self.opt.load_path,
                                          load_optimiser=True)
        print("models done!")

        self.mesh = make_mesh(devices)
        n_dev = len(self.mesh.devices.flat)
        assert self.opt.batch_size % n_dev == 0, (
            f"batch_size {self.opt.batch_size} must divide over {n_dev} devices")

        # compact host->device encoding (data/compact.py): 'exact' transport
        # + separate-dispatch device decode is bitwise-identical to raw f32
        # (chip_parity.py --compact), so it is the default;
        # --host_batch_compact none restores raw-f32 transport
        self._compactor = BatchCompactor(
            getattr(self.opt, "host_batch_compact", "exact"))

        loss_config = LossConfig(
            min_depth=self.opt.depth_range[0],
            max_depth=self.opt.depth_range[1],
            footprint_prior_weight=self.opt.footprint_prior,
        )
        s2d_opt = getattr(self.opt, "s2d_head", "auto")
        p4_opt = getattr(self.opt, "p4_head", "auto")
        mixed = getattr(self.opt, "compute_dtype", None) in ("bfloat16", "bf16")
        self._s2d_head = s2d_opt == "on" or (s2d_opt == "auto" and mixed)
        self._p4_head = p4_opt == "on" or (p4_opt == "auto" and mixed)
        self.step_config = TrainStepConfig(
            learning_rate=self.opt.lr,
            steps_per_epoch=steps_per_epoch,
            loss=loss_config,
            compute_dtype=getattr(self.opt, "compute_dtype", None),
            s2d_head=self._s2d_head,
            p4_head=self._p4_head,
        )
        self.train_step = build_train_step(
            self.model_manager.net, self.step_config, mesh=self.mesh)
        self.eval_step = build_eval_step(
            self.model_manager.net, self.step_config, mesh=self.mesh)

        self.train_state = replicate_tree(self.mesh, self.model_manager.train_state())

        self.evaluator = Evaluator()
        try:
            from tensorboardX import SummaryWriter

            self.train_writer = SummaryWriter(
                os.path.join(self.opt.log_path, self.opt.model_name, "train"))
            self.val_writer = SummaryWriter(
                os.path.join(self.opt.log_path, self.opt.model_name, "val"))
        except ImportError:
            self.train_writer = self.val_writer = None
        self.timer = TimeLogger()

        self.step = int(np.asarray(self.model_manager.step))
        self.num_total_steps = steps_per_epoch * self.opt.epochs
        self.val_iter = iter(self.val_loader)
        # jit once: constructing jax.jit(lambda ...) inside _log would
        # retrace+recompile the full forward on every image-log event
        net = self.model_manager.net
        self._log_forward = jax.jit(
            lambda p, s, x: net.apply(p, s, x, train=False)[0])
        print("training setup complete!\n---------------")

    # ------------------------------------------------------------------

    def create_dataloaders(self):
        dataset = self.opt.training_dataset
        raw_data_path = self.config[dataset]["dataset"]
        training_data_path = self.config[dataset]["training_data"]
        split_root = getattr(self.opt, "split_root", "splits")
        train_files = readlines(os.path.join(split_root, dataset, "train.txt"))
        val_files = readlines(os.path.join(split_root, dataset, "val.txt"))
        dataset_class = get_dataset_class(dataset)

        common = dict(
            height=self.opt.height, width=self.opt.width,
            no_depth_mask=self.opt.no_depth_mask,
            moving_objects_method=self.opt.moving_objects_method,
            project_down_baseline=self.opt.project_down_baseline,
        )
        train_dataset = dataset_class(raw_data_path, training_data_path, train_files,
                                      is_train=True, seed=SEED, **common)
        val_dataset = dataset_class(raw_data_path, training_data_path, val_files,
                                    is_train=False, seed=SEED, **common)
        train_loader = DataLoader(train_dataset, self.opt.batch_size, shuffle=True,
                                  num_workers=self.opt.num_workers, seed=SEED)
        val_loader = DataLoader(val_dataset, self.opt.batch_size, shuffle=True,
                                num_workers=min(2, self.opt.num_workers),
                                drop_last=True, seed=SEED)
        return train_loader, val_loader

    # ------------------------------------------------------------------

    def train(self):
        print("training...")
        self.start_time = time.time()
        self._preempt_requested = False
        # Preemption safety (TPU fleets get SIGTERM before eviction): save a
        # resumable checkpoint at the end of the in-flight step instead of
        # losing the epoch.  The reference only checkpoints per epoch.
        try:
            prev_handler = signal.signal(signal.SIGTERM, self._on_preempt)
        except ValueError:  # not the main thread (e.g. driven from a test)
            prev_handler = None
        try:
            for self.epoch in range(self.opt.epochs):
                if self.run_epoch():
                    print("training preempted — resume with "
                          "--load_path .../weights_interrupt")
                    return
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        self._sync_model_manager()
        print("training complete!")

    def _on_preempt(self, signum, frame):
        print("SIGTERM received: will checkpoint after the current step...")
        self._preempt_requested = True

    def run_epoch(self):
        device_iter = DevicePrefetcher(
            iter(self.train_loader), lambda b: self._put(b), depth=2)

        profile_dir = getattr(self.opt, "profile_dir", None)
        last_batch = None
        for batch_idx, batch in enumerate(device_iter):
            if profile_dir and self.step == 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and self.step == 15:
                jax.profiler.stop_trace()
            before = time.time()
            self.train_state, metrics = self.train_step(self.train_state, batch)
            self.evaluator.accumulate(
                {k: v for k, v in metrics.items() if k != "lr"}, mode="train")
            self.lr = metrics["lr"]
            last_batch = batch
            self.timer.add_time("train_network_time", time.time() - before)

            console, tb_and_val = log_cadence(self.step, self.opt.log_freq)
            if console:
                losses = self.evaluator.get_averaged_losses("train", reset=False)
                print(f"Epoch {self.epoch} -- Batch {batch_idx} -- "
                      f"Loss {losses.get('loss', float('nan')):.4f}")
                self.timer.print_time()
                elapsed = time.time() - self.start_time
                left = ((self.num_total_steps / self.step - 1.0) * elapsed
                        if self.step else 0)
                print(f"time elapsed/left: {sec_to_hm_str(elapsed)}/"
                      f"{sec_to_hm_str(left)}")

                if tb_and_val:
                    losses = self.evaluator.get_averaged_losses("train", reset=True)
                    with Timer(self.timer, "log_time"):
                        self._log(self.train_writer, batch, losses)
                    self.val()
            self.step += 1
            if getattr(self, "_preempt_requested", False):
                self._sync_model_manager()
                self.model_manager.save_model(folder_name="weights_interrupt")
                print(f"preemption checkpoint saved at step {self.step}")
                return True

        print(f"Epoch {self.epoch} complete!")
        self._sync_model_manager()
        self.model_manager.save_model(folder_name=f"weights_{self.epoch}")
        return False

    def val(self):
        with Timer(self.timer, "val_time"):
            print("validating...")
            batch = None
            for _ in range(self.opt.val_batches):
                try:
                    host_batch = next(self.val_iter)
                except StopIteration:
                    self.val_iter = iter(self.val_loader)
                    host_batch = next(self.val_iter)
                batch = self._put(host_batch)
                losses = self.eval_step(
                    self.train_state["params"], self.train_state["state"], batch)
                self.evaluator.accumulate(losses, mode="val")
            print("validation complete!")
        losses = self.evaluator.get_averaged_losses("val", reset=True)
        with Timer(self.timer, "log_time"):
            self._log(self.val_writer, batch, losses)

    # ------------------------------------------------------------------

    # targets the s2d-basis '1/1' loss consumes packed (train/losses.py)
    _S2D_TARGET_KEYS = ("visible_ground", "all_ground", "depth",
                        "ground_depth", "depth_mask", "moving_object_mask")

    def _put(self, host_batch):
        # compact wire bytes, then decode to f32 on device in a separate
        # dispatch — the train step's compiled graph never sees uint8.
        # The decode is driven by the compactor's locked scheme (read AFTER
        # encoding locks it) so passthrough keys keep their native dtypes.
        # With the s2d/p4 heads, the '<k>@s2d'/'<k>@s2d2' packed targets
        # are built in the same dispatch — off the train step.
        compact = self._compactor(host_batch)
        s2d_keys = self._S2D_TARGET_KEYS if self._s2d_head else ()
        p4_keys = self._S2D_TARGET_KEYS if self._p4_head else ()
        return decompact_on_device(shard_batch(self.mesh, compact),
                                   self._compactor.scheme, s2d_keys, p4_keys)

    def _log(self, writer, batch, losses):
        if writer is None:
            return
        inputs = outputs = None
        if getattr(self.opt, "log_images", False) and batch is not None:
            out = self._log_forward(
                self.train_state["params"], self.train_state["state"],
                batch["image"])
            outputs = np.asarray(out["1/1"][:4])
            # skip the packed-target keys ('@s2d' AND '@s2d2'): the logger
            # reads only full-res maps, and fetching the packs would move
            # ~12 MB/log-event over the (slow) device->host link for nothing
            inputs = {k: np.asarray(v[:4]) for k, v in batch.items()
                      if "@s2d" not in k}
        log(writer, inputs, outputs, losses, float(np.asarray(self.lr)), self.step)

    def _sync_model_manager(self):
        host = jax.tree.map(np.asarray, self.train_state)
        self.model_manager.set_train_state(host)
