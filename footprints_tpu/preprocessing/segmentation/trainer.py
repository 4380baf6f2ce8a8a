"""Segmentation Trainer (reference:
/root/reference/footprints/preprocessing/segmentation/train.py:27-227).

Same TPU-first structure as the main TrainManager: one jitted
forward+loss+backward+update graph, data-parallel over the mesh,
device-resident loss accumulation.  Defaults mirror the reference: datasets
[ADE20K, cityscapes] via concat (matterport train list truncated to 5,000),
epochs 20, Adam(1e-4) + StepLR(10), per-epoch model checkpoints
(epoch_<n>/checkpoint.npz, optimizer state not saved — reference saved
model-only .pth).
"""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core.config import load_config, readlines
from ...data.compact import BatchCompactor, decompact_on_device
from ...data.loader import DataLoader, DevicePrefetcher
from ...models import Segmentor
from ...parallel import make_mesh, replicate_tree, shard_batch
from ...parallel import mesh as meshlib
from ...train.checkpoint import load_checkpoint, restore_into, save_checkpoint
from ...train.evaluator import Evaluator
from ...convert import segmentor_params_from_state_dict, load_torch_state_dict
from .datasets import ConcatDataset, get_dataset_class
from .losses import compute_seg_losses

SEED = 10
MATTERPORT_TRAIN_CAP = 5000


def _load_segmentor_weights(net, load_path):
    """Load Segmentor weights from epoch_<n>.pth (torch) or checkpoint.npz."""
    if load_path.endswith(".pth"):
        sd = load_torch_state_dict(load_path)
        return segmentor_params_from_state_dict(sd, depth=net.depth,
                                                use_psp=net.use_psp)
    ckpt = load_path if load_path.endswith(".npz") else os.path.join(
        load_path, "checkpoint.npz")
    loaded = load_checkpoint(ckpt)
    params, state = net.init(jax.random.PRNGKey(0))
    return restore_into(params, loaded["params"]), restore_into(
        state, loaded["state"])


class Trainer:
    def __init__(self, options, devices=None):
        print("setting up...")
        self.opt = options
        self.config = load_config(self.opt.config_path)

        self.net = Segmentor(depth=getattr(self.opt, "encoder_depth", 34),
                             use_psp=not self.opt.no_PSP)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            self.params, self.state = self.net.init(jax.random.PRNGKey(SEED))
        pretrained = getattr(self.opt, "pretrained_encoder", None)
        if pretrained is not None:
            # reference seg network also starts from ImageNet weights
            # (reference preprocessing/segmentation/network.py:32)
            from ...convert import resolve_pretrained_encoder

            print(f"initializing encoder from {pretrained}...")
            self.params["encoder"], self.state["encoder"] = (
                resolve_pretrained_encoder(
                    pretrained, depth=self.net.depth,
                    expected=(self.params["encoder"],
                              self.state["encoder"])))
        if self.opt.load_path is not None:
            self.params, self.state = _load_segmentor_weights(
                self.net, self.opt.load_path)

        self.train_loader, self.val_loader = self.create_dataloaders()
        steps_per_epoch = max(len(self.train_loader), 1)
        print(f"training images: {len(self.train_loader.dataset)}; "
              f"validation images: {len(self.val_loader.dataset)}")

        schedule = lambda step: self.opt.lr * 0.1 ** (
            step // (10 * steps_per_epoch))
        self.optimizer = optax.adam(schedule)
        self.opt_state = self.optimizer.init(self.params)
        self.schedule = schedule

        self.mesh = make_mesh(devices)
        n_dev = len(self.mesh.devices.flat)
        assert self.opt.batch_size % n_dev == 0
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

        self.train_state = replicate_tree(self.mesh, {
            "params": self.params, "state": self.state,
            "opt_state": self.opt_state,
            "step": np.zeros((), np.int32),
        })

        self.evaluator = Evaluator()
        try:
            from tensorboardX import SummaryWriter

            self.train_writer = SummaryWriter(os.path.join(
                self.opt.log_path, self.opt.model_name, "train"))
            self.val_writer = SummaryWriter(os.path.join(
                self.opt.log_path, self.opt.model_name, "val"))
        except ImportError:
            self.train_writer = self.val_writer = None
        # jit once: constructing jax.jit(lambda ...) inside _log would
        # retrace/recompile the full forward on every image-log event
        # (same fix as train/trainer.py's _log_forward)
        self._log_forward = jax.jit(
            lambda p, st, im: self.net.apply(p, st, im, train=False)[0])
        self.step = 0
        self.val_iter = iter(self.val_loader)
        # compact host->device encoding (data/compact.py; 'exact' transport
        # + separate-dispatch device decode is bitwise-lossless — seg images
        # are u8/255, masks binary)
        self._compactor = BatchCompactor(
            getattr(self.opt, "host_batch_compact", "exact"))

    # ------------------------------------------------------------------

    def _build_train_step(self):
        optimizer = self.optimizer
        net = self.net
        mixed = getattr(self.opt, "compute_dtype", None) in ("bfloat16",
                                                             "bf16")

        def loss_fn(params, state, batch):
            if mixed:
                # bf16 compute copy of the params; grads flow back to the
                # f32 masters (loss stays f32 — compute_seg_losses upcasts
                # the logits — same design as train/step.py's mixed path)
                fwd_params = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16) if a is not None
                    else None, params)
                image = batch["image"].astype(jnp.bfloat16)
            else:
                fwd_params, image = params, batch["image"]
            outputs, new_state = net.apply(fwd_params, state, image,
                                           train=True)
            losses = compute_seg_losses(outputs, batch["ground_mask"],
                                        batch["labelled_pix"])
            return losses["loss"], (new_state, losses)

        def step_fn(ts, batch):
            grads, (new_state, losses) = jax.grad(loss_fn, has_aux=True)(
                ts["params"], ts["state"], batch)
            updates, new_opt = optimizer.update(grads, ts["opt_state"], ts["params"])
            new_params = optax.apply_updates(ts["params"], updates)
            return ({"params": new_params, "state": new_state,
                     "opt_state": new_opt, "step": ts["step"] + 1}, losses)

        repl = meshlib.replicated(self.mesh)
        data = meshlib.batch_sharded(self.mesh)
        return jax.jit(step_fn, donate_argnums=(0,),
                       in_shardings=(repl, data), out_shardings=(repl, repl))

    def _build_eval_step(self):
        net = self.net

        def eval_fn(params, state, batch):
            outputs, _ = net.apply(params, state, batch["image"], train=False)
            return compute_seg_losses(outputs, batch["ground_mask"],
                                      batch["labelled_pix"])

        repl = meshlib.replicated(self.mesh)
        data = meshlib.batch_sharded(self.mesh)
        return jax.jit(eval_fn, in_shardings=(repl, repl, data),
                       out_shardings=repl)

    # ------------------------------------------------------------------

    def create_dataloaders(self):
        train_sets, val_sets = [], []
        split_root = getattr(self.opt, "split_root", "splits")
        for name in self.opt.training_datasets:
            dataset_path = self.config[name]["dataset"]
            train_files = readlines(os.path.join(split_root, name, "train.txt"))
            val_files = readlines(os.path.join(split_root, name, "val.txt"))
            if name == "matterport":
                train_files = train_files[:MATTERPORT_TRAIN_CAP]
            cls = get_dataset_class(name)
            train_sets.append(cls(dataset_path, train_files, self.opt.height,
                                  self.opt.width, is_train=True, seed=SEED))
            val_sets.append(cls(dataset_path, val_files, self.opt.height,
                                self.opt.width, is_train=False, seed=SEED))
        train_loader = DataLoader(ConcatDataset(train_sets), self.opt.batch_size,
                                  shuffle=True, num_workers=self.opt.num_workers,
                                  seed=SEED)
        val_loader = DataLoader(ConcatDataset(val_sets), self.opt.batch_size,
                                shuffle=True, drop_last=True,
                                num_workers=min(2, self.opt.num_workers),
                                seed=SEED)
        return train_loader, val_loader

    # ------------------------------------------------------------------

    def train(self):
        print("training")
        self._preempt_requested = False
        # preemption safety, same contract as the main TrainManager: SIGTERM
        # -> resumable checkpoint at the end of the in-flight step
        try:
            prev_handler = signal.signal(signal.SIGTERM, self._on_preempt)
        except ValueError:  # not the main thread
            prev_handler = None
        try:
            for self.epoch in range(self.opt.epochs):
                if self.run_epoch():
                    print("training preempted — resume from epoch_interrupt")
                    return
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _on_preempt(self, signum, frame):
        print("SIGTERM received: will checkpoint after the current step...")
        self._preempt_requested = True

    def _put(self, host_batch):
        # compact wire bytes, then decode to f32 on device in a separate
        # dispatch — the train step's compiled graph never sees uint8
        # (same design + rationale as train/trainer.py:_put)
        compact = self._compactor(host_batch)
        return decompact_on_device(shard_batch(self.mesh, compact),
                                   self._compactor.scheme)

    def run_epoch(self):
        device_iter = DevicePrefetcher(
            iter(self.train_loader), self._put, depth=2)
        for i, batch in enumerate(device_iter):
            self.train_state, losses = self._train_step(self.train_state, batch)
            self.evaluator.accumulate(losses, mode="train")
            self.lr = float(self.schedule(self.step))

            if self.step % self.opt.log_freq == 0:
                tracked = self.evaluator.get_averaged_losses("train", reset=True)
                self._log(self.train_writer, tracked, batch)
                val_losses = self.run_validation()
                print(f"Epoch {self.epoch} -- Step {self.step} -- "
                      f"Train Loss {tracked.get('loss', float('nan')):.4f} -- "
                      f"Val Loss {val_losses.get('loss', float('nan')):.4f}")
            self.step += 1
            if getattr(self, "_preempt_requested", False):
                self.save_model(tag="interrupt")
                print(f"preemption checkpoint saved at step {self.step}")
                return True
        self.save_model()
        return False

    def run_validation(self, batches=None):
        batches = batches or self.opt.val_batches
        batch = None
        for _ in range(batches):
            try:
                host_batch = next(self.val_iter)
            except StopIteration:
                self.val_iter = iter(self.val_loader)
                host_batch = next(self.val_iter)
            batch = self._put(host_batch)
            losses = self._eval_step(self.train_state["params"],
                                     self.train_state["state"], batch)
            self.evaluator.accumulate(losses, mode="val")
        tracked = self.evaluator.get_averaged_losses("val", reset=True)
        self._log(self.val_writer, tracked, batch)
        return tracked

    def _log(self, writer, losses, batch=None, num_outputs=10):
        if writer is None:
            return
        writer.add_scalar("lr", self.lr, self.step)
        for k, v in losses.items():
            writer.add_scalar(k, float(v), self.step)
        if batch is not None and getattr(self.opt, "log_images", False):
            # [image | gt-mask | sigmoid pred] panels (reference logger.py)
            outs = self._log_forward(
                self.train_state["params"], self.train_state["state"],
                batch["image"])
            pred = np.asarray(jax.nn.sigmoid(outs[3][..., 0]))
            import matplotlib.pyplot as plt

            cm = plt.get_cmap("plasma")
            n = min(num_outputs, pred.shape[0])
            for i in range(n):
                img = np.asarray(batch["image"][i])
                gt = cm(np.asarray(batch["ground_mask"][i]))[..., :3]
                pd = cm(pred[i])[..., :3]
                strip = np.concatenate([img, gt, pd], axis=1)
                writer.add_image(f"panel/{i}",
                                 np.transpose(strip, (2, 0, 1)), self.step)

    def save_model(self, tag=None):
        save_path = os.path.join(self.opt.log_path, self.opt.model_name, "models")
        os.makedirs(save_path, exist_ok=True)
        host = jax.tree.map(np.asarray, {
            "params": self.train_state["params"],
            "state": self.train_state["state"],
        })
        name = f"epoch_{self.epoch if tag is None else tag}"
        dest = os.path.join(save_path, name, "checkpoint.npz")
        save_checkpoint(dest, host)
        print(f"saved {dest}")
