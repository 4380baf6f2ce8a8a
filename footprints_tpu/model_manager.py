"""Model lifecycle: network + optimizer + schedule + save/load.

Mirrors the reference ModelManager's role
(/root/reference/footprints/model_manager.py:14-56): Adam(lr=1e-4) +
StepLR(step_size=10 epochs), per-epoch checkpoint folders.  Two checkpoint
formats are understood on load:

  * ``model.pth``  — a reference PyTorch checkpoint, read torch-free via
    footprints_tpu.convert and transposed into NHWC pytrees;
  * ``checkpoint.npz`` — this framework's native format (params + BN state +
    optimizer state + step, so resume continues the LR schedule exactly —
    fixing the reference's lost-schedule-on-resume behavior, SURVEY.md §5).
"""

import os

import jax
import numpy as np

from .convert import footprint_params_from_state_dict, load_torch_state_dict
from .models import FootprintNetwork
from .train.checkpoint import load_checkpoint, restore_into, save_checkpoint
from .train.step import TrainStepConfig, make_optimizer

CHECKPOINT_NAME = "checkpoint.npz"


class ModelManager:
    def __init__(self, save_folder=None, is_inference=False, learning_rate=1e-4,
                 lr_step_size=10, steps_per_epoch=1, depth=34, seed=10,
                 pretrained_encoder=None):
        self.save_folder = save_folder
        self.is_inference = is_inference
        self.net = FootprintNetwork(depth=depth)
        # Initialize on the host CPU backend: params then live in host RAM
        # and flow TO the accelerator on first use (uploads are cheap).  This
        # keeps checkpoint save/load of fresh models off the device->host
        # path entirely.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            self.params, self.state = self.net.init(jax.random.PRNGKey(seed))
        if pretrained_encoder is not None:
            # the reference trains from an ImageNet-pretrained encoder
            # (reference network.py:38); decoders stay randomly initialized
            from .convert import resolve_pretrained_encoder

            print(f"initializing encoder from {pretrained_encoder}...")
            enc_p, enc_s = resolve_pretrained_encoder(
                pretrained_encoder, depth=depth,
                expected=(self.params["encoder"], self.state["encoder"]))
            self.params["encoder"] = enc_p
            self.state["encoder"] = enc_s
        self.step = np.zeros((), np.int32)

        self.config = TrainStepConfig(
            learning_rate=learning_rate,
            scheduler_step_epochs=lr_step_size,
            steps_per_epoch=steps_per_epoch,
        )
        if not is_inference:
            self.opt_state = make_optimizer(self.config).init(self.params)
        else:
            self.opt_state = None

    # -- persistence ---------------------------------------------------------

    def train_state(self):
        return {
            "params": self.params,
            "state": self.state,
            "opt_state": self.opt_state,
            "step": self.step,
        }

    def set_train_state(self, ts):
        self.params = ts["params"]
        self.state = ts["state"]
        self.opt_state = ts["opt_state"]
        self.step = ts["step"]

    def load_model(self, weights_path, load_optimiser=False):
        """Load from a directory holding model.pth (torch) or checkpoint.npz."""
        native = os.path.join(weights_path, CHECKPOINT_NAME)
        torch_ckpt = os.path.join(weights_path, "model.pth")
        if os.path.exists(native):
            print(f"loading native checkpoint from {native}...")
            loaded = load_checkpoint(native)
            self.params = restore_into(self.params, loaded["params"])
            self.state = restore_into(self.state, loaded["state"])
            self.step = np.asarray(loaded["step"])
            if load_optimiser and self.opt_state is not None:
                self.opt_state = restore_into(self.opt_state, loaded["opt_state"])
        elif os.path.exists(torch_ckpt):
            print(f"loading torch checkpoint from {torch_ckpt}...")
            sd = load_torch_state_dict(torch_ckpt)
            self.params, self.state = footprint_params_from_state_dict(
                sd, depth=self.net.depth
            )
            if load_optimiser:
                print("note: torch optimiser state is not imported; "
                      "optimizer restarts fresh")
        else:
            raise FileNotFoundError(
                f"no checkpoint found in {weights_path} "
                f"(looked for {CHECKPOINT_NAME} and model.pth)")
        print("successfully loaded weights!")

    def save_model(self, folder_name):
        save_path = os.path.join(self.save_folder, folder_name)
        os.makedirs(save_path, exist_ok=True)
        dest = os.path.join(save_path, CHECKPOINT_NAME)
        print(f"saving checkpoint to {dest}...")
        host_state = jax.tree.map(np.asarray, self.train_state())
        save_checkpoint(dest, host_state)
        print("success!")
