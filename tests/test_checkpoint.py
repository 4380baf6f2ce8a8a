"""Checkpoint roundtrip tests, including optax NamedTuple states and resume
semantics (step counter preserved -> LR schedule continues)."""

import numpy as np

import jax
import jax.numpy as jnp

from footprints_tpu.train.checkpoint import load_checkpoint, restore_into, save_checkpoint
from footprints_tpu.train.step import TrainStepConfig, init_train_state, make_optimizer

from .test_train_step import TinyNet


def test_roundtrip_nested_pytree(tmp_path):
    tree = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": {"c": np.asarray(3), "d": None},
        "lst": [np.ones(2), {"x": np.zeros(1)}],
        "tup": (np.asarray(1.5), np.asarray(2.5)),
        "empty": {},
    }
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, tree)
    loaded = load_checkpoint(p)
    assert loaded["b"]["d"] is None
    assert isinstance(loaded["lst"], list)
    assert isinstance(loaded["tup"], tuple)
    assert loaded["empty"] == {}
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["lst"][1]["x"], np.zeros(1))


def test_roundtrip_optax_state(tmp_path):
    net = TinyNet()
    config = TrainStepConfig()
    ts = init_train_state(net, jax.random.PRNGKey(0), config)
    # advance adam state so mu/nu are non-trivial
    opt = make_optimizer(config)
    grads = jax.tree.map(jnp.ones_like, ts["params"])
    updates, new_opt_state = opt.update(grads, ts["opt_state"], ts["params"])
    ts["opt_state"] = new_opt_state
    ts["step"] = jnp.asarray(7, jnp.int32)

    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, jax.tree.map(np.asarray, ts))
    loaded = load_checkpoint(p)

    template = init_train_state(net, jax.random.PRNGKey(1), config)
    restored = restore_into(template, loaded)
    assert int(restored["step"]) == 7
    # NamedTuple types preserved
    assert type(restored["opt_state"]) is type(template["opt_state"])
    assert type(restored["opt_state"][0]) is type(template["opt_state"][0])
    # optimizer continues from restored state identically
    u1, _ = opt.update(grads, ts["opt_state"], ts["params"])
    u2, _ = opt.update(grads, restored["opt_state"], restored["params"])
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_model_manager_save_load(tmp_path):
    from footprints_tpu.model_manager import ModelManager

    mm = ModelManager(save_folder=str(tmp_path), is_inference=False,
                      steps_per_epoch=5)
    mm.step = np.asarray(42, np.int32)
    mm.save_model("weights_0")

    mm2 = ModelManager(save_folder=str(tmp_path), is_inference=False,
                       steps_per_epoch=5, seed=99)
    mm2.load_model(str(tmp_path / "weights_0"), load_optimiser=True)
    assert int(mm2.step) == 42
    for a, b in zip(jax.tree.leaves(mm.params), jax.tree.leaves(mm2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_manager_loads_torch_checkpoint(tmp_path):
    import torch

    from footprints_tpu.model_manager import ModelManager

    from . import torch_oracle

    torch.manual_seed(0)
    tnet = torch_oracle.FootprintNetwork().eval()
    ckpt_dir = tmp_path / "weights"
    ckpt_dir.mkdir()
    torch.save(tnet.state_dict(), str(ckpt_dir / "model.pth"))

    mm = ModelManager(is_inference=True)
    mm.load_model(str(ckpt_dir))
    # sanity: converted stem weights match
    w = np.asarray(mm.params["encoder"]["stem_conv"]["w"])
    ref = np.transpose(tnet.encoder.layer0[0].weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(w, ref, atol=1e-7)
