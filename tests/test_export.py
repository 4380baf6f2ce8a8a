"""AOT serving export (footprints_tpu/export.py): artifact round-trips.

The exported StableHLO module must reproduce the live forward exactly on
the same backend (same XLA program, same constants), carry honest
metadata, and lower for multiple platforms from a CPU host.
"""

import json
import os

import numpy as np
import pytest

from footprints_tpu.export import export_serving, load_serving, main
from footprints_tpu.model_manager import ModelManager

H, W, B = 64, 96, 2


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("export_weights")
    mm = ModelManager(save_folder=str(d), is_inference=True)
    mm.save_model("weights_0")
    return str(d / "weights_0")


@pytest.fixture(scope="module")
def artifact(weights_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export_out") / "model.stablehlo")
    meta = export_serving(weights_dir, out, height=H, width=W, batch=B,
                          dtype="float32", platforms=("cpu",))
    return out, meta


def test_export_roundtrip_matches_live_forward(weights_dir, artifact):
    out, _ = artifact
    model = load_serving(out)
    rng = np.random.RandomState(0)
    images = rng.rand(B, H, W, 3).astype(np.float32)

    got = model.call(images)

    mm = ModelManager(is_inference=True)
    mm.load_model(weights_dir)
    import jax.numpy as jnp

    live, _ = mm.net.apply(mm.params, mm.state, jnp.asarray(images),
                           train=False)
    want = np.transpose(np.asarray(live["1/1"]), (0, 3, 1, 2))
    assert got.shape == (B, 4, H, W)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_export_metadata_sidecar(artifact):
    out, meta = artifact
    with open(out + ".json") as f:
        side = json.load(f)
    assert side == meta
    assert side["height"] == H and side["width"] == W and side["batch"] == B
    assert side["channels"][0] == "visible_ground_logit"
    assert side["bytes"] == os.path.getsize(out)
    # weights are baked in: a 33M-param f32 model can't serialize small
    assert side["bytes"] > 10e6


def test_serving_model_pads_and_splits_odd_batches(artifact):
    out, _ = artifact
    model = load_serving(out)
    rng = np.random.RandomState(1)
    images = rng.rand(2 * B + 1, H, W, 3).astype(np.float32)
    got = model.call(images)
    assert got.shape == (2 * B + 1, 4, H, W)
    # the padded lane must not leak into real outputs: last item alone
    # equals its slot in the batched call
    solo = model.call(images[-1:])
    np.testing.assert_allclose(got[-1:], solo, atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        model.call(images[:, : H // 2])


def test_multiplatform_export_from_cpu_host(weights_dir, tmp_path):
    out = str(tmp_path / "multi.stablehlo")
    meta = export_serving(weights_dir, out, height=H, width=W, batch=1,
                          dtype="bfloat16", platforms=("tpu", "cpu"))
    assert meta["platforms"] == ["tpu", "cpu"]
    model = load_serving(out)
    got = model.call(np.full((1, H, W, 3), 0.5, np.float32))
    assert got.dtype == np.float32
    assert np.isfinite(got).all()


def test_segmentor_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from footprints_tpu.models import Segmentor
    from footprints_tpu.train.checkpoint import save_checkpoint

    net = Segmentor(depth=18)
    params, state = net.init(jax.random.PRNGKey(3))
    ckpt = str(tmp_path / "checkpoint.npz")
    save_checkpoint(ckpt, jax.tree.map(
        np.asarray, {"params": params, "state": state}))

    out = str(tmp_path / "seg.stablehlo")
    meta = export_serving(ckpt, out, height=32, width=64, batch=2,
                          dtype="float32", platforms=("cpu",), depth=18,
                          network="segmentor")
    assert meta["model"] == "Segmentor" and meta["use_psp"] is True

    model = load_serving(out)
    imgs = np.random.RandomState(2).rand(2, 32, 64, 3).astype(np.float32)
    got = model.call(imgs)
    assert got.shape == (2, 32, 64) and got.dtype == np.float16

    live, _ = net.apply(params, state, jnp.asarray(imgs), train=False)
    want = np.asarray(jax.nn.sigmoid(live[3][..., 0]), np.float16)
    np.testing.assert_allclose(np.float32(got), np.float32(want), atol=1e-3)


def test_predict_simple_serves_from_artifact(weights_dir, artifact, tmp_path):
    from footprints_tpu.predict_simple import main as ps_main

    img = os.path.join(os.path.dirname(__file__), "..", "test_data",
                       "cyclist.jpg")
    out, _ = artifact
    d_art, d_live = str(tmp_path / "art"), str(tmp_path / "live")
    ps_main(["--image", img, "--artifact", out, "--save_dir", d_art,
             "--no_save_vis"])
    ps_main(["--image", img, "--model_path", weights_dir,
             "--height", str(H), "--width", str(W), "--save_dir", d_live,
             "--no_save_vis"])
    a = np.load(os.path.join(d_art, "outputs", "cyclist.npy"))
    b = np.load(os.path.join(d_live, "outputs", "cyclist.npy"))
    assert a.shape == (4, H, W)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_predict_simple_artifact_resolution_conflict(artifact, tmp_path):
    from footprints_tpu.predict_simple import InferenceManager

    out, _ = artifact
    with pytest.raises(ValueError, match="conflict"):
        InferenceManager(model_name=None, save_dir=str(tmp_path / "x"),
                         artifact=out, height=H * 2, width=W)


def test_export_cli(weights_dir, tmp_path):
    out = str(tmp_path / "cli.stablehlo")
    main(["--model_path", weights_dir, "--out", out,
          "--height", str(H), "--width", str(W), "--batch", "1",
          "--dtype", "float32", "--platforms", "cpu"])
    assert os.path.exists(out) and os.path.exists(out + ".json")
