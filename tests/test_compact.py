"""Compact host->device batch encoding (data/compact.py).

The 'exact' tier must be BITWISE lossless: uint8 image transport relies on
the image being u8/255 from PIL (data/base.py:preprocess) and on
f32(u8)/255.0 being the same IEEE divide on host and device; uint8 mask
transport relies on integral values.  The compactor must prove both on the
batch it locks its scheme on and fail loudly when the contract breaks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from footprints_tpu.data.compact import (
    BatchCompactor, decompact_batch, decompact_batch_np, decompact_on_device)


RNG = np.random.RandomState(7)


def realistic_batch(n=2, h=16, w=24):
    """Mirrors the dtype/value structure of the real training batch."""
    u8 = RNG.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    return {
        "image": u8.astype(np.float32) / np.float32(255.0),
        "visible_ground": RNG.randint(0, 2, (n, h, w)).astype(np.float32),
        "all_ground": RNG.randint(0, 2, (n, h, w)).astype(np.float32),
        "moving_object_mask": RNG.randint(0, 2, (n, h, w)).astype(np.float32),
        "depth_mask": RNG.randint(0, 2, (n, h, w)).astype(np.float32),
        "depth": (RNG.rand(n, h, w) * 80).astype(np.float32),
        "ground_depth": (RNG.rand(n, h, w) * 80).astype(np.float32),
    }, u8


def test_exact_mode_roundtrip_bitwise():
    batch, u8 = realistic_batch()
    compact = BatchCompactor("exact")(batch)
    # wire dtypes: u8 image (the ORIGINAL bytes), u8 masks, untouched depth
    assert compact["image"].dtype == np.uint8
    np.testing.assert_array_equal(compact["image"], u8)
    for k in ("visible_ground", "all_ground", "moving_object_mask",
              "depth_mask"):
        assert compact[k].dtype == np.uint8
    assert compact["depth"].dtype == np.float32
    assert compact["depth"] is batch["depth"]  # passthrough, no copy

    out = jax.jit(decompact_batch)(
        {k: jnp.asarray(v) for k, v in compact.items()})
    for k in batch:
        assert out[k].dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k]), k
    # host twin agrees bitwise too
    host = decompact_batch_np(compact)
    for k in batch:
        np.testing.assert_array_equal(host[k], batch[k])


def test_f16_mode_depth_tolerance():
    batch, _ = realistic_batch()
    compact = BatchCompactor("f16")(batch)
    assert compact["depth"].dtype == np.float16
    assert compact["ground_depth"].dtype == np.float16
    out = jax.jit(decompact_batch)(
        {k: jnp.asarray(v) for k, v in compact.items()})
    np.testing.assert_allclose(np.asarray(out["depth"]), batch["depth"],
                               rtol=1e-3)
    # lossless keys stay bitwise even in f16 mode
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])


def test_none_mode_and_f32_decompact_are_noops():
    batch, _ = realistic_batch()
    compact = BatchCompactor("none")(batch)
    assert all(np.asarray(v).dtype == np.float32 for v in compact.values())
    out = decompact_batch({k: jnp.asarray(v) for k, v in batch.items()})
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])


def test_non_u8_image_and_soft_mask_stay_f32():
    """Values outside the exact contracts must pass through uncompacted,
    not get silently quantized."""
    batch = {
        "image": RNG.rand(2, 8, 8, 3).astype(np.float32),  # not u8/255
        "soft_mask": (RNG.rand(2, 8, 8) * 0.9).astype(np.float32),
        "big_map": (RNG.rand(2, 8, 8) * 300).astype(np.float32),  # >255
    }
    compact = BatchCompactor("exact")(batch)
    assert compact["image"].dtype == np.float32
    assert compact["soft_mask"].dtype == np.float32
    assert compact["big_map"].dtype == np.float32


def test_locked_scheme_verify_always_raises_on_contract_break():
    batch, _ = realistic_batch()
    compactor = BatchCompactor("exact", verify="always")
    compactor(batch)  # locks u8 for the masks
    bad = dict(batch, depth_mask=batch["depth_mask"] + np.float32(0.5))
    with pytest.raises(ValueError, match="no longer integral"):
        compactor(bad)
    bad_img = dict(batch, image=batch["image"] * np.float32(0.5))
    with pytest.raises(ValueError, match="no longer exactly uint8/255"):
        compactor(bad_img)


def test_default_verify_catches_lossy_later_batch():
    """The guard must be LIVE after the locking batch (r4 verdict weak #2):
    a later batch violating the locked contract raises instead of silently
    quantizing into the training data."""
    batch, _ = realistic_batch()
    compactor = BatchCompactor("exact")  # default verify='strided'
    compactor(batch)  # locks the scheme with the full proof
    # broad corruption (every element off): the per-batch strided
    # spot-check must catch it immediately
    bad = dict(batch, depth_mask=batch["depth_mask"] + np.float32(0.5))
    with pytest.raises(ValueError, match="no longer integral"):
        compactor(bad)
    compactor2 = BatchCompactor("exact")
    compactor2(batch)
    bad_img = dict(batch, image=batch["image"] * np.float32(0.731))
    with pytest.raises(ValueError, match="no longer exactly uint8/255"):
        compactor2(bad_img)


def test_strided_full_reproof_catches_single_element():
    """A single corrupted element can dodge the strided subsample, but the
    periodic full proof must catch it within FULL_VERIFY_EVERY batches."""
    from footprints_tpu.data import compact as compact_mod

    batch, _ = realistic_batch()
    compactor = BatchCompactor("exact")
    compactor(batch)
    bad_mask = batch["depth_mask"].copy()
    bad_mask[0, 3, 5] = np.float32(0.5)  # off-stride single element
    bad = dict(batch, depth_mask=bad_mask)
    assert (bad_mask.reshape(-1)[::compact_mod.SPOT_STRIDE]
            == batch["depth_mask"].reshape(-1)
            [::compact_mod.SPOT_STRIDE]).all(), "corruption must dodge spot"
    with pytest.raises(ValueError, match="no longer integral"):
        for _ in range(compact_mod.FULL_VERIFY_EVERY + 1):
            compactor(bad)


def test_f16_overflow_never_locked_and_later_overflow_raises():
    """advisor r4: values > 65504 silently become inf under f16 — the
    compactor must refuse to lock f16 for such keys and must raise if a
    locked-f16 key later overflows."""
    batch, _ = realistic_batch()
    big = dict(batch, depth=(batch["depth"] + np.float32(1e5)))
    compact = BatchCompactor("f16")(big)
    assert compact["depth"].dtype == np.float32  # passthrough, not inf
    assert np.isfinite(compact["depth"]).all()

    compactor = BatchCompactor("f16")
    compactor(batch)  # locks depth -> f16 (values <= 80)
    overflow = dict(batch, depth=np.full_like(batch["depth"], 7e4))
    with pytest.raises(ValueError, match="exceeds float16 range"):
        compactor(overflow)


def test_scheme_driven_decode_preserves_native_dtypes():
    """advisor r4: dtype-driven decode silently upcasts keys that natively
    arrive as uint8/f16; the scheme-driven decode must leave them alone."""
    batch = {
        "image": (RNG.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
                  .astype(np.float32) / np.float32(255.0)),
        "label_ids": RNG.randint(0, 7, (2, 8, 8)).astype(np.uint8),
        "half_src": RNG.rand(2, 8, 8).astype(np.float16),
    }
    compactor = BatchCompactor("exact")
    compact = compactor(batch)
    scheme = compactor.scheme
    assert scheme["image"] == "u8_image"
    assert scheme["label_ids"] is None and scheme["half_src"] is None
    out = decompact_batch({k: jnp.asarray(v) for k, v in compact.items()},
                          scheme)
    assert out["label_ids"].dtype == jnp.uint8  # NOT upcast
    assert out["half_src"].dtype == jnp.float16
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    # host twin honors the scheme the same way
    host = decompact_batch_np(compact, scheme)
    assert host["label_ids"].dtype == np.uint8
    assert host["half_src"].dtype == np.float16


def test_f16x_lossless_tier_in_exact_mode():
    """A non-integral map whose values are exactly f16-representable (the
    matterport hidden_depth case: f16 .npy source + NEAREST resize) ships
    as float16 even in 'exact' mode and round-trips BITWISE."""
    batch, _ = realistic_batch()
    f16_src = (batch["ground_depth"].astype(np.float16).astype(np.float32))
    batch = dict(batch, ground_depth=f16_src)
    compactor = BatchCompactor("exact")
    compact = compactor(batch)
    assert compactor.scheme["ground_depth"] == "f16x"
    assert compact["ground_depth"].dtype == np.float16
    assert compact["depth"].dtype == np.float32  # not f16-exact: passthrough
    decoded = decompact_on_device(
        {k: jnp.asarray(v) for k, v in compact.items()}, compactor.scheme)
    np.testing.assert_array_equal(np.asarray(decoded["ground_depth"]),
                                  f16_src)
    assert decoded["ground_depth"].dtype == jnp.float32


def test_f16x_later_inexact_batch_raises():
    batch, _ = realistic_batch()
    f16_src = (batch["ground_depth"].astype(np.float16).astype(np.float32))
    compactor = BatchCompactor("exact")
    compactor(dict(batch, ground_depth=f16_src))  # locks f16x
    with pytest.raises(ValueError, match="float16-representable"):
        compactor(batch)  # raw f32 values: would quantize


def test_mesh_sharded_put_path_decode_bitwise_and_sharded():
    """advisor r4: the production multi-chip put path (compact ->
    shard_batch over the mesh -> decompact_on_device) was only ever tested
    single-device.  On the 8-device CPU mesh the decode must be bitwise AND
    keep the batch-axis sharding."""
    from footprints_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch, _ = realistic_batch(n=2 * n_dev)
    compactor = BatchCompactor("exact")
    compact = compactor(batch)
    sharded = shard_batch(mesh, {k: jnp.asarray(v)
                                 for k, v in compact.items()})
    decoded = decompact_on_device(sharded, compactor.scheme)
    for k in batch:
        assert decoded[k].dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(decoded[k]), batch[k])
        # batch axis still sharded over every device (not pulled together)
        assert len(decoded[k].sharding.device_set) == n_dev, k
        shard_rows = {s.data.shape[0] for s in decoded[k].addressable_shards}
        assert shard_rows == {2}, (k, shard_rows)


def test_put_path_decode_is_bitwise():
    """The trainer's put path (compact -> device -> decompact_on_device)
    must reproduce the raw f32 batch bitwise for every key."""
    batch, _ = realistic_batch()
    decoded = decompact_on_device(
        {k: jnp.asarray(v) for k, v in BatchCompactor("exact")(batch).items()})
    for k in batch:
        assert decoded[k].dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(decoded[k]), batch[k])


def test_train_step_bitwise_equal_under_exact_compaction():
    """The full jitted train step must produce BITWISE identical params and
    metrics whether fed the raw f32 batch or the put-path decode of its
    exact-compacted form (the decode is a SEPARATE dispatch — the step's
    compiled graph is identical in both runs, see data/compact.py)."""
    from footprints_tpu.models import FootprintNetwork
    from footprints_tpu.train import TrainStepConfig, init_train_state
    from footprints_tpu.train.step import build_train_step

    net = FootprintNetwork(depth=18)
    cfg = TrainStepConfig(steps_per_epoch=10, compute_dtype="bfloat16")
    state = init_train_state(net, jax.random.PRNGKey(0), cfg)
    step = build_train_step(net, cfg, mesh=None)

    batch, _ = realistic_batch(n=2, h=32, w=64)
    decoded = decompact_on_device(
        {k: jnp.asarray(v) for k, v in BatchCompactor("exact")(batch).items()})

    # donated args: build a fresh state per run
    s1, m1 = step(jax.tree.map(jnp.copy, state),
                  {k: jnp.asarray(v) for k, v in batch.items()})
    s2, m2 = step(jax.tree.map(jnp.copy, state), decoded)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (s1["params"], m1), (s2["params"], m2))
