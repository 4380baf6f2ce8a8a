"""Compact host->device batch encoding: ship uint8/f16, upcast on device.

The f32 training batch is ~4.2 MB/image (192x640: one [H,W,3] image + six
[H,W] maps), but almost none of that is real information: the image is
uint8/255 from PIL (the color jitter operates in PIL uint8 space,
data/base.py:preprocess), four of the maps are binary {0,1}, and the two
depth maps were loaded from float16 .npy files in the first place
(reference training data format — /root/reference/footprints/datasets/
*_dataset.py).  Shipping the compact encodings and upcasting on device cuts
the host->device bytes ~58% losslessly ('exact' mode) or ~69% with f16
depth transport ('f16' mode), and shrinks pinned-host + HBM staging
traffic by the same factor on any host.

Exactness contract:
  * image: u8 -> f32/255 on device is BITWISE identical to the host f32
    path (u8/255.0 is an IEEE f32 divide on both sides; round-tripping the
    host f32 through rint(a*255) recovers the original uint8 exactly).
    Verified on the chip backend by tools/chip_parity.py --ops (u8_decode).
  * binary/integral maps: uint8 transport is exact by construction; the
    compactor proves exactness on the batch it inspects (see `verify`).
  * 'f16x' (lossless f16): a non-integral f32 map whose locking batch
    proves every value exactly float16-representable ships as f16 and
    decodes BITWISE — e.g. the matterport hidden_depth, which originates
    in f16 .npy files and only passes through NEAREST resize / sentinel
    zeroing / clipping (data/matterport.py).  Available in 'exact' mode
    because it is lossless; guarded per batch like the u8 tiers.
  * 'f16' mode: remaining f32 depth maps lose ~1e-3 relative — measurably
    nothing for training (the f16 source files quantized harder), but NOT
    bitwise, so it is opt-in and off in parity tests.  Keys whose values
    would overflow float16 (|x| > 65504 -> inf) are never locked to f16;
    they pass through as f32.

The per-key scheme is locked on the first batch (jit sees one stable set
of dtypes; no recompiles) and applied to every later batch.  The guard is
LIVE on every batch (verify="strided", the default): the locking batch
gets the full exactness proof, every later batch gets a strided-subsample
proof (~0.4% of elements, measured <1% of encode cost), and every
FULL_VERIFY_EVERY-th batch per key gets the full proof again — so a
contract break (e.g. a future augmentation that interpolates in f32, or
soft mask values) raises within FULL_VERIFY_EVERY batches at the latest
instead of silently quantizing training data.  verify="always" re-proves
every batch in full (2x memory-bandwidth cost on the feed path);
verify="first" is the trusting legacy mode (locking batch only).
"""

import numpy as np

# strided-subsample stride: a prime so the sample never aligns with image
# row/channel periodicities; samples ~0.4% of elements per batch
SPOT_STRIDE = 251
# full re-proof cadence per key under verify="strided"
FULL_VERIFY_EVERY = 64

F16_MAX = float(np.finfo(np.float16).max)


def _u8_image_exact(a):
    """uint8 encoding of a [0,1] f32 image, or None if not exactly u8/255."""
    u8 = np.rint(a * np.float32(255.0)).astype(np.uint8)
    if (u8.astype(np.float32) / np.float32(255.0) == a).all():
        return u8
    return None


def _u8_map_exact(a):
    """uint8 encoding of an integral-valued f32 map, or None."""
    u8 = a.astype(np.uint8)
    if (u8.astype(np.float32) == a).all():
        return u8
    return None


def _f16_safe(a):
    """True iff casting to f16 cannot overflow to inf (advisor r4: a value
    > 65504 silently becoming inf is far worse than the ~1e-3 loss)."""
    return bool(np.max(np.abs(a), initial=0.0) <= F16_MAX)


def _f16_exact(a):
    """float16 encoding of an f32 array whose values are all exactly
    f16-representable, or None.  Holds for maps that originate in float16
    .npy files and only pass through value-preserving ops (NEAREST resize,
    sentinel zeroing, clipping) — e.g. the matterport hidden_depth
    (data/matterport.py); KITTI's hidden_depths go through INTER_AREA
    averaging and legitimately stay f32."""
    with np.errstate(over="ignore"):  # out-of-range probe values fail the
        f16 = a.astype(np.float16)    # equality check; the warning is noise
    if (f16.astype(np.float32) == a).all():
        return f16
    return None


class BatchCompactor:
    """Callable batch -> compact batch; locks its per-key scheme on the
    first batch it sees.  mode: 'none' | 'exact' | 'f16';
    verify: 'strided' (default) | 'always' | 'first'.

    The locked scheme is exposed as `.scheme` (key -> 'u8_image' | 'u8' |
    'f16x' | 'f16' | None) so the device decode can be driven by it instead
    of inferring encodings from dtypes (see decompact_batch)."""

    def __init__(self, mode="exact", verify="strided"):
        if mode not in ("none", "exact", "f16"):
            raise ValueError(f"mode={mode!r}: one of none/exact/f16")
        if verify not in ("strided", "first", "always"):
            raise ValueError(f"verify={verify!r}: one of strided/first/always")
        self.mode = mode
        self.verify = verify
        # key -> 'u8_image' | 'u8' | 'f16x' | 'f16' | None; locked per key
        # on first sight (train/val batches may carry different key sets)
        self._scheme = {}
        self._seen = {}  # key -> batches encoded since lock

    @property
    def scheme(self):
        """Immutable view of the locked per-key encodings."""
        return dict(self._scheme)

    def _lock_key(self, key, a):
        enc = None
        if self.mode != "none" and a.dtype == np.float32:
            if key == "image":
                if _u8_image_exact(a) is not None:
                    enc = "u8_image"
            elif _u8_map_exact(a) is not None:
                enc = "u8"
            elif _f16_exact(a) is not None:
                # bitwise-lossless f16 transport: available even in 'exact'
                # mode because the locking batch PROVED representability
                # (and every later batch is guarded like the u8 tiers)
                enc = "f16x"
            elif self.mode == "f16" and _f16_safe(a):
                enc = "f16"
        self._scheme[key] = enc
        self._seen[key] = 0
        return enc

    def _check_level(self, key):
        """'full' | 'spot' | None for this (key, batch) under self.verify."""
        if self.verify == "always":
            return "full"
        if self.verify == "first":
            return None
        n = self._seen[key]
        return "full" if n % FULL_VERIFY_EVERY == 0 else "spot"

    def __call__(self, batch):
        out = {}
        for key, val in batch.items():
            a = np.asarray(val)
            enc = (self._scheme[key] if key in self._scheme
                   else self._lock_key(key, a))
            if enc is None:
                out[key] = val
                continue
            level = self._check_level(key)
            self._seen[key] += 1
            if enc == "u8_image":
                if level == "full":
                    u8 = _u8_image_exact(a)
                else:
                    u8 = np.rint(a * np.float32(255.0)).astype(np.uint8)
                    if level == "spot" and not (
                        u8.reshape(-1)[::SPOT_STRIDE].astype(np.float32)
                        / np.float32(255.0)
                        == a.reshape(-1)[::SPOT_STRIDE]
                    ).all():
                        u8 = None
                if u8 is None:
                    raise ValueError(
                        "image batch is no longer exactly uint8/255; "
                        "the locked 'exact' compaction would be lossy")
                out[key] = u8
            elif enc == "u8":
                if level == "full":
                    u8 = _u8_map_exact(a)
                else:
                    u8 = a.astype(np.uint8)
                    if level == "spot" and not (
                        u8.reshape(-1)[::SPOT_STRIDE].astype(np.float32)
                        == a.reshape(-1)[::SPOT_STRIDE]
                    ).all():
                        u8 = None
                if u8 is None:
                    raise ValueError(
                        f"batch[{key!r}] is no longer integral uint8; "
                        "the locked 'exact' compaction would be lossy")
                out[key] = u8
            elif enc == "f16x":
                if level == "full":
                    f16 = _f16_exact(a)
                else:
                    f16 = a.astype(np.float16)
                    if level == "spot" and not (
                        f16.reshape(-1)[::SPOT_STRIDE].astype(np.float32)
                        == a.reshape(-1)[::SPOT_STRIDE]
                    ).all():
                        f16 = None
                if f16 is None:
                    raise ValueError(
                        f"batch[{key!r}] is no longer exactly "
                        "float16-representable; the locked lossless 'f16x' "
                        "compaction would quantize")
                out[key] = f16
            elif enc == "f16":
                if level is not None:
                    sample = (a if level == "full"
                              else a.reshape(-1)[::SPOT_STRIDE])
                    if not _f16_safe(sample):
                        raise ValueError(
                            f"batch[{key!r}] exceeds float16 range; the "
                            "locked 'f16' compaction would overflow to inf")
                out[key] = a.astype(np.float16)
        return out


def decompact_batch_np(batch, scheme=None):
    """Host-side (numpy) twin of decompact_batch, for logging/panels that
    fetch compact device batches back to the host."""
    out = {}
    for key, val in batch.items():
        a = np.asarray(val)
        enc = scheme.get(key) if scheme is not None else (
            "u8_image" if a.dtype == np.uint8 and key == "image"
            else "u8" if a.dtype == np.uint8
            else "f16" if a.dtype == np.float16 else None)
        if enc == "u8_image":
            out[key] = a.astype(np.float32) / np.float32(255.0)
        elif enc in ("u8", "f16", "f16x"):
            out[key] = a.astype(np.float32)
        else:
            out[key] = a
    return out


# u8 -> f32/255 decode table, computed ON THE HOST with numpy's IEEE
# divide.  A device-side `u8/255.0` is NOT bitwise host-equal: XLA's
# algebraic simplifier rewrites division by a constant into multiplication
# by its reciprocal, which differs by 1 ulp for ~half the 256 codes
# (measured on the CPU backend).  Gathering host-computed values is exact
# by construction on every backend.
_IMAGE_LUT = np.arange(256, dtype=np.float32) / np.float32(255.0)


def decompact_batch(batch, scheme=None, s2d_keys=(), p4_keys=()):
    """Device-side inverse (a no-op on plain f32 batches).

    With `scheme` (a BatchCompactor.scheme dict) the decode is driven by
    the compactor's locked encodings, so keys the compactor passed through
    untouched keep their native dtypes — a uint8 label-id map or a float16
    source array that was never compacted is NOT upcast (advisor r4).
    Without a scheme the decode falls back to dtype inference, which is
    only correct for pipelines whose post-preprocess keys are all f32.

    The uint8 image decodes through _IMAGE_LUT, bitwise-equal to the host
    f32(u8)/255.0 (exhaustively chip-checked: tools/chip_parity.py --ops).

    `s2d_keys`: decoded [N,H,W] target maps to ALSO emit space-to-depth
    packed as '<key>@s2d' [N,H/2,W/2,4] (phase (a,b) at channel 2a+b) —
    consumed by the s2d-basis '1/1' loss (train/losses.py).  `p4_keys`:
    likewise emit '<key>@s2d2' [N,H/4,W/4,16] period-4 packs for the p4
    '1/2' head (train/losses.py:p4_map layout).  Packing here keeps the
    relayouts in the put-path dispatch, off the train step.
    """
    import jax.numpy as jnp

    out = {}
    for key, val in batch.items():
        enc = scheme.get(key) if scheme is not None else (
            "u8_image" if val.dtype == jnp.uint8 and key == "image"
            else "u8" if val.dtype == jnp.uint8
            else "f16" if val.dtype == jnp.float16 else None)
        if enc == "u8_image":
            out[key] = jnp.asarray(_IMAGE_LUT)[val.astype(jnp.int32)]
        elif enc in ("u8", "f16", "f16x"):
            out[key] = val.astype(jnp.float32)
        else:
            out[key] = val
    for key in s2d_keys:
        if key in out:
            t = out[key]
            n, h, w = t.shape
            out[key + "@s2d"] = t.reshape(n, h // 2, 2, w // 2, 2).transpose(
                0, 1, 3, 2, 4).reshape(n, h // 2, w // 2, 4)
    for key in p4_keys:
        if key in out:
            t = out[key]
            n, h, w = t.shape
            t4 = t.reshape(n, h // 4, 2, 2, w // 4, 2, 2)
            out[key + "@s2d2"] = t4.transpose(0, 1, 4, 3, 6, 2, 5).reshape(
                n, h // 4, w // 4, 16)
    return out


_decompact_jits = {}


def decompact_on_device(batch, scheme=None, s2d_keys=(), p4_keys=()):
    """Jitted decode as its OWN dispatch — deliberately NOT traced into the
    train/eval steps.

    Fusing the decode into the mixed-precision train step changes the
    XLA:TPU fusion schedule of the whole backward: measured on v5e, the
    compact-fed step diverged from the raw-f32 step by 2.0e-4 worst param
    delta after one Adam step (loss delta 6.7e-6) even though the decoded
    input values are bitwise identical — i.e. O(lr) Adam sign-flips on
    epsilon-scale grads under a different rounding schedule.  Rather than
    adjudicate benign-noise-vs-miscompile on a backend with a known
    miscompile history (ops/s2d.py), the separate dispatch keeps the step's
    compiled graph byte-identical to the chip-verified raw-f32 path, so
    compact-vs-raw training is bitwise-equal by executable determinism
    (asserted: tools/chip_parity.py --compact).  The extra HBM round-trip
    of the decoded batch is ~0.1 ms against a ~65 ms step.

    One jitted decode is cached per distinct (scheme, s2d_keys) — the
    scheme can grow once when val-only keys first lock (one extra trivial
    retrace).
    """
    skey = None if scheme is None else tuple(sorted(scheme.items(),
                                                    key=lambda kv: kv[0]))
    key = (skey, tuple(s2d_keys), tuple(p4_keys))
    fn = _decompact_jits.get(key)
    if fn is None:
        import jax

        frozen = None if scheme is None else dict(scheme)
        frozen_s2d, frozen_p4 = tuple(s2d_keys), tuple(p4_keys)
        fn = jax.jit(lambda b: decompact_batch(b, frozen, frozen_s2d,
                                               frozen_p4))
        _decompact_jits[key] = fn
    return fn(batch)
