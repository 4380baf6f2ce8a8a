"""Torch-free reader for PyTorch ``.pth`` checkpoints -> JAX param pytrees.

TPU hosts should not need a PyTorch install to load the published reference
checkpoints (/root/reference/footprints/model_manager.py:30-38 loads
``model.pth`` / ``optimiser.pth``).  ``.pth`` files are either:

  * legacy format (default before torch 1.6, used by the reference's
    torch 1.3.1): a sequence of pickles — magic number, protocol version,
    sys_info, the object graph (tensors referenced via persistent ids),
    a list of storage keys, then for each key an int64 element count
    followed by the raw little-endian storage bytes;
  * zipfile format: an archive containing ``<name>/data.pkl`` plus one
    ``<name>/data/<key>`` raw-bytes file per storage.

We deserialize with a restricted unpickler: only the handful of
``torch._utils`` / ``collections`` callables a state_dict needs are emulated,
everything else raises.  Tensors come back as numpy arrays.

The mapping functions then rename/transpose the reference's state_dict layout
(OIHW conv weights, module names from network.py) into this framework's
NHWC/HWIO pytrees.
"""

import io
import pickle
import struct
import zipfile

import numpy as np

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially (no native numpy dtype)
}

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C


class _StoragePlaceholder:
    """Stands in for a torch storage until its bytes are attached."""

    def __init__(self, storage_type: str, key: str, numel):
        self.storage_type = storage_type
        self.key = key
        self.numel = numel
        self.data = None  # numpy 1-D array, filled in later

    @property
    def dtype(self):
        dt = _DTYPE_BY_STORAGE[self.storage_type]
        if dt is None:
            raise NotImplementedError(f"unsupported storage {self.storage_type}")
        return np.dtype(dt)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    """Emulates torch._utils._rebuild_tensor_v2 with numpy as_strided."""
    arr = storage.data
    if arr is None:
        raise ValueError("storage bytes not loaded yet")
    itemsize = arr.dtype.itemsize
    byte_strides = tuple(s * itemsize for s in stride)
    return np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=byte_strides
    ).copy()


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


# torch._utils._rebuild_tensor (no _v2) is the pre-torch-0.4 form used by
# the 2017 torchvision model-zoo files (resnet34-333f7ec4.pth etc.) that
# convert/torchvision_resnet.py downloads: same (storage, offset, size,
# stride) prefix, no requires_grad/backward_hooks tail.  _rebuild_tensor_v2
# already tolerates extra args, so one emulation serves both.
_rebuild_tensor = _rebuild_tensor_v2


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: emulated torch callables only, no code exec."""

    _ALLOWED = {
        ("collections", "OrderedDict"): __import__("collections").OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    }

    def __init__(self, file, storages, raw=None):
        super().__init__(file, encoding="utf-8")
        self._storages = storages  # key -> _StoragePlaceholder
        self._raw = raw or {}  # key -> bytes, attached eagerly when available

    def find_class(self, module, name):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return name  # storage *type* token used inside persistent ids
        if module == "torch" and name in ("float32", "float64", "float16", "int64",
                                          "int32", "int16", "int8", "uint8", "bool",
                                          "bfloat16"):
            return name
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (restricted loader)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        storage_type, key = pid[1], pid[2]
        if not isinstance(storage_type, str):
            storage_type = getattr(storage_type, "__name__", str(storage_type))
        numel = pid[4] if len(pid) > 4 else None
        if key not in self._storages:
            self._storages[key] = _StoragePlaceholder(storage_type, key, numel)
        st = self._storages[key]
        if st.data is None and key in self._raw:
            _attach(st, self._raw[key])
        return st


def _attach(storage: _StoragePlaceholder, raw: bytes):
    if storage.storage_type == "BFloat16Storage":
        # numpy lacks bfloat16: widen via uint16 -> float32
        u16 = np.frombuffer(raw, dtype=np.uint16)
        storage.data = (u16.astype(np.uint32) << 16).view(np.float32)
    else:
        storage.data = np.frombuffer(raw, dtype=storage.dtype).copy()


def _load_zip(path):
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl") or n == "data.pkl")
        # Storage files sit under <prefix>data/<key>; pre-read them all so
        # tensors can be rebuilt eagerly during unpickling.
        raw = {
            n.rsplit("/", 1)[1]: zf.read(n)
            for n in zf.namelist()
            if "/data/" in n and not n.endswith("/")
        }
        unpickler = _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), {}, raw)
        return unpickler.load()


def _load_legacy(path):
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != _MAGIC_NUMBER:
            raise ValueError(f"{path}: not a legacy torch file (magic={magic})")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info
        storages = {}

        # The object graph references storages by persistent id; tensor
        # rebuilds must be deferred until storage bytes (which come *after*
        # the pickle) are read.  Defer via thunks.
        deferred = []

        def deferred_rebuild(storage, *args):
            out = _Lazy(storage, args)
            deferred.append(out)
            return out

        class _Lazy:
            def __init__(self, storage, args):
                self.storage = storage
                self.args = args

            def resolve(self):
                return _rebuild_tensor_v2(self.storage, *self.args)

        unpickler = _TorchUnpickler(f, storages)
        unpickler._ALLOWED = dict(unpickler._ALLOWED)
        unpickler._ALLOWED[("torch._utils", "_rebuild_tensor_v2")] = deferred_rebuild
        unpickler._ALLOWED[("torch._utils", "_rebuild_tensor")] = deferred_rebuild
        result = unpickler.load()

        key_order = pickle.load(f)  # list of storage keys in write order
        for key in key_order:
            (numel,) = struct.unpack("<q", f.read(8))
            st = storages[key]
            itemsize = 2 if st.storage_type in ("HalfStorage", "BFloat16Storage") else (
                1 if st.storage_type in ("CharStorage", "ByteStorage", "BoolStorage")
                else 8 if st.storage_type in ("DoubleStorage", "LongStorage")
                else 2 if st.storage_type == "ShortStorage"
                else 4
            )
            _attach(st, f.read(numel * itemsize))

        def resolve(obj):
            if isinstance(obj, _Lazy):
                return obj.resolve()
            if isinstance(obj, dict):
                return {k: resolve(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return type(obj)(resolve(v) for v in obj)
            return obj

        return resolve(result)


def load_torch_state_dict(path) -> dict:
    """Load a ``.pth`` file into a flat dict of numpy arrays (torch-free)."""
    if zipfile.is_zipfile(path):
        out = _load_zip(path)
    else:
        out = _load_legacy(path)
    if not isinstance(out, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(out)}")
    return out


# ---------------------------------------------------------------------------
# state_dict -> framework pytrees
# ---------------------------------------------------------------------------

def _conv_w(sd, key):
    """OIHW torch conv weight -> HWIO."""
    return np.ascontiguousarray(np.transpose(sd[key], (2, 3, 1, 0)))


def _conv(sd, prefix, with_bias=True):
    p = {"w": _conv_w(sd, prefix + ".weight")}
    p["b"] = sd[prefix + ".bias"].copy() if with_bias and prefix + ".bias" in sd else None
    return p


def _bn(sd, prefix):
    params = {"scale": sd[prefix + ".weight"].copy(), "bias": sd[prefix + ".bias"].copy()}
    state = {"mean": sd[prefix + ".running_mean"].copy(), "var": sd[prefix + ".running_var"].copy()}
    return params, state


def _encoder_from_sd(sd, depth=34):
    """Reference encoder naming: layer0=Sequential(conv1,bn1,relu),
    layer1=Sequential(maxpool, resnet.layer1), layer2..4=resnet.layer2..4
    (/root/reference/footprints/network.py:33-46)."""
    from ..nn.resnet import ARCHS

    kind, stage_blocks = ARCHS[depth]
    p = {"stem_conv": _conv(sd, "encoder.layer0.0", with_bias=False)}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn(sd, "encoder.layer0.1")
    for si, n_blocks in enumerate(stage_blocks):
        stage_name = f"layer{si + 1}"
        # layer1 is wrapped in an extra Sequential with the maxpool at idx 0
        tprefix = f"encoder.layer1.1" if si == 0 else f"encoder.{stage_name}"
        stage_p, stage_s = [], []
        for bi in range(n_blocks):
            bp, bs = {}, {}
            n_convs = 2 if kind == "basic" else 3
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = _conv(sd, f"{tprefix}.{bi}.conv{ci}", with_bias=False)
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{tprefix}.{bi}.bn{ci}")
            if f"{tprefix}.{bi}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{tprefix}.{bi}.downsample.0", with_bias=False)
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{tprefix}.{bi}.downsample.1")
            stage_p.append(bp)
            stage_s.append(bs)
        p[stage_name] = stage_p
        s[stage_name] = stage_s
    return p, s


def _conv_block_from_sd(sd, prefix):
    return (
        {"conv1": _conv(sd, prefix + ".conv1"), "conv2": _conv(sd, prefix + ".conv2")},
        {},
    )


def _skip_decoder_from_sd(sd, name, out_ch_keys=("outconv1", "outconv2", "outconv3")):
    p, s = {}, {}
    for i in range(1, 5):
        pre_p, pre_s = _conv_block_from_sd(sd, f"{name}.block{i}.pre_concat_conv")
        post_p, post_s = _conv_block_from_sd(sd, f"{name}.block{i}.post_concat_conv")
        p[f"block{i}"] = {"pre": pre_p, "post": post_p}
        s[f"block{i}"] = {"pre": pre_s, "post": post_s}
    for oc in out_ch_keys:
        p[oc] = {"conv1": _conv(sd, f"{name}.{oc}.conv1")}
    p["outconv4_conv"], s["outconv4_conv"] = _conv_block_from_sd(sd, f"{name}.outconv4.0")
    p["outconv4_out"] = {"conv1": _conv(sd, f"{name}.outconv4.1.conv1")}
    return p, s


def footprint_params_from_state_dict(sd, depth=34):
    """Reference FootprintNetwork state_dict -> (params, state) pytrees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p, s = {}, {}
    p["encoder"], s["encoder"] = _encoder_from_sd(sd, depth)
    p["mask_decoder"], s["mask_decoder"] = _skip_decoder_from_sd(sd, "mask_decoder")
    p["depth_decoder"], s["depth_decoder"] = _skip_decoder_from_sd(sd, "depth_decoder")
    return p, s


def segmentor_params_from_state_dict(sd, depth=34, use_psp=True):
    """Reference Segmentor state_dict -> (params, state) pytrees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p, s = {}, {}
    p["encoder"], s["encoder"] = _encoder_from_sd(sd, depth)
    dec_p, dec_s = _skip_decoder_from_sd(sd, "decoder")
    if use_psp:
        pool_sizes = (1, 2, 4, 6)
        dec_p["psp"] = {
            f"reduce{ps}": _conv(sd, f"decoder.PSP.block{bi}.reduce", with_bias=False)
            for bi, ps in enumerate(pool_sizes, start=1)
        }
    p["decoder"], s["decoder"] = dec_p, dec_s
    return p, s
