"""AOT serving export: compile the forward once, serialize, deploy anywhere.

The reference's deployment story is ``torch.load`` + a Python forward
(/root/reference/footprints/predict_simple.py); its requirements.txt carries
a vestigial ``onnx`` dependency but no export path exists.  The TPU-native
equivalent is ``jax.export``: the jitted serving forward lowers to a
versioned StableHLO artifact that a serving host reloads and calls with no
model code, no checkpoint, and no re-tracing — and with
``platforms=('tpu', 'cpu')`` the *same* artifact runs on both, so the CPU
leg doubles as a deployment-time numerics check against the chip.

Weights are baked into the artifact as constants (the model is ~33M params:
~66 MB in bf16, ~132 MB in f32), so the artifact is fully self-contained.

Artifact layout (two files next to each other):
  * ``<out>``       — the serialized StableHLO bytes;
  * ``<out>.json``  — metadata (resolution, batch, dtype, platforms, the
    output channel contract) so a serving host can validate inputs without
    deserializing the module.

Input contract:  float32 ``[batch, height, width, 3]`` RGB in [0, 1].
Output contract: float32 ``[batch, 4, height, width]`` — ch0 visible-ground
logit, ch1 hidden-ground logit, ch2 visible depth, ch3 hidden-ground depth
(sigmoid-disparities; identical to the reference artifact contract,
reference evaluation/evaluate_model.py:17-21).  Mask channels are raw
logits (reference parity — see predict_simple.py's ``--apply_sigmoid``
note).

Usage:
  python -m footprints_tpu.export --model_path /path/to/weights \
      --height 192 --width 640 --batch 16 --dtype bfloat16 \
      --out serving/footprints_192x640.stablehlo
"""

import argparse
import json
import os

import numpy as np

FORMAT_VERSION = 1

CHANNEL_CONTRACT = [
    "visible_ground_logit",
    "hidden_ground_logit",
    "visible_depth_sigmoid_disp",
    "hidden_depth_sigmoid_disp",
]


def _cast_tree(tree, cast):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda a: jnp.asarray(a, cast), tree)


def build_serving_forward(net, params, state, dtype="bfloat16"):
    """The FootprintNetwork serving forward as a pure function of the batch.

    dtype 'bfloat16' casts weights and activations (the measured serving
    config: ~5x f32 throughput, PERF.md); 'float32' keeps checkpoint-parity
    numerics.  Output is channels-first float32 either way (fetching an
    NHWC C=4 buffer would transfer the lane-padded layout — see
    predict_simple.py).
    """
    import jax.numpy as jnp

    if dtype not in ("bfloat16", "float32"):
        raise ValueError(f"dtype must be bfloat16 or float32, got {dtype!r}")
    cast = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params, state = _cast_tree(params, cast), _cast_tree(state, cast)

    def forward(images):
        out, _ = net.apply(params, state, images.astype(cast), train=False)
        return jnp.transpose(out["1/1"], (0, 3, 1, 2)).astype(jnp.float32)

    return forward


def build_segmentor_forward(net, params, state, dtype="bfloat16"):
    """The ground-Segmentor serving forward: sigmoided full-scale ground
    probability, float16 [N,H,W] — the exact artifact the seg Tester writes
    into the ground_seg npy tree (preprocessing/segmentation/inference.py).
    """
    import jax
    import jax.numpy as jnp

    if dtype not in ("bfloat16", "float32"):
        raise ValueError(f"dtype must be bfloat16 or float32, got {dtype!r}")
    cast = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params, state = _cast_tree(params, cast), _cast_tree(state, cast)

    def forward(images):
        outputs, _ = net.apply(params, state, images.astype(cast), train=False)
        return jax.nn.sigmoid(outputs[3][..., 0]).astype(jnp.float16)

    return forward


def export_serving(weights_path, out_path, *, height, width, batch=16,
                   dtype="bfloat16", platforms=("tpu", "cpu"), depth=34,
                   network="footprint", use_psp=True):
    """Load weights, AOT-lower the serving forward, write the artifact.

    network 'footprint' (the main 4-channel model) or 'segmentor' (the
    ground-seg preprocessing model; weights_path may be an epoch_<n>.pth /
    checkpoint.npz file or a directory).  Returns the metadata dict (also
    written to ``<out>.json``).
    """
    import jax
    from jax import export as jax_export

    if network == "footprint":
        from .model_manager import ModelManager

        mm = ModelManager(is_inference=True, depth=depth)
        mm.load_model(weights_path)
        fn = build_serving_forward(mm.net, mm.params, mm.state, dtype)
        model_meta = {
            "model": "FootprintNetwork",
            "output": "float32 [batch, 4, height, width]",
            "channels": CHANNEL_CONTRACT,
        }
    elif network == "segmentor":
        from .models import Segmentor
        from .preprocessing.segmentation.trainer import _load_segmentor_weights

        net = Segmentor(depth=depth, use_psp=use_psp)
        params, state = _load_segmentor_weights(net, weights_path)
        fn = build_segmentor_forward(net, params, state, dtype)
        model_meta = {
            "model": "Segmentor",
            "use_psp": use_psp,
            "output": "float16 [batch, height, width] ground probability",
        }
    else:
        raise ValueError(f"network must be footprint or segmentor, "
                         f"got {network!r}")

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), np.float32)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(spec)

    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)

    meta = {
        "format_version": FORMAT_VERSION,
        "encoder_depth": depth,
        "height": height,
        "width": width,
        "batch": batch,
        "dtype": dtype,
        "platforms": list(platforms),
        "input": "float32 [batch, height, width, 3] RGB in [0, 1]",
        "bytes": len(data),
        "calling_convention_version": exported.calling_convention_version,
        **model_meta,
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class ServingModel:
    """A reloaded serving artifact: ``call(images) -> [B,4,H,W]`` float32.

    Pads/splits arbitrary leading batch sizes onto the compiled batch so
    callers don't have to know the artifact's batch shape.
    """

    def __init__(self, exported, meta):
        self._exported = exported
        self.meta = meta
        self.batch = meta["batch"]
        self.height, self.width = meta["height"], meta["width"]

    def call(self, images):
        images = np.asarray(images, np.float32)
        expected = (self.height, self.width, 3)
        if images.ndim != 4 or images.shape[1:] != expected:
            raise ValueError(
                f"expected [N,{self.height},{self.width},3] float32, "
                f"got {images.shape}")
        outs = []
        for start in range(0, len(images), self.batch):
            chunk = images[start:start + self.batch]
            n = len(chunk)
            if n < self.batch:
                chunk = np.concatenate(
                    [chunk, np.zeros((self.batch - n,) + expected, np.float32)])
            outs.append(np.asarray(self._exported.call(chunk))[:n])
        if outs:
            return np.concatenate(outs)
        (out_aval,) = self._exported.out_avals
        return np.zeros((0,) + out_aval.shape[1:], out_aval.dtype)


def load_serving(path):
    """Deserialize an exported artifact (+ its .json sidecar) for calling."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        # fall back to the shapes recorded in the module itself
        (spec,) = exported.in_avals
        meta = {"batch": spec.shape[0], "height": spec.shape[1],
                "width": spec.shape[2], "dtype": "unknown",
                "channels": CHANNEL_CONTRACT}
    return ServingModel(exported, meta)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Export the serving forward as a StableHLO artifact.")
    parser.add_argument("--model_path", type=str, required=True,
                        help="directory with checkpoint.npz or model.pth")
    parser.add_argument("--out", type=str, required=True,
                        help="output artifact path (e.g. model.stablehlo)")
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--encoder_depth", type=int, default=34,
                        choices=[18, 34, 50])
    parser.add_argument("--network", type=str, default="footprint",
                        choices=["footprint", "segmentor"],
                        help="which model to export (segmentor = the "
                             "ground-seg preprocessing net)")
    parser.add_argument("--no_PSP", action="store_true",
                        help="segmentor only: model was trained without the "
                             "PSP bottleneck")
    return parser.parse_args(argv)


def main(argv=None):
    from .platform_config import configure_from_env

    configure_from_env()
    args = parse_args(argv)
    meta = export_serving(
        args.model_path, args.out,
        height=args.height, width=args.width, batch=args.batch,
        dtype=args.dtype, platforms=tuple(args.platforms.split(",")),
        depth=args.encoder_depth, network=args.network,
        use_psp=not args.no_PSP)
    print(f"exported {meta['bytes'] / 1e6:.1f} MB artifact to {args.out} "
          f"({meta['dtype']}, platforms {meta['platforms']})")


if __name__ == "__main__":
    main()
