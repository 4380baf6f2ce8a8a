"""footprints_tpu — a TPU-native (JAX/XLA) framework for footprint &
free-space prediction from a single color image.

Re-designed from scratch for TPU with the capabilities of the reference
implementation "Footprints and Free Space from a Single Color Image"
(nianticlabs/footprints, CVPR 2020).  The compute path is JAX/XLA: the hot
ops are algebraic reformulations (space-to-depth decoder tail, phase-summed
upsample convs, one-matmul RANSAC) that XLA fuses onto the MXU, plus a
Pallas fused pad+conv+bias+ELU kernel (ops/pallas_conv.py) kept as an
independent on-chip cross-check of the XLA path (it exposed a real XLA:TPU
border miscompile in r2; opt-in for the model via FOOTPRINTS_PALLAS_CONV=1)
— each op measured on chip against the naive composition before adoption;
scaling is expressed through `jax.sharding` meshes rather than per-device
code.

Layout:
    core/        pure numeric primitives (depth/disp conversions, resize, color)
    nn/          functional layer library (conv, BN, blocks, ResNet encoders)
    models/      FootprintNetwork, Segmentor
    convert/     torch-free ``.pth`` checkpoint reader -> param pytrees
    parallel/    mesh construction + sharding policies (dp/spatial)
    data/        host-side input pipeline (splits, KITTI/Matterport, prefetch)
    train/       losses, trainer, optimizer/schedule, checkpointing, logging
    eval/        batch inference + offline metric harness
    preprocessing/  ground-segmentation pipeline + geometric GT generation
    baselines/   classical baselines (visible-ground, convex hull, RANSAC plane)
    ops/         layout-level TPU fast paths for the decoder (XLA-fused
                 compositions + the Pallas fused conv kernel)
"""

__version__ = "0.1.0"
