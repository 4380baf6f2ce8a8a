"""footprints_tpu — a TPU-native (JAX/XLA/Pallas) framework for footprint &
free-space prediction from a single color image.

Re-designed from scratch for TPU with the capabilities of the reference
implementation "Footprints and Free Space from a Single Color Image"
(nianticlabs/footprints, CVPR 2020).  The compute path is JAX/XLA with Pallas
kernels for the fused hot ops; scaling is expressed through `jax.sharding`
meshes rather than per-device code.

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
    ops/         Pallas TPU kernels for the fused decoder hot path
"""

__version__ = "0.1.0"
