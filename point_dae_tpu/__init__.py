"""Point-DAE TPU: a TPU-native JAX framework for denoising-autoencoder
self-supervised point-cloud pretraining and downstream evaluation.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the Point-DAE reference (PyTorch + CUDA):

- ``ops``      : fixed-shape geometry primitives (fps, knn, ball query,
                 grouping, three-nn interpolation) replacing the reference's
                 four separate CUDA stacks (pointnet2_ops, pointops, KNN_CUDA,
                 vendored extensions/).
- ``losses``   : chamfer-distance family (Pallas-tiled nearest-neighbour
                 kernel + the 10 loss variants) and approximate EMD.
- ``data``     : corruption/augmentation libraries (batched, PRNG-keyed,
                 static shapes), dataset readers, host dataloader.
- ``models``   : DGCNN / PointNet / PointNet++ / transformer model zoo
                 (flax.linen).
- ``parallel`` : mesh + sharding helpers (data parallel over ICI/DCN).
- ``engine``   : pretrain / finetune / probe / eval loops.
- ``utils``    : config (_base_ merge), registry, logging, meters,
                 checkpointing.
"""

__version__ = "0.1.0"
