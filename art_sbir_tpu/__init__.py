"""art_sbir_tpu — a TPU-native (JAX/XLA/Pallas) framework for sketch-based image
retrieval of artworks.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch codebase (Peer222/art-sbir): a CLIP-style ResNet50 retrieval
encoder trained with a triplet-margin loss, three sketch-synthesis subsystems
(pix2pix GAN, informative-drawings line generator, Photo2Sketch VAE-LSTM), an
AdaIN style-transfer generator, and a retrieval engine answering sketch queries
against an HBM-resident gallery-embedding matrix.

Layering (bottom-up):
  core/       typed configs, PRNG discipline, checkpointing, results contract
  ops/        Pallas/XLA kernels and pure-jnp ops (distance+top-k, rasterizer,
              resize/normalize, augmentations, GMM NLL, AdaIN, dilation)
  data/       dataset catalogs, seeded splits, host loader, synthetic data
  models/     Flax model zoo (ModifiedResNet, VGG encoders, DecoderRNN2D,
              pix2pix G/D, DrawingGenerator, AdaIN)
  train/      jitted train steps (triplet, GAN, VAE) + epoch drivers
  retrieval/  pjit-sharded gallery embedding + ranking/metrics
  parallel/   device mesh + sharding helpers (data-parallel over ICI)
  cli/        entry points mirroring the reference flag surfaces
  viz/        matplotlib reporting (loss curves, top-k bars, retrieval grids)
"""

__version__ = "0.1.0"
