"""Jitted training steps and epoch drivers: triplet (+classification),
GAN two-optimizer, and VAE with KL/LR schedules."""
