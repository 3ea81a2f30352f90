"""Flax model zoo: retrieval encoders, sketch-synthesis generators, and the
AdaIN style-transfer pair. NHWC layouts, bfloat16 compute / float32 params
by default on TPU."""
