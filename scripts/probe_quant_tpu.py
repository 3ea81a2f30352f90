"""Probe: Mosaic-compile quant_candidates_fused on the real TPU chip and
check parity vs the XLA int8 scan + certificate health."""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from art_sbir_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
print("backend:", jax.devices())

from art_sbir_tpu.ops.quant import (quantize_gallery, retrieve_quantized,
                                    retrieve_quantized_fused,
                                    _symmetric_quantize)
from art_sbir_tpu.ops.retrieval_pallas import quant_candidates_fused

rng = np.random.default_rng(0)
n, d, q, k = 20_000, 512, 256, 10
gal = rng.standard_normal((n, d)).astype(np.float32)
qs = gal[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
for metric in ("euclidean", "cosine"):
    qg = quantize_gallery(jnp.asarray(gal), metric=metric)
    v0, i0 = retrieve_quantized(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    v1, i1 = retrieve_quantized_fused(jnp.asarray(qs), qg, jnp.asarray(gal), k=k)
    q8, s_q = _symmetric_quantize(jnp.asarray(qs) if metric == "euclidean"
                                  else jnp.asarray(qs) / np.linalg.norm(qs, axis=1, keepdims=True))
    _, _, cert = quant_candidates_fused(q8, s_q, qg.q8, qg.scale, qg.sq_norm,
                                        r=80, metric=metric)
    same = np.array_equal(np.asarray(i0), np.asarray(i1))
    close = np.allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-6)
    print(f"{metric}: idx_equal={same} vals_close={close} "
          f"cert_pass_frac={float(np.asarray(cert).mean()):.4f}")
print("OK")
