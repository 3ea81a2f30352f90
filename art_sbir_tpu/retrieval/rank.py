"""Ranking + retrieval metrics with the reference's exact contract.

Replaces the reference's per-sketch loop — one encoder call, one full
pairwise distance, one full sort *per query* (reference `inference.py:94-136`)
— with a single batched device program over all queries, plus host-side
metric assembly:

* positive-index lookup: filename-stem rules (sketchy ``id-number``, kaggle
  ``id``, sketchit ``idx-id-random``, artworks full stem — reference
  `inference.py:33-38`) via an O(1) stem dictionary instead of the O(N)
  linear scan per query (reference `utils.py:22-25`);
* metrics: MRR, top-1..10 accuracy, rank distribution
  (pandas.describe parity), 10 seeded retrieval samples (stdlib random,
  seed 11 — reference `inference.py:101-102`).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from art_sbir_tpu.core.metrics import Timer
from art_sbir_tpu.ops.distance import retrieve

# gallery size above which evaluate_retrieval streams through the fused
# Pallas kernel instead of materializing (chunk, N) distance matrices.
# Empirically located on the v5e chip (BENCH_r03 + fine probe, Q=512 and
# Q=1, f32-highest, min over rounds): XLA retrieve wins below —
# 10k 2.0x, 20k 1.2x, 35k 1.03x — and the fused kernel never loses from
# 50k up (1.03-3.6x across rounds at 50k, 1.1x at 100k, 1.4x at 200k,
# 6.2x at 1M where the (Q, N) matrix stops fitting in HBM).
FUSED_GALLERY_THRESHOLD = 50_000

# int8 route crossover (retrieve_quantized's XLA scan vs the streamed
# int8 kernel) — measured SEPARATELY from the bf16 one above: the
# kernel's certificate-failure rate scales ~1/N (fold collisions,
# ~C(r,2)*seg_reduce/N per row), so small galleries are fallback-heavy
# and the XLA int8 scan wins far past the bf16 crossover. e2e at the
# engine regime (Q=512, k=10, rerank_factor=4, device_get, v5e,
# scripts/probe_quant_crossover.py): kernel 0.46x at 25k, 0.89x at
# 400k, 1.21x at 700k, 1.54x at 1M (1.42-1.86x at Q=4096).
QUANT_FUSED_GALLERY_THRESHOLD = 500_000


def sketch_stem_to_name(sketch_path: Path | str, artworks_gallery: bool) -> Optional[str]:
    """Reference `inference.py:33-37` stem-parsing rules.

    Stems with 4+ dash-separated parts return ``None`` (guaranteed miss,
    rank = N): the reference leaves ``sketch_name`` as the un-joined
    ``re.split`` list there, which never equals any gallery stem in
    ``find_image_index`` (`utils.py:22-25`)."""
    stem = Path(sketch_path).stem
    parts = stem.split("-")
    if len(parts) <= 2:
        return stem if artworks_gallery else parts[0]
    if len(parts) == 3:
        return parts[1]
    return None


def positive_indices(
    sketch_paths: Sequence[Path | str], image_paths: Sequence[Path | str]
) -> np.ndarray:
    """First gallery index whose stem matches each sketch's parsed name;
    -1 when missing (the reference records rank = N for those,
    `inference.py:39-41`)."""
    artworks = len(image_paths) > 0 and "artworks" in str(image_paths[0])
    stem_to_idx: Dict[str, int] = {}
    for i, p in enumerate(image_paths):
        stem = Path(p).stem
        if stem not in stem_to_idx:  # first match wins (reference semantics)
            stem_to_idx[stem] = i
    names = [sketch_stem_to_name(p, artworks) for p in sketch_paths]
    return np.array(
        [-1 if n is None else stem_to_idx.get(n, -1) for n in names],
        dtype=np.int32,
    )


def _describe(ranks_1based: np.ndarray) -> Dict[str, float]:
    """pandas.describe() dict, matching reference `inference.py:123-132`."""
    stats = pd.DataFrame(ranks_1based, columns=["rank"]).describe().to_dict()["rank"]
    return {str(k): float(v) for k, v in stats.items()}


def evaluate_retrieval(
    query_features: np.ndarray,
    gallery_features: np.ndarray,
    sketch_paths: Sequence[Path | str],
    image_paths: Sequence[Path | str],
    loss_type: str = "euclidean",
    k: int = 10,
    start_time: Optional[float] = None,
    query_chunk: int = 1024,
    sample_seed: int = 11,
    n_samples: int = 10,
    mesh=None,
) -> Dict:
    """Full retrieval eval -> the reference's inference dict schema.

    Galleries past ``FUSED_GALLERY_THRESHOLD`` rows route through the
    fused Pallas kernel — O(Q) state instead of a per-chunk (chunk, N)
    distance matrix, measured 6.2x the chunked XLA path at N=1M (PERF.md)
    — with the kernel's exactness certificate falling back to the XLA
    path per row when it cannot prove parity. With a ``mesh`` whose
    device count divides the gallery, the fused sweep additionally shards
    the gallery across chips (per-shard kernels, O(Q*k) merge)."""
    timer = Timer()
    n_gallery = len(image_paths)
    pos = positive_indices(sketch_paths, image_paths)
    missing = pos < 0

    gal = jnp.asarray(gallery_features, jnp.float32)
    k_eff = min(k, n_gallery)  # tiny-gallery clamp; metrics still report k
    use_fused = (loss_type in ("euclidean", "cosine")
                 and n_gallery >= FUSED_GALLERY_THRESHOLD
                 and k_eff <= 128)
    # per-chunk results stay on device with one drain after the loop, so
    # chunk dispatch pipelines on the XLA route (< FUSED_GALLERY_THRESHOLD).
    # NOTE: the fused route still syncs per chunk internally — its
    # certificate check pulls `exact` to host (retrieval_pallas.py) — so
    # the accumulation only removes the extra result transfers there
    rs, vs, idxs = [], [], []

    for s in range(0, len(sketch_paths), query_chunk):
        e = min(s + query_chunk, len(sketch_paths))
        q = jnp.asarray(query_features[s:e], jnp.float32)
        p = jnp.asarray(np.where(missing[s:e], 0, pos[s:e]))
        if use_fused:
            from art_sbir_tpu.ops.retrieval_pallas import (
                retrieve_fused, retrieve_fused_sharded)

            # the sharded sweep splits the gallery over the FIRST mesh
            # axis only (a 2-D TP mesh replicates it over 'model'), so
            # gate on that axis size, not the total device count
            n_shards = (0 if mesh is None
                        else int(mesh.shape[mesh.axis_names[0]]))
            if n_shards > 1 and n_gallery % n_shards == 0:
                r, v2, i = retrieve_fused_sharded(
                    q, gal, p, mesh, k=k_eff, metric=loss_type)
            else:
                r, v2, i = retrieve_fused(q, gal, p, k=k_eff,
                                          metric=loss_type)
            # kernel reports squared eps-folded distances (euclidean) or
            # cosine distances directly
            v = jnp.sqrt(v2) if loss_type == "euclidean" else v2
        else:
            r, v, i = retrieve(q, gal, p, k=k_eff, metric=loss_type)
        rs.append(r)
        vs.append(v)
        idxs.append(i)

    if rs:
        ranks = np.asarray(jnp.concatenate(rs)).astype(np.int64)
        topk_val = np.asarray(jnp.concatenate(vs), np.float32)
        topk_idx = np.asarray(jnp.concatenate(idxs)).astype(np.int64)
    else:
        ranks = np.zeros(0, np.int64)
        topk_val = np.zeros((0, k_eff), np.float32)
        topk_idx = np.zeros((0, k_eff), np.int64)

    ranks[missing] = n_gallery  # reference returns len(image_paths)

    ranks1 = ranks + 1
    mrr = float(np.mean(1.0 / ranks1))
    topk_acc = np.zeros(k)
    for j in range(k):
        topk_acc[j] = float(np.mean(ranks <= j))

    # seeded retrieval samples: exact reference RNG (inference.py:100-102,120)
    rng = random.Random()
    rng.seed(sample_seed)
    random_indices = [rng.randrange(0, len(sketch_paths)) for _ in range(n_samples)]
    samples = []
    seen = set()
    for i in sorted(set(random_indices)):
        if i in seen:
            continue
        seen.add(i)
        entries = [
            (str(image_paths[int(gi)]), float(gv))
            for gi, gv in zip(topk_idx[i], topk_val[i])
        ]
        samples.append({str(sketch_paths[i]): entries})

    elapsed = timer.elapsed() if start_time is None else timer.elapsed() + start_time
    stats: Dict = {
        "mean_reciprocal_rank": mrr,
        "size": n_gallery,
        "inference_time": elapsed,
    }
    stats.update(_describe(ranks1))
    stats["topk_acc"] = [float(x) for x in topk_acc]
    stats["retrieval_samples"] = samples
    return stats
