"""Production serving engine: persistent gallery + micro-batched queries.

The reference has no serving story — its `inference.py:94-136` is an
offline per-query evaluation loop. This module is the deployment-side
counterpart the reference lacks: a long-lived engine that owns the chip,
keeps the gallery embedding matrix resident in HBM, and serves sketch
queries with TPU-friendly batching:

* **One fused XLA program per batch bucket** — uint8 decode-normalized
  query batch -> encoder forward -> pairwise distance against the resident
  gallery -> top-k — so a request costs exactly one device dispatch. Batch
  sizes are bucketed to powers of two (1, 2, 4, ... max_batch) to bound
  the number of compiled programs; requests are padded up to the bucket
  and the pad rows' results discarded.
* **Micro-batching**: concurrent requests are coalesced by a dispatcher
  thread — the first request opens a window of ``window_ms``; everything
  that arrives inside it (up to ``max_batch``) rides the same device
  dispatch. On a time-shared chip this converts per-request tunnel RTTs
  into one RTT per batch, which is where the ~400x batched-vs-single
  throughput gap lives (PERF.md).
* **k is compiled once** at ``k_max`` (clamped to the gallery size) and
  sliced per request on host, so varying per-request ``k`` never
  recompiles.
* **Online index updates the TPU way** (``capacity=``): the gallery is a
  fixed-capacity HBM buffer, live rows are selected by an
  ``arange(capacity) < n_valid`` mask whose bound is a *traced scalar*,
  and :meth:`RetrievalEngine.add_images` appends rows with one jitted
  ``dynamic_update_slice`` — static shapes throughout, so adds and the
  queries racing them never trigger a recompile.

The HTTP front-end lives in :mod:`art_sbir_tpu.cli.serve`; this module is
transport-agnostic (the test suite drives it in-process).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from art_sbir_tpu.data.loader import decode_bytes
from art_sbir_tpu.ops.distance import pairwise_distance, top_k


def _buckets(max_batch: int) -> List[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    batched_requests: int = 0  # requests that shared a dispatch
    lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record(self, batch_size: int) -> None:
        with self.lock:
            self.requests += batch_size
            self.batches += 1
            if batch_size > 1:
                self.batched_requests += batch_size

    def snapshot(self) -> Dict[str, float]:
        with self.lock:
            return {
                "requests": self.requests,
                "batches": self.batches,
                "batched_requests": self.batched_requests,
                "mean_batch": (self.requests / self.batches
                               if self.batches else 0.0),
            }


class RetrievalEngine:
    """Owns the resident gallery and the compiled query programs.

    ``forward_fn``: uint8 (B, S, S, 3) device batch -> (B, D) embeddings,
    preprocessing fused inside (same contract as
    :func:`art_sbir_tpu.retrieval.engine.run_inference`).

    ``query_forward_fn`` (optional): embeds SEARCH queries instead of
    ``forward_fn`` — per-modality BN recalibration passes an encoder
    with sketch-population running stats here while the gallery and
    online ``/add`` rows keep photo-population stats, mirroring
    ``run_inference``'s ``query_forward_fn`` offline split.
    """

    def __init__(
        self,
        forward_fn: Callable[[jax.Array], jax.Array],
        gallery_features: np.ndarray | jax.Array,
        image_paths: Sequence[Path | str],
        *,
        metric: str = "euclidean",
        image_size: int = 224,
        resize_mode: str = "square",
        k_max: int = 10,
        max_batch: int = 32,
        capacity: Optional[int] = None,
        mesh=None,
        quantize: bool = False,
        rerank_factor: int = 4,
        rerank_dtype: str = "float32",
        ivf_nlist: Optional[int] = None,
        ivf_nprobe: int = 0,
        pq_m: Optional[int] = None,
        pq_rerank: str = "bfloat16",
        pq_rerank_factor: int = 64,
        pq_opq_iters: int = 0,
        index_cache: Optional[Path | str] = None,
        query_forward_fn: Optional[Callable] = None,
    ):
        """``capacity``: enable ONLINE index updates (:meth:`add_images`,
        :meth:`remove`). The gallery is padded to a fixed ``capacity``
        rows so programs compile once (static shapes, the TPU way); live
        rows are selected by a (capacity,) bool mask passed as a TRACED
        array, so adds, removals and the searches racing them never
        recompile. Removed slots are tombstoned in the mask and reused by
        later adds. Without ``capacity`` the index is immutable (and
        large galleries route through the fused kernel).

        ``mesh``: serve a ROW-SHARDED resident gallery over a device
        mesh — each chip holds N/n_shards rows (first mesh axis), ranks
        them locally, and XLA all-gathers only the tiny (B, k) partials
        over ICI. Requires the (padded) row count to divide the first
        mesh axis; online adds write into the sharded buffer via the
        same jitted ``dynamic_update_slice`` under GSPMD.

        ``quantize``: int8 candidate scan + exact rerank
        (:mod:`art_sbir_tpu.ops.quant` — 2x MXU rate / 4x less gallery
        read bandwidth than f32 on the cross term). Immutable indexes
        only (no ``capacity``); composes with ``mesh`` — the int8 gallery
        row-shards and each chip scans + exactly reranks its own rows
        (:func:`~art_sbir_tpu.ops.quant.retrieve_quantized_sharded`,
        O(B*k) cross-chip traffic). ``rerank_factor`` sets the candidate
        count (``rerank_factor * k_max``) for BOTH quantized routes —
        the engine default 4 measured quality-equal to 8 at 1M rows
        (top-10 overlap vs exact 0.9936 vs 0.9937) while keeping the
        streamed kernel's certificate rate ~99% (see
        scripts/probe_quant_sweep.py). ``rerank_dtype='bfloat16'`` keeps
        the rerank gallery resident in bf16 — 0.75 bytes/element total
        (int8 scan copy + bf16 rows) vs 1.25 with f32 rows, a 1.67x
        capacity lever on top of int8's 4x — at the cost of bf16 row
        rounding in the reported values (~1e-2 relative, plus an
        ABSOLUTE floor ~0.004*||row|| on near-zero euclidean distances
        such as self-matches; candidate selection is unchanged and
        rerank math stays f32).

        ``ivf_nlist``: build an IVF clustered index at startup
        (:mod:`art_sbir_tpu.ops.ivf`; 0 = auto ~2*sqrt(N) clusters) and
        answer queries by probing the ``ivf_nprobe`` nearest clusters
        instead of a full scan. Approximate (recall set by nprobe;
        scored distances stay exact), aimed at the serving regime: a
        full scan reads the whole N*D gallery per coalesced dispatch,
        the probe gathers ~B*nprobe*Cpad rows — independent of N.
        Composes with ``capacity`` (online IVF: adds are assigned to
        their nearest centroid, removals tombstone through the live
        mask, cluster overflow spills to an always-scanned buffer —
        :class:`art_sbir_tpu.ops.ivf.OnlineIVF`; the initial gallery
        must be non-empty to cluster) and with ``mesh`` (sharded IVF:
        per-shard probes with shard-local gathers, O(B*k) merge over
        ICI — immutable galleries get one independent local index per
        shard (:class:`art_sbir_tpu.ops.ivf.ShardedIVF`); with
        ``capacity`` too, centroids are shared and each shard keeps
        mutable local tables + spill
        (:class:`art_sbir_tpu.ops.ivf.ShardedOnlineIVF`); immutable
        sharded indexes persist via ``index_cache`` like single-device
        ones). ``ivf_nprobe=0`` (the default) auto-tunes at
        startup: smallest power-of-two nprobe reaching 95% recall@k_max
        on a perturbed-gallery proxy, then doubled (``margin=2``) —
        made the default in round 4 after measuring that a fixed
        nprobe=8 delivers only 0.84 recall@10 on trained-encoder
        embeddings at 50k-gallery scale; the margin was added in round
        5 after the full 1,000-query rerun showed the proxy itself is
        one power of two optimistic vs real cross-modal queries (proxy
        picks 8 at 0.852 real recall, the doubled choice 16 delivers
        0.957 — goldens/ann_learned_tpu.json). No ``quantize``.

        ``pq_m``: IVF-PQ (:mod:`art_sbir_tpu.ops.pq`) — requires
        ``ivf_nlist``; the gallery is product-quantized to ``pq_m``
        uint8 codes/row (default 64 -> 64x smaller than f32) and the
        probe scores candidate CODES via the gather-free ADC scan.
        ``pq_rerank`` picks the residency of the exact rows used to
        re-score the top ``pq_rerank_factor * k_max`` ADC candidates
        (default 64 — measured on a 600k adversarial clustered gallery:
        recall@10 0.44/0.77/0.98 at factors 4/16/64; the exact re-score
        is O(Q*r*D) on gathered rows, so the deep budget is cheap):
        ``'float32'`` / ``'bfloat16'`` (exact values, bf16 carries the
        quant-mode value-rounding caveat) or ``'none'`` — the rows are
        DROPPED, results are approximate (ADC-ordered, reconstruction-
        distance values), and HBM holds only codes + cluster table:
        the extreme-capacity mode (~pq_m bytes/row; millions of rows
        resident in hundreds of MB). Immutable indexes only; composes
        with ``mesh`` (one shared residual codebook, codes row-sharded
        with the gallery, per-shard ADC + local exact rerank, O(B*k)
        ICI merge — :func:`art_sbir_tpu.ops.pq.ivf_pq_search_sharded`)."""
        n0 = int(gallery_features.shape[0])
        if n0 == 0 and capacity is None:
            raise ValueError("cannot serve an empty gallery "
                             "(pass capacity= to start an online index)")
        if len(image_paths) != n0:
            raise ValueError(
                f"{len(image_paths)} paths vs {n0} feature rows")
        self.image_paths = [str(p) for p in image_paths]
        self.metric = metric
        self.image_size = image_size
        self.resize_mode = resize_mode
        self.max_batch = max_batch
        self.buckets = _buckets(max_batch)
        self._forward = forward_fn
        # Per-modality BN (train/bn.py, VERDICT r4 item 2): HTTP queries
        # are SKETCHES, the resident gallery and online /add rows are
        # photos. When the run trained with --bn_recalibrate
        # per_modality, ``query_forward_fn`` carries sketch-population
        # running stats and ``forward_fn`` photo-population stats — the
        # same split cli/inference.py applies offline. Default: one
        # forward for both (shared-stats models, feature-cache serving).
        self._query_forward = query_forward_fn or forward_fn
        self.per_modality_bn = query_forward_fn is not None
        self._lock = threading.Lock()  # guards gallery/n_valid/paths

        self.capacity = capacity
        self.mesh = mesh
        if capacity is not None:
            if capacity < max(n0, 1):
                raise ValueError(
                    f"capacity {capacity} < initial gallery {n0}")
            feats = np.zeros((capacity, gallery_features.shape[1]),
                             np.float32)
            feats[:n0] = np.asarray(gallery_features, np.float32)
            self.gallery = jnp.asarray(feats)
            self.k_max = min(k_max, capacity)
        else:
            self.gallery = jnp.asarray(gallery_features, jnp.float32)
            self.k_max = min(k_max, n0)
        rows = int(self.gallery.shape[0])
        # live-row mask (device); slot bookkeeping (host, under _lock)
        self._mask = jnp.arange(rows) < n0
        self.n_valid = n0
        self._next = n0  # next never-used slot
        self._free: List[int] = []  # tombstoned slots, reused by adds

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from art_sbir_tpu.parallel.mesh import gallery_sharding

            ax = mesh.axis_names[0]
            n_shards = int(mesh.shape[ax])
            if rows % n_shards:
                raise ValueError(
                    f"gallery rows {rows} (pad with capacity=) must be "
                    f"divisible by the mesh's first axis ({n_shards}) for "
                    "row-sharded serving")
            self.gallery = jax.device_put(
                self.gallery, gallery_sharding(mesh, axis_name=ax))
            self._mask = jax.device_put(
                self._mask, NamedSharding(mesh, P(ax)))

        # same gallery-size routing as offline eval (rank.py): below the
        # measured crossover one fused XLA program (embed -> (B, N)
        # distance matrix -> top-k); above it, embed-only on device, then
        # the streaming Pallas kernel whose state is O(B) instead of the
        # HBM-prohibitive (B, N) matrix. Online (capacity) indexes always
        # use the maskable XLA program.
        from art_sbir_tpu.retrieval.rank import FUSED_GALLERY_THRESHOLD

        self.use_fused = (capacity is None
                          and metric in ("euclidean", "cosine")
                          and self.gallery.shape[0] >= FUSED_GALLERY_THRESHOLD
                          and self.k_max <= 128)

        self._ivf = None
        self._ivf_nprobe = int(ivf_nprobe)
        if index_cache is not None and (
                ivf_nlist is None or capacity is not None):
            raise ValueError("index_cache persists immutable IVF/IVF-PQ "
                             "indexes only (requires ivf_nlist, no "
                             "capacity= — online mutations would "
                             "invalidate the cache)")
        ivf_cached = False  # a cached PQ must pair with its cached IVF
        if ivf_nlist is not None:
            if quantize:
                raise ValueError("ivf_nlist does not compose with "
                                 "quantize= — pick one scan strategy")
            if mesh is not None:
                # SHARDED IVF (ops/ivf.py): immutable -> one independent
                # local index per gallery shard (ShardedIVF); online
                # (capacity=) -> shared centroids over the initial live
                # rows + per-shard mutable tables/spills with local slot
                # ids (ShardedOnlineIVF). Either way: per-shard probes,
                # shard-local gathers, O(Q*k) merge over ICI.
                from art_sbir_tpu.ops.ivf import (build_ivf_sharded,
                                                  build_ivf_sharded_online,
                                                  load_ivf_sharded,
                                                  save_ivf_sharded)

                ax0 = mesh.axis_names[0]
                n_shards = int(mesh.shape[ax0])
                if self.k_max > rows // n_shards:
                    raise ValueError(
                        f"k_max={self.k_max} exceeds the per-shard "
                        f"gallery size {rows // n_shards} for sharded "
                        "IVF serving")
                if capacity is not None:
                    if n0 < 1:
                        raise ValueError("online IVF needs a non-empty "
                                         "initial gallery to cluster")
                    self._ivf = build_ivf_sharded_online(
                        self.gallery, n0, n_shards, int(ivf_nlist) or None,
                        metric=metric)
                else:
                    cache_dir = (Path(index_cache) if index_cache
                                 else None)
                    if cache_dir is not None:
                        cache_dir.mkdir(parents=True, exist_ok=True)
                        f = cache_dir / "ivf_sharded.npz"
                        if f.exists():
                            cand = load_ivf_sharded(f)
                            if (cand.metric == metric
                                    and int(cand.centroids.shape[2])
                                    == int(self.gallery.shape[1])
                                    and cand.n_shards == n_shards
                                    and cand.n_local == rows // n_shards
                                    and int(cand.counts.sum()) == n0
                                    and (int(ivf_nlist) == 0
                                         or cand.nlist == int(ivf_nlist))):
                                self._ivf = cand
                                ivf_cached = True
                    if self._ivf is None:
                        self._ivf = build_ivf_sharded(
                            self.gallery, n_shards, int(ivf_nlist) or None,
                            metric=metric)
                        if cache_dir is not None:
                            save_ivf_sharded(self._ivf,
                                             cache_dir / "ivf_sharded.npz")
            elif capacity is not None:
                # ONLINE IVF: cluster the initial live rows; adds assign
                # to the nearest centroid, removals tombstone via the
                # live mask, overflow spills (ops/ivf.py::OnlineIVF)
                from art_sbir_tpu.ops.ivf import build_ivf_online

                if n0 < 1:
                    raise ValueError("online IVF needs a non-empty "
                                     "initial gallery to cluster")
                self._ivf = build_ivf_online(
                    self.gallery, n0, int(ivf_nlist) or None, metric=metric)
            else:
                from art_sbir_tpu.ops.ivf import build_ivf, load_ivf, \
                    save_ivf

                cache_dir = Path(index_cache) if index_cache else None
                if cache_dir is not None:
                    cache_dir.mkdir(parents=True, exist_ok=True)
                    f = cache_dir / "ivf.npz"
                    if f.exists():
                        cand = load_ivf(f)
                        if (cand.metric == metric
                                and int(cand.centroids.shape[1])
                                == int(self.gallery.shape[1])
                                and int(cand.counts.sum()) == n0
                                and (int(ivf_nlist) == 0
                                     or cand.nlist == int(ivf_nlist))):
                            self._ivf = cand
                            ivf_cached = True
                if self._ivf is None:
                    self._ivf = build_ivf(
                        self.gallery, int(ivf_nlist) or None, metric=metric)
                    if cache_dir is not None:
                        save_ivf(self._ivf, cache_dir / "ivf.npz")
            self.use_fused = False  # the probe replaces both scan routes
            if self._ivf_nprobe == 0:
                # auto-tune: smallest nprobe reaching 95% recall@k on a
                # PROXY query set (perturbed gallery rows — optimistic
                # vs real out-of-distribution queries; pass a measured
                # nprobe when a held-out query set exists)
                from art_sbir_tpu.ops.ivf import (OnlineIVF,
                                                  ShardedOnlineIVF,
                                                  ivf_search_sharded,
                                                  tune_nprobe)

                idx = self._ivf
                if isinstance(idx, OnlineIVF):
                    idx = idx.as_index()
                elif isinstance(idx, ShardedOnlineIVF):
                    idx = idx.snapshot()[0]
                g_live = (self.gallery[:n0] if capacity is not None
                          else self.gallery)
                search_fn = None
                if mesh is not None:
                    mask0 = self._mask if capacity is not None else None
                    spill0 = (self._ivf.snapshot()[1]
                              if capacity is not None else None)

                    def search_fn(q, nprobe, k, _idx=idx):
                        return ivf_search_sharded(q, _idx, self.gallery,
                                                  mesh, nprobe=nprobe, k=k,
                                                  mask=mask0, spill=spill0)
                prng = np.random.default_rng(0)
                sel = prng.integers(0, n0, min(256, n0))
                rows = np.asarray(jnp.take(g_live, jnp.asarray(sel),
                                           axis=0), np.float32)
                proxy = rows + 0.05 * rows.std() * prng.standard_normal(
                    rows.shape).astype(np.float32)
                # SERVING_NPROBE_MARGIN: the perturbed-row proxy is
                # measurably one power of two optimistic vs real
                # cross-modal queries at scale (round 5,
                # goldens/ann_learned_tpu.json — proxy picks 8, real
                # sketches need 16 for the 0.95 contract)
                from art_sbir_tpu.ops.ivf import SERVING_NPROBE_MARGIN

                self._ivf_nprobe = tune_nprobe(
                    idx, g_live, jnp.asarray(proxy), k=self.k_max,
                    search_fn=search_fn, margin=SERVING_NPROBE_MARGIN)

        self._pq = None
        if pq_m is not None:
            if self._ivf is None:
                raise ValueError("pq_m requires ivf_nlist= (IVF-PQ: the "
                                 "probe selects which codes to score)")
            if capacity is not None or quantize:
                raise ValueError("pq_m serves immutable indexes only "
                                 "(no capacity=/quantize=)")
            if pq_rerank not in ("none", "float32", "bfloat16"):
                raise ValueError(f"pq_rerank must be none|float32|bfloat16,"
                                 f" got {pq_rerank!r}")
            from art_sbir_tpu.ops.pq import (build_ivf_pq,
                                             build_ivf_pq_sharded,
                                             load_pq, save_pq)

            # RESIDUAL IVF-PQ (FAISS by_residual): codes quantize
            # x - c(x), the within-cluster variation ranking needs —
            # raw-row PQ measured collapsed at scale (ops/pq.py).
            # With mesh=: ONE shared codebook over per-shard residuals,
            # codes row-sharded with the gallery (ops/pq.py sharded).
            build = (build_ivf_pq_sharded if mesh is not None
                     else build_ivf_pq)
            pq_file = "pq_sharded.npz" if mesh is not None else "pq.npz"
            cache_dir = Path(index_cache) if index_cache else None
            if cache_dir is not None and ivf_cached and (
                    cache_dir / pq_file).exists():
                # only pair a cached PQ with the cached IVF it was
                # encoded against (a rebuilt IVF has fresh centroids)
                cand_cb, cand_codes = load_pq(cache_dir / pq_file)
                if (cand_cb.residual and cand_cb.metric == metric
                        and cand_cb.m == int(pq_m)
                        and cand_cb.k_codes == min(256, n0)
                        and cand_codes.shape == (n0, int(pq_m))
                        and ((cand_cb.rotation is not None)
                             == bool(pq_opq_iters))):
                    self._pq = (cand_cb, cand_codes)
            if self._pq is None:
                self._pq = build(self.gallery, self._ivf,
                                 int(pq_m), k_codes=min(256, n0),
                                 opq_iters=int(pq_opq_iters))
                if cache_dir is not None:
                    save_pq(self._pq[0], self._pq[1],
                            cache_dir / pq_file)
            self._rerank_factor = int(pq_rerank_factor)
            if pq_rerank == "none":
                self.gallery = None  # codes + table are the whole index
            elif pq_rerank == "bfloat16":
                self.gallery = self.gallery.astype(jnp.bfloat16)

        self._qg = None
        self._quant_fused = False
        if rerank_dtype != "float32" and not quantize:
            raise ValueError("rerank_dtype applies to quantize=True "
                             "engines only")
        if quantize:
            if capacity is not None:
                raise ValueError("quantize=True serves immutable indexes "
                                 "only (no capacity mode)")
            from art_sbir_tpu.ops.quant import quantize_gallery

            if mesh is not None:
                # per-shard top-k needs k rows on every chip
                ax0 = mesh.axis_names[0]
                n_loc = rows // max(int(mesh.shape[ax0]), 1)
                if self.k_max > n_loc:
                    raise ValueError(
                        f"k_max={self.k_max} exceeds the per-shard gallery "
                        f"size {n_loc} for quantized sharded serving")
            if rerank_dtype not in ("float32", "bfloat16"):
                raise ValueError(f"rerank_dtype must be float32|bfloat16, "
                                 f"got {rerank_dtype!r}")
            self._qg = quantize_gallery(self.gallery, metric)
            if rerank_dtype == "bfloat16":  # capacity mode: bf16 rows
                self.gallery = self.gallery.astype(jnp.bfloat16)
            self._rerank_factor = int(rerank_factor)
            self.use_fused = False  # int8 scan replaces both routes
            # int8-specific crossover (NOT the bf16 one): the kernel's
            # certificate-failure rate scales ~1/N, so below ~500k the
            # fallback rescans make it lose to the XLA int8 scan
            # (rank.py::QUANT_FUSED_GALLERY_THRESHOLD, measured). The
            # candidate budget r = rerank_factor*k_max must stay inside
            # the kernel's MEASURED envelope (r <= 128 — beyond it the
            # r-unrolled extract loop is untimed compile/VPU territory,
            # same bound as retrieve_quantized_sharded's auto-route).
            # The sharded path (mesh=) routes internally by SHARD size.
            from art_sbir_tpu.retrieval.rank import (
                QUANT_FUSED_GALLERY_THRESHOLD)

            self._quant_fused = (
                mesh is None
                and self.gallery.shape[0] >= QUANT_FUSED_GALLERY_THRESHOLD
                and self._rerank_factor * self.k_max <= 128)

        def embed(images_u8: jax.Array) -> jax.Array:
            # QUERY modality (sketches) — per-modality BN models embed
            # these with sketch-population stats
            emb = self._query_forward(images_u8)
            if isinstance(emb, (tuple, list)):  # classification models
                emb = emb[0]
            return emb.astype(jnp.float32)

        def embed_gallery(images_u8: jax.Array) -> jax.Array:
            # GALLERY modality (photos) — online /add rows must match
            # the resident gallery's embedding geometry
            emb = self._forward(images_u8)
            if isinstance(emb, (tuple, list)):
                emb = emb[0]
            return emb.astype(jnp.float32)

        def program(images_u8: jax.Array, gallery: jax.Array,
                    mask: jax.Array):
            dist = pairwise_distance(embed(images_u8), gallery,
                                     metric=self.metric)
            return top_k(dist, self.k_max, valid=mask)

        def set_row(gallery: jax.Array, row: jax.Array,
                    at: jax.Array) -> jax.Array:
            return jax.lax.dynamic_update_slice(gallery, row[None], (at, 0))

        def set_mask(mask: jax.Array, at: jax.Array,
                     val: jax.Array) -> jax.Array:
            return jax.lax.dynamic_update_slice(mask, val[None], (at,))

        # one jit each; distinct batch buckets become distinct compiled
        # executables under the same callable (shape-keyed cache).
        # set_row/set_mask deliberately do NOT donate their buffers: a
        # concurrently-dispatched search may still hold the old arrays,
        # and donation would delete them under that dispatch.
        self._embed = jax.jit(embed)
        # alias when the forwards coincide: a second jit would compile a
        # duplicate executable per batch bucket for the identical program
        self._embed_gallery = (jax.jit(embed_gallery)
                               if self.per_modality_bn else self._embed)
        self._program = jax.jit(program)
        self._set_row = jax.jit(set_row)
        self._set_mask = jax.jit(set_mask)

    # ------------------------------------------------------------ queries

    def decode(self, data: bytes) -> np.ndarray:
        """Image bytes (PNG/JPEG/...) -> uint8 (S, S, 3) query — the
        native in-memory decoder when available (bit-identical to PIL,
        no temp files), PIL otherwise; same pixels as the offline
        gallery path either way."""
        return decode_bytes(data, self.image_size, self.resize_mode)

    def search_arrays(
        self, images_u8: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 (B, S, S, 3) -> (top-k distances, top-k indices), padded
        to the enclosing bucket on device, sliced back on host."""
        b = images_u8.shape[0]
        bucket = next(x for x in self.buckets if x >= b) if (
            b <= self.max_batch) else b
        if bucket != b:
            pad = np.zeros((bucket - b, *images_u8.shape[1:]), np.uint8)
            images_u8 = np.concatenate([images_u8, pad])
        with self._lock:  # consistent (gallery, mask, ivf) snapshot
            gallery, mask = self.gallery, self._mask
            ivf = self._ivf
            if ivf is not None and self.capacity is not None:
                if self.mesh is not None:
                    ivf, spill = ivf.snapshot()  # ShardedOnlineIVF
                else:
                    ivf, spill = ivf.as_index(), ivf.spill  # OnlineIVF
        if self._pq is not None:
            from art_sbir_tpu.ops.pq import (ivf_pq_search,
                                             ivf_pq_search_sharded)

            emb = self._embed(jnp.asarray(images_u8))
            cb, codes = self._pq
            if self.mesh is not None:
                # per-shard ADC over shard-local codes + local exact
                # rerank against the shard's own rows; O(B*k) ICI merge
                vals, idx = ivf_pq_search_sharded(
                    emb, ivf, codes, cb, self.mesh,
                    nprobe=self._ivf_nprobe, k=self.k_max, rows=gallery,
                    rerank_factor=self._rerank_factor)
            else:
                vals, idx = ivf_pq_search(
                    emb, ivf, codes, cb, nprobe=self._ivf_nprobe,
                    k=self.k_max, rows=gallery,
                    rerank_factor=self._rerank_factor)
        elif ivf is not None:
            from art_sbir_tpu.ops.ivf import ivf_search, ivf_search_sharded

            emb = self._embed(jnp.asarray(images_u8))
            if self.mesh is not None:
                # per-shard probes, shard-local gathers, O(B*k) ICI merge;
                # online (capacity) composes via mask + per-shard spills
                vals, idx = ivf_search_sharded(
                    emb, ivf, gallery, self.mesh, nprobe=self._ivf_nprobe,
                    k=self.k_max,
                    mask=mask if self.capacity is not None else None,
                    spill=spill if self.capacity is not None else None)
            elif self.capacity is not None:
                # the live mask gates tombstones + the add publish race
                vals, idx = ivf_search(emb, ivf, gallery,
                                       nprobe=self._ivf_nprobe,
                                       k=self.k_max, mask=mask, spill=spill)
            else:
                vals, idx = ivf_search(emb, ivf, gallery,
                                       nprobe=self._ivf_nprobe,
                                       k=self.k_max)
        elif self._qg is not None:
            from art_sbir_tpu.ops.quant import (retrieve_quantized,
                                                retrieve_quantized_fused,
                                                retrieve_quantized_sharded)

            emb = self._embed(jnp.asarray(images_u8))
            if self.mesh is not None:
                vals, idx = retrieve_quantized_sharded(
                    emb, self._qg, gallery, self.mesh, k=self.k_max,
                    rerank_factor=self._rerank_factor)
            elif self._quant_fused:
                # device_get: (vals, idx, certificate) ride ONE transfer
                # — the response is host-bound anyway
                vals, idx = retrieve_quantized_fused(
                    emb, self._qg, gallery, k=self.k_max,
                    rerank_factor=self._rerank_factor, device_get=True)
            else:
                vals, idx = retrieve_quantized(
                    emb, self._qg, gallery, k=self.k_max,
                    rerank_factor=self._rerank_factor)
        elif self.use_fused:
            from art_sbir_tpu.ops.retrieval_pallas import (
                retrieve_fused, retrieve_fused_sharded)

            emb = self._embed(jnp.asarray(images_u8))
            pos = jnp.zeros(emb.shape[0], jnp.int32)  # unused in serving
            if self.mesh is not None:
                _, vals, idx = retrieve_fused_sharded(
                    emb, gallery, pos, self.mesh, k=self.k_max,
                    metric=self.metric, with_ranks=False)
            else:
                # device_get: results + certificate in one transfer
                _, vals, idx = retrieve_fused(
                    emb, gallery, pos, k=self.k_max, metric=self.metric,
                    with_ranks=False, device_get=True)
            if self.metric == "euclidean":  # kernel reports squared dists
                vals = np.sqrt(vals) if isinstance(vals, np.ndarray) \
                    else jnp.sqrt(vals)
        else:
            vals, idx = self._program(jnp.asarray(images_u8), gallery, mask)
        if not isinstance(vals, np.ndarray):
            # ONE bundled host pull for both arrays: separate np.asarray
            # calls each pay a dispatch + transfer RTT through the tunnel
            # (measured 2x on the IVF route at 600k — PERF.md)
            vals, idx = jax.device_get((vals, idx))
        return np.asarray(vals[:b]), np.asarray(idx[:b])

    def add_images(self, items: Sequence[Tuple[bytes, str]]) -> List[int]:
        """Online index update: decode + embed each (image_bytes, path)
        and write it into a free slot — tombstoned (removed) slots are
        reused first, then never-used capacity. Requires ``capacity``
        mode. Returns the assigned slot indices. Never recompiles: each
        write is a jitted dynamic_update_slice and queries select live
        rows by the traced mask."""
        if self.capacity is None:
            raise ValueError("immutable index: construct with capacity= "
                             "to enable add_images")
        if not items:
            return []
        imgs = np.stack([self.decode(b) for b, _ in items])
        b = imgs.shape[0]
        bucket = next((x for x in self.buckets if x >= b), b)
        if bucket != b:
            imgs = np.concatenate(
                [imgs, np.zeros((bucket - b, *imgs.shape[1:]), np.uint8)])
        emb_padded = self._embed_gallery(jnp.asarray(imgs))
        emb = emb_padded[:b]
        with self._lock:
            if self.n_valid + b > self.capacity:
                raise ValueError(
                    f"index full: {self.n_valid}+{b} > {self.capacity}")
            slots = []
            for i in range(b):
                slot = self._free.pop() if self._free else self._next
                if slot == self._next:
                    self._next += 1
                slots.append(slot)
            gallery, mask = self.gallery, self._mask
            for i, slot in enumerate(slots):
                gallery = self._set_row(gallery, emb[i], jnp.int32(slot))
                mask = self._set_mask(mask, jnp.int32(slot),
                                      jnp.asarray(True))
                if slot < len(self.image_paths):
                    self.image_paths[slot] = items[i][1]
                else:
                    self.image_paths.append(items[i][1])
            if self._ivf is not None:
                # cluster routing for the new rows (padded batch: the
                # assignment matmul compiles once per bucket)
                self._ivf.add(slots, emb_padded)
            self.gallery = gallery
            self._mask = mask
            self.n_valid += b  # publish last
        return slots

    def remove(self, paths: Sequence[str]) -> List[int]:
        """Tombstone the slots serving these paths (first match each);
        their rows stop appearing in results immediately and the slots
        are reused by later adds. Returns the freed slot indices."""
        if self.capacity is None:
            raise ValueError("immutable index: construct with capacity= "
                             "to enable remove")
        with self._lock:
            freed = []
            for p in paths:
                try:
                    slot = self.image_paths.index(p)
                except ValueError:
                    raise KeyError(f"path not in index: {p}") from None
                self.image_paths[slot] = None  # tombstone
                self._mask = self._set_mask(self._mask, jnp.int32(slot),
                                            jnp.asarray(False))
                if self._ivf is not None:
                    self._ivf.remove(slot)  # recycle the cluster slot
                self._free.append(slot)
                freed.append(slot)
            self.n_valid -= len(freed)
        return freed

    def save(self, model_name: str = "ServedIndex",
             dataset_name: str = "online",
             root: Path | str = Path("data/image_features")) -> str:
        """Persist the live rows as a standard gallery feature cache
        (loadable by :func:`engine_from_feature_cache` and the offline
        eval's ``--features``). Returns the cache folder name."""
        from art_sbir_tpu.retrieval.embed import save_image_features

        if self.gallery is None:
            raise ValueError("pq_rerank='none' dropped the exact rows; "
                             "there is nothing full-precision to save")
        with self._lock:  # snapshot refs only; transfer outside the lock
            gallery, mask = self.gallery, self._mask
            paths = list(self.image_paths)
        live = np.flatnonzero(np.asarray(mask))
        # gather live rows on device; transfer only those to host
        feats = np.asarray(jnp.take(gallery, jnp.asarray(live), axis=0),
                           np.float32)
        return save_image_features(model_name, dataset_name,
                                   [paths[i] for i in live], feats,
                                   root=root)

    def search(self, image_bytes: bytes, k: Optional[int] = None) -> Dict:
        """Single query -> {paths, distances}. Synchronous; for the
        coalescing path use :class:`MicroBatcher`."""
        vals, idx = self.search_arrays(self.decode(image_bytes)[None])
        return self._result(vals[0], idx[0], k)

    def health_stats(self) -> Dict:
        """Consistent health/index snapshot for ``/healthz`` — taken
        under the engine lock. A lock-free read could call
        ``_ivf.stats()`` while ``add_images`` mutates shard tables:
        ``snapshot()`` caches lazily into ``_snap``, so a racing build
        could capture pre-mutation tables but be STORED after the
        mutation cleared ``_snap``, and searches would then serve a
        stale cluster view until the next mutation."""
        with self._lock:
            out: Dict = {
                "status": "ok",
                "gallery_size": int(self.n_valid),
                "capacity": self.capacity,
                "metric": self.metric,
                "image_size": self.image_size,
                "k_max": self.k_max,
                "per_modality_bn": self.per_modality_bn,
            }
            if self._ivf is not None:
                out["ivf"] = {**self._ivf.stats(),
                              "nprobe": self._ivf_nprobe}
            if getattr(self, "_pq", None) is not None:
                out["pq"] = {
                    "m": self._pq[0].m,
                    "k_codes": self._pq[0].k_codes,
                    "bytes_per_row": self._pq[0].m,
                    "rows_resident": (str(self.gallery.dtype)
                                      if self.gallery is not None
                                      else "dropped"),
                    "rerank_factor": self._rerank_factor,
                }
            return out

    def _result(self, vals: np.ndarray, idx: np.ndarray,
                k: Optional[int]) -> Dict:
        # int() validates request-supplied k (floats/strings raise HERE,
        # in the caller's request scope, not inside a shared batch)
        k = self.k_max if k is None else min(int(k), self.k_max)
        vals, idx = vals[:k], idx[:k]
        live = np.isfinite(vals)  # masked (empty) slots rank at +inf
        return {
            "paths": [self.image_paths[int(i)] for i in idx[live]],
            "distances": [float(v) for v in vals[live]],
        }


class MicroBatcher:
    """Coalesces concurrent single queries into one device dispatch.

    The first request in an empty queue opens a ``window_ms`` window;
    every request arriving inside it (up to ``engine.max_batch``) is
    stacked into one :meth:`RetrievalEngine.search_arrays` call. Each
    caller blocks only on its own future.
    """

    def __init__(self, engine: RetrievalEngine, window_ms: float = 2.0):
        self.engine = engine
        self.window_s = window_ms / 1e3
        self.stats = ServerStats()
        self._q: "queue.Queue[Optional[tuple]]" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="retrieval-microbatch")
        self._thread.start()

    def search(self, image_bytes: bytes, k: Optional[int] = None,
               timeout: Optional[float] = 600.0) -> Dict:
        """Thread-safe; blocks until this query's results are ready.

        The default timeout must cover a COLD bucket's XLA compile (tens
        of seconds to minutes for the flagship encoder on a slow host —
        see CLAUDE.md), not just a warm dispatch; start the server with
        ``--warmup`` to pay those compiles before listening."""
        img = self.engine.decode(image_bytes)  # decode on the caller thread
        ev = threading.Event()
        slot: List = [None]
        self._q.put((img, k, ev, slot))
        if not ev.wait(timeout):
            raise TimeoutError("retrieval dispatch timed out")
        if isinstance(slot[0], BaseException):
            raise slot[0]
        return slot[0]

    def close(self) -> None:
        self._q.put(None)
        self._thread.join(timeout=10)

    # ------------------------------------------------------------ worker

    def _collect(self) -> Optional[List[tuple]]:
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        waited = False
        # drain whatever is already queued; on first emptiness wait out the
        # window once, drain again, then dispatch
        while len(batch) < self.engine.max_batch:
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                if waited:
                    break
                waited = True
                if self.window_s > 0:
                    time.sleep(self.window_s)
                continue
            if nxt is None:
                self._q.put(None)  # re-post the shutdown sentinel
                break
            batch.append(nxt)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            imgs = np.stack([b[0] for b in batch])
            try:
                vals, idx = self.engine.search_arrays(imgs)
            except BaseException as e:  # whole dispatch failed
                for _, _, ev, slot in batch:
                    slot[0] = e
                    ev.set()
                continue
            self.stats.record(len(batch))
            # per-waiter result assembly: one request's bad parameters
            # (e.g. a non-int k) must fail only that request, never its
            # batchmates; slot is never touched after its ev is set
            for i, (_, k, ev, slot) in enumerate(batch):
                try:
                    slot[0] = self.engine._result(vals[i], idx[i], k)
                except BaseException as e:
                    slot[0] = e
                ev.set()


def engine_from_feature_cache(
    forward_fn: Callable,
    folder_name: str,
    root: Path | str = Path("data/image_features"),
    **kw,
) -> RetrievalEngine:
    """Build an engine from a saved gallery-embedding cache
    (:func:`art_sbir_tpu.retrieval.embed.load_image_features` — .npy or
    reference-style CSV, reference `utils.py:258-263`)."""
    from art_sbir_tpu.retrieval.embed import load_image_features

    paths, feats = load_image_features(folder_name, root)
    return RetrievalEngine(forward_fn, feats.astype(np.float32), paths, **kw)
