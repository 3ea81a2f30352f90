"""IVF (inverted-file) clustered index — sublinear candidate scan for serving.

A beyond-reference scale feature (the reference's retrieval is a per-query
f32 full scan, `/root/reference/inference.py:43-56`; this framework's full
scans live in `ops/distance.py` / `ops/retrieval_pallas.py` / `ops/quant.py`).

Why it exists — the serving-regime arithmetic. Every full-scan route reads
the entire resident gallery per dispatch (N*D bytes), amortized over the
queries in the batch. Offline eval batches thousands of queries, so the
scan is cheap per query and EXACT — full scans win there and keep the
eval contract. The serving engine dispatches coalesced micro-batches of
~1-32 requests (measured mean ~4, PERF.md), so per dispatch a full scan
reads N*D bytes to answer a handful of queries. An IVF probe reads
``B * nprobe * Cpad * D`` gathered bytes instead — independent of N — so
its advantage is exactly where serving lives: small B, big N
(break-even at ``B * nprobe * Cpad ~= N``; e.g. 600k rows, nprobe=8,
Cpad~1k: ~9x less gallery traffic at B=8).

TPU-native design (static shapes throughout):

* **Build**: k-means on device — Lloyd's iterations as one jitted
  ``lax.scan`` over row chunks (assignment = MXU ``pairwise_sq_l2``
  argmin; centroid update = one-hot matmul accumulation), optionally on a
  row sample; cosine runs spherical k-means (rows and centroids
  L2-normalized, so euclidean argmin == cosine argmax).
* **Layout**: clusters are padded to one fixed width ``Cpad`` (max count,
  lane-aligned) in a ``(C, Cpad)`` int32 table of gallery row ids;
  pad slots hold ``N`` (one past the gallery) and rank at ``+inf``.
  No gallery reorder, no duplicated rows — the table is the only
  addition (4 * C * Cpad bytes).
* **Search** (jitted, ``nprobe``/``k`` static): query->centroid distances
  (tiny MXU matmul) -> ``lax.top_k`` probe -> candidate ids gathered and
  SORTED ASCENDING per query (pads sort to the end) -> one gather of the
  candidate rows -> exact f32 row-wise distances (`ops/distance.py`
  torch-parity forms) -> stable argsort top-k. Because candidates are
  index-sorted before the stable argsort, exact-distance ties break by
  gallery index — the exact path's documented tie order — so with
  ``nprobe == nlist`` the results are IDENTICAL to
  :func:`art_sbir_tpu.ops.distance.retrieve` (regression-locked).

Approximation contract: the only error mode is a true top-k row living in
an unprobed cluster (distances of scored candidates are exact).
Recall is measured by :func:`art_sbir_tpu.ops.quant.topk_overlap` and
regression-locked in ``tests/test_ops_ivf.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from art_sbir_tpu.ops.distance import (
    cosine_distance,
    euclidean_distance,
    pairwise_distance,
    pairwise_sq_l2,
)

_METRICS = ("euclidean", "cosine")


class IVFIndex(NamedTuple):
    """Clustered index over a gallery (which stays owned by the caller).

    ``row_ids`` slot value ``N`` (= gallery rows, one past the end) marks
    padding. ``metric`` is host-side metadata, kept out of jitted cores.
    """

    centroids: jax.Array  # (C, D) f32; L2-normalized for cosine
    row_ids: jax.Array    # (C, Cpad) int32, pad slots = N
    counts: np.ndarray    # (C,) int64 host copy (diagnostics/routing)
    metric: str

    @property
    def nlist(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def pad_width(self) -> int:
        return int(self.row_ids.shape[1])

    def stats(self) -> dict:
        """Cluster-balance diagnostics (imbalance = scan-cost multiplier:
        search gathers ``nprobe * Cpad`` slots, so Cpad/mean-count is the
        padding overhead paid per probe)."""
        c = self.counts
        mean = float(c.mean()) if len(c) else 0.0
        return {
            "nlist": self.nlist,
            "pad_width": self.pad_width,
            "min_count": int(c.min()) if len(c) else 0,
            "max_count": int(c.max()) if len(c) else 0,
            "mean_count": mean,
            "empty_clusters": int((c == 0).sum()),
            "pad_overhead": (self.pad_width / mean) if mean else 0.0,
        }


def _l2n(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=("chunk", "spherical"))
def _kmeans_step(x: jax.Array, w: jax.Array, cent: jax.Array,
                 *, chunk: int, spherical: bool) -> jax.Array:
    """One Lloyd's iteration over (padded) rows ``x`` with row weights
    ``w`` (0 for pad rows). Empty clusters keep their centroid."""
    c, d = cent.shape
    xr = x.reshape(-1, chunk, d)
    wr = w.reshape(-1, chunk)

    def body(carry, inp):
        sums, counts = carry
        xc, wc = inp
        d2 = pairwise_sq_l2(xc, cent, precision="default")
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, c, dtype=jnp.float32) * wc[:, None]
        sums = sums + jnp.dot(onehot.T, xc,
                              preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body, (jnp.zeros((c, d), jnp.float32), jnp.zeros(c, jnp.float32)),
        (xr, wr))
    new = jnp.where(counts[:, None] > 0,
                    sums / jnp.maximum(counts, 1.0)[:, None], cent)
    return _l2n(new) if spherical else new


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign(x: jax.Array, cent: jax.Array, *, chunk: int) -> jax.Array:
    """Nearest-centroid label per (padded) row, scan-chunked."""
    d = cent.shape[1]
    xr = x.reshape(-1, chunk, d)

    def body(_, xc):
        d2 = pairwise_sq_l2(xc, cent, precision="default")
        return None, jnp.argmin(d2, axis=1).astype(jnp.int32)

    _, labels = jax.lax.scan(body, None, xr)
    return labels.reshape(-1)


def _pad_rows(x: jax.Array, chunk: int) -> Tuple[jax.Array, jax.Array, int]:
    n = x.shape[0]
    rem = (-n) % chunk
    w = jnp.concatenate([jnp.ones(n, jnp.float32),
                         jnp.zeros(rem, jnp.float32)])
    if rem:
        x = jnp.concatenate([x, jnp.zeros((rem, x.shape[1]), x.dtype)])
    return x, w, n


@functools.partial(jax.jit, static_argnames=("c",))
def _kmeanspp_init(x: jax.Array, key: jax.Array, *, c: int) -> jax.Array:
    """k-means++ seeding (Arthur & Vassilvitskii 2007): each next center
    is sampled ∝ squared distance to the nearest chosen center. Random
    row init collapses centroids onto dense blobs and strands others
    empty; ++ seeding spreads them — O(C·N·D), one fori_loop."""
    n, d = x.shape
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    cent0 = jnp.zeros((c, d), jnp.float32).at[0].set(x[first])
    d2min0 = jnp.sum(jnp.square(x - x[first]), axis=1)

    def body(i, carry):
        cent, d2min, key = carry
        key, sub = jax.random.split(key)
        # duplicates of chosen centers have d2min == 0 -> -inf logits;
        # if EVERY row is a duplicate, fall back to uniform
        logits = jnp.where(d2min > 0, jnp.log(jnp.maximum(d2min, 1e-30)),
                           -jnp.inf)
        logits = jnp.where(jnp.any(d2min > 0), logits,
                           jnp.zeros_like(logits))
        idx = jax.random.categorical(sub, logits)
        newc = x[idx]
        cent = cent.at[i].set(newc)
        d2min = jnp.minimum(d2min, jnp.sum(jnp.square(x - newc), axis=1))
        return cent, d2min, key

    cent, _, _ = jax.lax.fori_loop(1, c, body, (cent0, d2min0, key))
    return cent


def kmeans(
    x: jax.Array,
    n_clusters: int,
    *,
    iters: int = 10,
    seed: int = 0,
    chunk: int = 16384,
    spherical: bool = False,
) -> jax.Array:
    """Device Lloyd's k-means -> (C, D) f32 centroids.

    k-means++ seeded (see :func:`_kmeanspp_init`). ``spherical=True``
    re-normalizes centroids each iteration (cosine geometry; expects
    pre-normalized ``x``). Deterministic for a given (seed, shapes)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if not 1 <= n_clusters <= n:
        raise ValueError(f"n_clusters must be in [1, {n}], got {n_clusters}")
    cent = _kmeanspp_init(x, jax.random.PRNGKey(seed), c=n_clusters)
    if spherical:
        cent = _l2n(cent)
    chunk = min(chunk, max(n, 1))
    xp, w, _ = _pad_rows(x, chunk)
    for _ in range(iters):
        cent = _kmeans_step(xp, w, cent, chunk=chunk, spherical=spherical)
    return cent


def build_ivf(
    gallery: jax.Array,
    n_clusters: Optional[int] = None,
    *,
    metric: str = "euclidean",
    iters: int = 10,
    seed: int = 0,
    sample: int = 131072,
    chunk: int = 16384,
) -> IVFIndex:
    """Cluster a gallery into an :class:`IVFIndex`.

    ``n_clusters`` defaults to ``~2*sqrt(N)`` (the classic IVF sizing:
    probe cost ~ nprobe*N/C, centroid cost ~ C — balanced near sqrt(N)).
    k-means fits on a seeded ``sample`` of rows (build cost bound), then
    every row is assigned. Cosine clusters on L2-normalized rows with
    spherical k-means so assignment geometry matches the search metric."""
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")
    g = jnp.asarray(gallery, jnp.float32)
    n = int(g.shape[0])
    if n == 0:
        raise ValueError("cannot build an IVF index over an empty gallery")
    if n_clusters is None:
        n_clusters = max(1, min(n, int(2 * np.sqrt(n))))
    gx = _l2n(g) if metric == "cosine" else g
    fit = gx
    sample = max(sample, n_clusters)  # the fit set must cover the init
    if n > sample:
        sel = jax.random.choice(jax.random.PRNGKey(seed + 1), n, (sample,),
                                replace=False)
        fit = jnp.take(gx, sel, axis=0)
    cent = kmeans(fit, n_clusters, iters=iters, seed=seed,
                  chunk=min(chunk, int(fit.shape[0])),
                  spherical=(metric == "cosine"))

    ck = min(chunk, n)
    gp, _, _ = _pad_rows(gx, ck)
    labels = np.asarray(_assign(gp, cent, chunk=ck))[:n]
    table, counts = pack_table(labels, n_clusters, n)
    return IVFIndex(cent, jnp.asarray(table), counts, metric)


# The serving engine's auto-tune margin (retrieval/server.py) and the
# golden-regeneration probe (scripts/probe_ann_learned.py) must agree on
# this factor, or the golden's "serving operating point" silently drifts
# from what the server deploys. Measured basis: one power of two of
# proxy optimism at 50k/1k-query scale (goldens/ann_learned_tpu.json).
SERVING_NPROBE_MARGIN = 2


def apply_nprobe_margin(nprobe: int, nlist: int,
                        margin: int = SERVING_NPROBE_MARGIN) -> int:
    """The ONE place the safety margin is applied to a tuned nprobe —
    :func:`tune_nprobe` and the golden-regeneration probe both call
    this, so the golden's recorded serving operating point cannot drift
    from the formula the server deploys (not just from the factor)."""
    if margin < 1:
        raise ValueError(f"margin must be >= 1, got {margin}")
    return min(int(nprobe) * margin, int(nlist))


def tune_nprobe(
    index,
    gallery: jax.Array,
    queries: jax.Array,
    *,
    k: int = 10,
    target_recall: float = 0.95,
    search_fn=None,
    margin: int = 1,
) -> int:
    """Smallest power-of-two ``nprobe`` whose recall@k on ``queries``
    (vs the exact path over the same gallery) meets ``target_recall``
    — falls back to ``nlist`` (exact) if none does, so the tuned index
    can never silently under-deliver on the tuning set. The right
    ``queries`` are a held-out sample of REAL queries; callers without
    one (the serving engine's auto mode) use perturbed gallery rows as
    a documented optimistic proxy.

    ``margin`` multiplies the tuned choice (capped at ``nlist``) as a
    safety factor for OPTIMISTIC tuning sets. Measured need (round 5,
    `goldens/ann_learned_tpu.json`): at 50k-gallery/1,000-real-query
    scale the perturbed-row proxy picks nprobe=8 (its own recall >=
    0.95) while real cross-modal sketch queries reach only 0.852 there
    and need 16 — exactly one power of two of proxy optimism. The
    serving engine's auto mode therefore passes ``margin=2``; tuning on
    held-out REAL queries needs no margin (the round-4 100-query run
    that suggested the proxy was exact was measured unrepresentative —
    ADVICE r4).

    ``index`` is any object with ``.nlist``/``.metric``
    (:class:`IVFIndex` or :class:`ShardedIVF`). ``search_fn(q, nprobe,
    k) -> (vals, ids)`` overrides the probe being tuned (the sharded
    engine passes :func:`ivf_search_sharded`); default is the
    single-device :func:`ivf_search` over ``index``."""
    from art_sbir_tpu.ops.distance import retrieve_chunked
    from art_sbir_tpu.ops.quant import topk_overlap

    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got "
                         f"{target_recall}")
    apply_nprobe_margin(1, 1, margin)  # validates margin up front
    if search_fn is None:
        def search_fn(q, nprobe, k):
            return ivf_search(q, index, gallery, nprobe=nprobe, k=k)
    q = jnp.asarray(queries, jnp.float32)
    k = min(k, int(gallery.shape[0]))
    _, _, exact = retrieve_chunked(q, jnp.asarray(gallery, jnp.float32),
                                   jnp.zeros(q.shape[0], jnp.int32), k=k,
                                   metric=index.metric,
                                   chunk=max(int(q.shape[0]), 1))
    exact = np.asarray(exact)
    nprobe = 1
    while nprobe < index.nlist:
        _, ids = search_fn(q, nprobe, k)
        if topk_overlap(ids, exact) >= target_recall:
            return apply_nprobe_margin(nprobe, index.nlist, margin)
        nprobe *= 2
    return index.nlist


def save_ivf(index: IVFIndex, path) -> None:
    """Persist an index as one ``.npz`` (centroids, table, counts,
    metric) so serving restarts skip the k-means build — the build is
    seconds at 600k rows but grows linearly (`PERF.md`)."""
    np.savez_compressed(
        path, centroids=np.asarray(index.centroids),
        row_ids=np.asarray(index.row_ids), counts=index.counts,
        metric=np.asarray(index.metric))


def load_ivf(path) -> IVFIndex:
    with np.load(path) as z:
        return IVFIndex(jnp.asarray(z["centroids"]),
                        jnp.asarray(z["row_ids"]),
                        z["counts"].astype(np.int64),
                        str(z["metric"]))


def pack_table(labels: np.ndarray, n_clusters: int,
               n_rows: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side cluster-table packing: per-row labels -> ((C, Cpad)
    int32 table with pad slots = ``n_rows``, (C,) int64 counts). Row ids
    ascend within each cluster (the tie-order contract). Shared by
    :func:`build_ivf` and out-of-core builders that assign labels chunk
    by chunk without ever materializing the gallery (e.g. the 3M-row
    IVF-PQ capacity probe, ``scripts/probe_pq.py``)."""
    counts = np.bincount(labels, minlength=n_clusters).astype(np.int64)
    pad = int(counts.max()) if n_clusters else 1
    pad = max(8, -(-pad // 8) * 8)  # lane-friendly width, >= 8
    table = np.full((n_clusters, pad), n_rows, dtype=np.int32)
    order = np.argsort(labels, kind="stable")  # ids ascend within a cluster
    offsets = np.zeros(n_clusters, np.int64)
    offsets[1:] = np.cumsum(counts)[:-1]
    for c in range(n_clusters):
        rows = order[offsets[c]: offsets[c] + counts[c]]
        table[c, : len(rows)] = rows
    return table, counts


@functools.partial(jax.jit, static_argnames=("metric", "k", "nprobe"))
def _ivf_core(
    queries: jax.Array,
    centroids: jax.Array,
    row_ids: jax.Array,
    gallery: jax.Array,
    mask: Optional[jax.Array] = None,
    spill: Optional[jax.Array] = None,
    *,
    metric: str,
    k: int,
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    n = gallery.shape[0]
    qf = jnp.asarray(queries, jnp.float32)
    qp = _l2n(qf) if metric == "cosine" else qf
    # centroid probe: tiny (Q, C) MXU matmul; bf16 passes suffice — the
    # probe ranking only selects clusters, scored distances stay exact f32
    cdist = (pairwise_sq_l2(qp, centroids, precision="default")
             if metric == "euclidean"
             else -jnp.dot(qp, centroids.T,
                           preferred_element_type=jnp.float32))
    _, probe = jax.lax.top_k(-cdist, nprobe)  # (Q, P)
    ids = jnp.take(row_ids, probe, axis=0).reshape(qf.shape[0], -1)
    if spill is not None and spill.shape[0]:
        # overflow rows (cluster was full when added) are ALWAYS scanned
        ids = jnp.concatenate(
            [ids, jnp.broadcast_to(spill[None], (qf.shape[0],
                                                 spill.shape[0]))], axis=1)
    if mask is not None:
        # tombstoned (removed) rows rank as padding — the live mask is
        # the source of truth, the cluster table is only routing
        live = jnp.take(mask, jnp.minimum(ids, n - 1))
        ids = jnp.where(live, ids, n)
    ids = jnp.sort(ids, axis=1)  # pads (=n) last; ties break by gallery idx
    rows = jnp.take(gallery, jnp.minimum(ids, n - 1),
                    axis=0).astype(jnp.float32)  # (Q, R, D)
    qx = qf[:, None, :]
    exact = (euclidean_distance(qx, rows) if metric == "euclidean"
             else cosine_distance(qx, rows))
    exact = jnp.where(ids >= n, jnp.inf, exact)
    order = jnp.argsort(exact, axis=1, stable=True)[:, :k]
    vals = jnp.take_along_axis(exact, order, axis=1)
    idx = jnp.take_along_axis(ids, order, axis=1)
    return vals, idx


def ivf_search(
    queries: jax.Array,
    index: IVFIndex,
    gallery: jax.Array,
    *,
    nprobe: int = 8,
    k: int = 10,
    row_budget_bytes: int = 1 << 30,
    mask: Optional[jax.Array] = None,
    spill: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k over the probed clusters -> (values, indices).

    Scored distances are EXACT (torch-parity row forms on gathered f32
    rows; ``gallery`` may be bf16-resident — rows cast after the gather,
    like :func:`art_sbir_tpu.ops.quant._rerank`). Queries are chunked so
    the gathered (Qc, nprobe*Cpad, D) candidate block stays under
    ``row_budget_bytes``. Slots past the valid candidates rank at
    ``+inf`` with index ``N`` — callers that can see them (k > candidates
    in the probed clusters) must filter non-finite values, as the serving
    engine does.

    ``mask``: optional (N,) bool of live rows — gathered candidates whose
    mask is False rank as padding (online-index tombstones). ``spill``:
    optional (S,) int32 of row ids scanned unconditionally (pad = N) —
    :class:`OnlineIVF` overflow rows."""
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    nprobe = min(nprobe, index.nlist)
    n = int(gallery.shape[0])
    r = nprobe * index.pad_width + (
        int(spill.shape[0]) if spill is not None else 0)
    k = min(k, r, n)
    d = int(gallery.shape[1])
    qc = max(1, int(row_budget_bytes // max(r * d * 4, 1)))
    nq = queries.shape[0]
    if nq == 0:
        return (jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32))
    outs = [
        _ivf_core(queries[i: i + qc], index.centroids, index.row_ids,
                  gallery, mask, spill, metric=index.metric, k=k,
                  nprobe=nprobe)
        for i in range(0, nq, qc)
    ]
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


@jax.jit
def _set_table(tab: jax.Array, c: jax.Array, j: jax.Array,
               v: jax.Array) -> jax.Array:
    return tab.at[c, j].set(v)


@jax.jit
def _set_spill(arr: jax.Array, j: jax.Array, v: jax.Array) -> jax.Array:
    return arr.at[j].set(v)


@functools.partial(jax.jit, static_argnames=("metric",))
def _assign_online(rows: jax.Array, centroids: jax.Array, *,
                   metric: str) -> jax.Array:
    """Nearest shared centroid per row (spherical for cosine). Module
    level so centroids ride in as an ARGUMENT — closing over them in a
    per-instance jit bakes a multi-MB constant into the HLO (the remote
    compiler rejects large constants, CLAUDE.md) and compiles one copy
    per OnlineIVF instance (one per shard under ShardedOnlineIVF)."""
    rf = jnp.asarray(rows, jnp.float32)
    rx = _l2n(rf) if metric == "cosine" else rf
    d2 = pairwise_sq_l2(rx, centroids, precision="default")
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


class OnlineIVF:
    """Mutable IVF over a fixed-capacity gallery buffer (the serving
    engine's ``capacity=`` mode).

    The TPU way, like the engine's online index: device arrays keep
    STATIC shapes (a (C, Cpad) cluster table + an (S,) spill buffer,
    pad sentinel = buffer capacity), slot bookkeeping lives on host, and
    every mutation is one tiny jitted ``.at[].set`` — adds/removes never
    recompile the search. Semantics:

    * **add**: the row is assigned to its nearest centroid (exact tiny
      matmul; spherical for cosine) and written into a free slot of that
      cluster's row — freed (removed) slots are reused first. A FULL
      cluster overflows into the spill buffer, which every search scans
      unconditionally, so overflow costs bandwidth, never recall.
    * **remove**: the slot is reset to the pad sentinel and recycled.
      The engine's live-row ``mask`` stays the correctness source of
      truth (searches in flight may hold the old table).
    * **repack**: when the spill buffer itself fills, the table is
      rebuilt host-side from the bookkeeping with a wider ``Cpad``
      (``slack`` headroom) — O(live rows) host work + one table upload;
      the next search recompiles once for the new width. Centroids are
      NEVER retrained online; rebuild the index offline when the data
      distribution drifts (``stats()['repacks']`` is the signal).
    """

    def __init__(self, index: IVFIndex, built_over: int, capacity: int,
                 *, spill_capacity: int = 256, slack: float = 1.25):
        if built_over > capacity:
            raise ValueError(f"built_over {built_over} > capacity "
                             f"{capacity}")
        self.metric = index.metric
        self.centroids = index.centroids
        self.capacity = int(capacity)  # pad sentinel for every device id
        self.slack = float(slack)
        c, p = index.row_ids.shape
        table = np.asarray(index.row_ids).copy()
        table[table == built_over] = self.capacity  # remap build-time pads
        self.repacks = 0
        # host bookkeeping: row -> slot, per-cluster free slots, fill
        self._loc: dict = {}
        self._free_t: list = [[] for _ in range(c)]
        self._fill = np.zeros(c, np.int64)
        for ci in range(c):
            for ji in range(p):
                rid = int(table[ci, ji])
                if rid == self.capacity:
                    self._free_t[ci].append(ji)
                else:
                    self._loc[rid] = ("t", ci, ji)
                    self._fill[ci] += 1
        self._free_t = [list(reversed(f)) for f in self._free_t]  # low first
        spill_capacity = max(8, int(spill_capacity))
        self._free_s = list(range(spill_capacity))[::-1]
        self._spill_np = np.full(spill_capacity, self.capacity, np.int32)
        self.row_ids = jnp.asarray(table)
        self.spill = jnp.asarray(self._spill_np)

    def _assign_rows(self, rows: jax.Array) -> jax.Array:
        return _assign_online(rows, self.centroids, metric=self.metric)

    @property
    def nlist(self) -> int:
        return int(self.centroids.shape[0])

    # ------------------------------------------------------------- index ops

    def add(self, row_ids: Sequence[int], rows: jax.Array,
            labels: Optional[Sequence[int]] = None) -> None:
        """Insert buffer rows ``row_ids`` with embeddings ``rows`` (B, D).

        ``rows`` may be PADDED past ``len(row_ids)`` (the engine passes
        its bucketed batch so the assignment matmul compiles once per
        bucket); trailing rows are ignored. ``labels`` (aligned with
        ``row_ids``) skips the assignment dispatch when the caller has
        already assigned the batch — :class:`ShardedOnlineIVF` assigns
        once against the shared centroids instead of once per shard."""
        if len(row_ids) > int(rows.shape[0]):
            raise ValueError(f"{len(row_ids)} ids vs {rows.shape[0]} rows")
        if not row_ids:
            return
        if labels is None:
            labels = np.asarray(self._assign_rows(rows))[: len(row_ids)]
        else:
            if len(labels) < len(row_ids):
                raise ValueError(f"{len(labels)} labels vs "
                                 f"{len(row_ids)} ids")
            labels = np.asarray(labels, np.int32)[: len(row_ids)]
        # Validate the WHOLE batch (range + duplicates, incl. intra-batch)
        # before touching any table/spill state, so a bad id mid-batch
        # can't leave a half-inserted batch behind (atomic for direct
        # library callers; the engine pre-validates slots anyway).
        batch_seen: set = set()
        for rid in row_ids:
            rid = int(rid)
            if rid in self._loc or rid in batch_seen:
                raise ValueError(f"row {rid} already indexed")
            if not 0 <= rid < self.capacity:
                raise ValueError(f"row id {rid} outside [0, {self.capacity})")
            batch_seen.add(rid)
        for rid, ci in zip(row_ids, labels):
            rid, ci = int(rid), int(ci)
            if self._free_t[ci]:
                j = self._free_t[ci].pop()
                self.row_ids = _set_table(self.row_ids, jnp.int32(ci),
                                          jnp.int32(j), jnp.int32(rid))
                self._loc[rid] = ("t", ci, j)
                self._fill[ci] += 1
            else:
                if not self._free_s:
                    self._repack()
                    # post-repack the cluster has >= slack headroom
                    j = self._free_t[ci].pop()
                    self.row_ids = _set_table(self.row_ids, jnp.int32(ci),
                                              jnp.int32(j), jnp.int32(rid))
                    self._loc[rid] = ("t", ci, j)
                    self._fill[ci] += 1
                    continue
                j = self._free_s.pop()
                self.spill = _set_spill(self.spill, jnp.int32(j),
                                        jnp.int32(rid))
                self._spill_np[j] = rid
                self._loc[rid] = ("s", j, ci)
                self._fill[ci] += 1

    def remove(self, row_id: int) -> None:
        """Free the slot serving buffer row ``row_id``."""
        where = self._loc.pop(int(row_id), None)
        if where is None:
            raise KeyError(f"row {row_id} not in the IVF index")
        pad = jnp.int32(self.capacity)
        if where[0] == "t":
            _, ci, j = where
            self.row_ids = _set_table(self.row_ids, jnp.int32(ci),
                                      jnp.int32(j), pad)
            self._free_t[ci].append(j)
        else:
            _, j, ci = where
            self.spill = _set_spill(self.spill, jnp.int32(j), pad)
            self._spill_np[j] = self.capacity
            self._free_s.append(j)
        self._fill[ci] -= 1

    def _repack(self) -> None:
        """Rebuild the table with ``slack`` headroom; drain the spill."""
        c = int(self.centroids.shape[0])
        max_fill = int(self._fill.max()) if c else 0
        pad = max(max_fill + 8, int(self.slack * max_fill))
        pad = max(8, -(-pad // 8) * 8)
        table = np.full((c, pad), self.capacity, np.int32)
        nxt = np.zeros(c, np.int64)
        loc = {}
        for rid, where in sorted(self._loc.items()):  # ids ascend per row
            ci = where[1] if where[0] == "t" else where[2]
            j = int(nxt[ci])
            table[ci, j] = rid
            loc[rid] = ("t", ci, j)
            nxt[ci] += 1
        self._loc = loc
        self._free_t = [list(range(int(nxt[ci]), pad))[::-1]
                        for ci in range(c)]
        self._spill_np[:] = self.capacity
        self._free_s = list(range(len(self._spill_np)))[::-1]
        self.row_ids = jnp.asarray(table)
        self.spill = jnp.asarray(self._spill_np)
        self.repacks += 1

    # ------------------------------------------------------------- queries

    def search(self, queries: jax.Array, gallery: jax.Array, *,
               nprobe: int = 8, k: int = 10,
               mask: Optional[jax.Array] = None,
               ) -> Tuple[jax.Array, jax.Array]:
        return ivf_search(queries, self.as_index(), gallery, nprobe=nprobe,
                          k=k, mask=mask, spill=self.spill)

    def as_index(self) -> IVFIndex:
        return IVFIndex(self.centroids, self.row_ids, self._fill.copy(),
                        self.metric)

    def stats(self) -> dict:
        out = self.as_index().stats()
        out.update(spill_used=int((self._spill_np
                                   != self.capacity).sum()),
                   spill_capacity=len(self._spill_np),
                   repacks=self.repacks, live_rows=len(self._loc))
        return out


def build_ivf_online(
    gallery_buffer: jax.Array,
    n_valid: int,
    n_clusters: Optional[int] = None,
    *,
    metric: str = "euclidean",
    spill_capacity: int = 256,
    slack: float = 1.25,
    **kw,
) -> OnlineIVF:
    """Cluster the first ``n_valid`` (live) rows of a fixed-capacity
    gallery buffer and wrap the result for online mutation. The initial
    live rows must occupy slots ``0..n_valid-1`` (the engine's layout)."""
    if n_valid < 1:
        raise ValueError("online IVF needs >= 1 initial live row to "
                         "cluster (capacity-only cold starts should "
                         "add rows first, then build)")
    capacity = int(gallery_buffer.shape[0])
    idx = build_ivf(gallery_buffer[:n_valid], n_clusters, metric=metric,
                    **kw)
    return OnlineIVF(idx, n_valid, capacity,
                     spill_capacity=spill_capacity, slack=slack)


# --------------------------------------------------------------- sharded IVF

class ShardedIVF(NamedTuple):
    """Row-sharded IVF: one INDEPENDENT local index per gallery shard.

    The TPU-native multi-chip layout (same recipe as
    :func:`art_sbir_tpu.ops.quant.retrieve_quantized_sharded`): shard
    ``s`` owns contiguous gallery rows ``[s*n_local, (s+1)*n_local)`` and
    clusters THEM with local row ids, so the probe's gathers never cross
    chips — each chip probes its own ``nprobe`` nearest local clusters,
    ranks candidates exactly, and only (Q, k) partials ride ICI into the
    (value, index) merge. Per-shard clustering also means ``nprobe``
    clusters are probed on EVERY shard (S*nprobe total), so recall at a
    given nprobe is >= the single-device index's on the same data.

    ``row_ids`` pad sentinel is ``n_local`` (one past a shard's rows).
    ``counts`` is a (S, C) host copy. Leading axes of ``centroids`` /
    ``row_ids`` shard over the mesh's first axis.
    """

    centroids: jax.Array  # (S, C, D) f32
    row_ids: jax.Array    # (S, C, Cpad) int32, pad slots = n_local
    counts: np.ndarray    # (S, C) int64 host copy
    metric: str
    n_local: int

    @property
    def n_shards(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def nlist(self) -> int:
        """Clusters PER SHARD (the nprobe upper bound)."""
        return int(self.centroids.shape[1])

    @property
    def pad_width(self) -> int:
        return int(self.row_ids.shape[2])

    def stats(self) -> dict:
        """Aggregate cluster-balance diagnostics across shards (same
        fields as :meth:`IVFIndex.stats`, min/max over ALL shard-local
        clusters) plus the sharding layout."""
        c = self.counts
        mean = float(c.mean()) if c.size else 0.0
        return {
            "n_shards": self.n_shards,
            "rows_per_shard": self.n_local,
            "nlist": self.nlist,
            "pad_width": self.pad_width,
            "min_count": int(c.min()) if c.size else 0,
            "max_count": int(c.max()) if c.size else 0,
            "mean_count": mean,
            "empty_clusters": int((c == 0).sum()),
            "pad_overhead": (self.pad_width / mean) if mean else 0.0,
        }


def build_ivf_sharded(
    gallery: jax.Array,
    n_shards: int,
    n_clusters: Optional[int] = None,
    *,
    metric: str = "euclidean",
    iters: int = 10,
    seed: int = 0,
    sample: int = 131072,
    chunk: int = 16384,
) -> ShardedIVF:
    """Cluster each contiguous N/n_shards row block into its own local
    IVF (:func:`build_ivf` per block, seed offset by shard so identical
    blocks don't share degenerate inits) and stack the per-shard tables
    padded to one common width. ``n_clusters`` (default ~2*sqrt(n_local))
    is PER SHARD and identical across shards (static shapes under
    shard_map)."""
    n = int(gallery.shape[0])
    if n_shards < 1 or n % n_shards:
        raise ValueError(f"gallery rows ({n}) must be divisible by "
                         f"n_shards ({n_shards}); pad the gallery")
    n_local = n // n_shards
    locals_ = [
        build_ivf(gallery[s * n_local: (s + 1) * n_local], n_clusters,
                  metric=metric, iters=iters, seed=seed + s,
                  sample=sample, chunk=chunk)
        for s in range(n_shards)
    ]
    c = locals_[0].nlist
    pad = max(ix.pad_width for ix in locals_)
    tables = np.full((n_shards, c, pad), n_local, np.int32)
    for s, ix in enumerate(locals_):
        t = np.asarray(ix.row_ids)
        tables[s, :, : t.shape[1]] = t
    return ShardedIVF(
        jnp.stack([ix.centroids for ix in locals_]),
        jnp.asarray(tables),
        np.stack([ix.counts for ix in locals_]),
        metric, n_local)


def save_ivf_sharded(index: ShardedIVF, path) -> None:
    """Persist a sharded index as one ``.npz`` (the sharded analog of
    :func:`save_ivf`; ``n_local`` pins the shard layout so a load onto
    a different mesh size is rejected by the pairing guards)."""
    np.savez_compressed(
        path, centroids=np.asarray(index.centroids),
        row_ids=np.asarray(index.row_ids), counts=index.counts,
        metric=np.asarray(index.metric),
        n_local=np.asarray(index.n_local))


def load_ivf_sharded(path) -> ShardedIVF:
    with np.load(path) as z:
        return ShardedIVF(jnp.asarray(z["centroids"]),
                          jnp.asarray(z["row_ids"]),
                          z["counts"].astype(np.int64),
                          str(z["metric"]), int(z["n_local"]))


@functools.partial(jax.jit, static_argnames=(
    "mesh", "ax", "n_local", "metric", "k", "nprobe"))
def _ivf_sharded_jit(queries, centroids, row_ids, gallery, mask=None,
                     spill=None, *, mesh, ax, n_local, metric, k, nprobe):
    """One program: per-shard probe + exact local rank + (value, index)
    lexsort merge — the same global tie order (ascending gallery index
    within equal values) as the exact path and the single-device probe.

    ``mask``/``spill`` are the online-index extras (sharded live mask,
    per-shard spill buffers with LOCAL ids); ``None`` traces them away.
    """
    from jax.sharding import PartitionSpec as P

    from art_sbir_tpu.ops.sharded import lexsort_topk_merge, resolve_shard_map

    shard_map = resolve_shard_map()
    n_dev = int(mesh.shape[ax])
    n = n_dev * n_local

    args = [queries, centroids, row_ids, gallery]
    specs = [P(), P(ax, None, None), P(ax, None, None), P(ax, None)]
    if mask is not None:
        args.append(mask)
        specs.append(P(ax))
    if spill is not None:
        args.append(spill)
        specs.append(P(ax, None))

    def worker(q, cent_s, tab_s, gal_s, *rest):
        rest = list(rest)
        mask_s = rest.pop(0) if mask is not None else None
        spill_s = rest.pop(0)[0] if spill is not None else None
        vals, ids = _ivf_core(q, cent_s[0], tab_s[0], gal_s, mask_s,
                              spill_s, metric=metric, k=k, nprobe=nprobe)
        off = jax.lax.axis_index(ax) * n_local
        gid = jnp.where(ids >= n_local, n, ids + off)  # pads -> global N
        return vals[None], gid[None]

    pv, pi = shard_map(
        worker, mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(ax), P(ax)),
    )(*args)

    return lexsort_topk_merge(pv, pi, k)


def ivf_search_sharded(
    queries: jax.Array,
    index: ShardedIVF,
    gallery: jax.Array,
    mesh: jax.sharding.Mesh,
    *,
    axis_name: Optional[str] = None,
    nprobe: int = 8,
    k: int = 10,
    row_budget_bytes: int = 1 << 30,
    mask: Optional[jax.Array] = None,
    spill: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-chip approximate top-k -> (values, GLOBAL indices).

    Every shard probes its ``nprobe`` nearest local clusters, scores the
    gathered candidates exactly (f32 torch-parity row forms), and ships
    its (Q, k) partial; the merge lexsorts by (value, global index).
    With ``nprobe == index.nlist`` every shard scans all of its rows, so
    the result is IDENTICAL to the exact path (values, indices, tie
    order) — the regression contract. Slots beyond a shard's candidates
    rank at ``+inf`` with index ``N``; callers that can see them must
    filter non-finite values (the serving engine does).

    ``row_budget_bytes`` bounds PER-DEVICE gather memory (each shard
    gathers (Qc, nprobe*Cpad, D) f32 locally); queries are chunked on
    host above that.

    ``mask``: optional (N,) bool of live GLOBAL rows (row-sharded with
    the gallery) — tombstoned candidates rank as padding. ``spill``:
    optional (S, Sp) int32 of per-shard overflow rows with LOCAL ids
    (pad = ``n_local``), scanned unconditionally by the owning shard —
    :class:`ShardedOnlineIVF` state.
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    ax = axis_name or mesh.axis_names[0]
    n_dev = int(mesh.shape[ax])
    if n_dev != index.n_shards:
        raise ValueError(f"index built for {index.n_shards} shards, mesh "
                         f"'{ax}' axis has {n_dev}")
    n = int(gallery.shape[0])
    if n != n_dev * index.n_local:
        raise ValueError(f"gallery rows ({n}) != n_shards*n_local "
                         f"({n_dev}*{index.n_local})")
    if k > index.n_local:
        raise ValueError(f"k={k} exceeds the per-shard gallery size "
                         f"{index.n_local}; shrink the mesh axis or pad "
                         "the gallery")
    nprobe = min(nprobe, index.nlist)
    r = nprobe * index.pad_width + (
        int(spill.shape[1]) if spill is not None else 0)
    k = min(k, r, n)
    d = int(gallery.shape[1])
    qc = max(1, int(row_budget_bytes // max(r * d * 4, 1)))
    nq = queries.shape[0]
    if nq == 0:
        return (jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32))
    outs = [
        _ivf_sharded_jit(jnp.asarray(queries[i: i + qc], jnp.float32),
                         index.centroids, index.row_ids, gallery, mask,
                         spill, mesh=mesh, ax=ax, n_local=index.n_local,
                         metric=index.metric, k=k, nprobe=nprobe)
        for i in range(0, nq, qc)
    ]
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


# ------------------------------------------------------- sharded online IVF

class ShardedOnlineIVF:
    """Mutable sharded IVF over a row-sharded fixed-capacity buffer (the
    serving engine's ``capacity= + mesh=`` mode).

    Composition of :class:`OnlineIVF` and :class:`ShardedIVF` with one
    deliberate difference from the immutable sharded build: a SINGLE
    centroid set is trained on the initial live rows and shared by every
    shard (shards whose slot range starts empty have nothing to fit a
    local k-means on — and the engine fills capacity slots in global
    order, so trailing shards DO start empty). Each shard keeps its own
    mutable cluster table + spill buffer over ITS slot range
    ``[s*cap_local, (s+1)*cap_local)`` with local ids — a per-shard
    :class:`OnlineIVF` holds the bookkeeping, so an add/remove is O(1)
    host work plus one tiny ``.at[].set`` on the owning shard's table,
    and search gathers never cross chips.

    Because the centroids are shared, probing ``nprobe`` clusters probes
    the SAME clusters on every shard, so (spill aside) the global
    candidate set equals the single-device :class:`OnlineIVF`'s at the
    same nprobe — equality is tested at every nprobe in a spill-free
    churn, and full probe == masked exact path unconditionally
    (``tests/test_ops_ivf.py``).
    """

    def __init__(self, centroids: jax.Array, shards: Sequence[OnlineIVF],
                 cap_local: int, metric: str):
        self.centroids = centroids  # (C, D) shared, never retrained
        self.shards = list(shards)
        self.cap_local = int(cap_local)
        self.metric = metric
        # stacked, shard-replicated centroids for the search program
        s, (c, d) = len(self.shards), centroids.shape
        self._cent_stacked = jnp.broadcast_to(centroids[None], (s, c, d))
        self._snap = None  # invalidated by every mutation

    @property
    def nlist(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def n_shards(self) -> int:
        return len(self.shards)

    @property
    def capacity(self) -> int:
        return self.n_shards * self.cap_local

    # ------------------------------------------------------------- index ops

    def add(self, row_ids: Sequence[int], rows: jax.Array) -> None:
        """Insert buffer rows ``row_ids`` (GLOBAL slot ids) with
        embeddings ``rows`` (B, D); rows may be padded past
        ``len(row_ids)`` (the engine's bucketed batch). Each row is
        routed to the shard owning its slot and assigned to its nearest
        shared centroid there."""
        if len(row_ids) > int(rows.shape[0]):
            raise ValueError(f"{len(row_ids)} ids vs {rows.shape[0]} rows")
        if not row_ids:
            return
        # Validate the WHOLE batch before committing any shard: per-shard
        # commits are sequential, so a bad id routed to a later shard must
        # not leave earlier shards already mutated (atomic batch add).
        batch_seen: set = set()
        for rid in row_ids:
            rid = int(rid)
            if not 0 <= rid < self.capacity:
                raise ValueError(
                    f"row id {rid} outside [0, {self.capacity})")
            s, local = divmod(rid, self.cap_local)
            if local in self.shards[s]._loc or rid in batch_seen:
                raise ValueError(f"row {rid} already indexed")
            batch_seen.add(rid)
        groups: dict = {}
        for pos, rid in enumerate(row_ids):
            groups.setdefault(int(rid) // self.cap_local, []).append(pos)
        # ONE assignment dispatch + host pull for the whole batch: the
        # shards share centroids, so per-shard assigns would pay S
        # identical matmul dispatches (and S compiles of the same tiny
        # program) per add on a tunnel where each costs a full RTT.
        labels = np.asarray(
            self.shards[0]._assign_rows(rows))[: len(row_ids)]
        for s in sorted(groups):
            poss = groups[s]
            self.shards[s].add(
                [int(row_ids[p]) % self.cap_local for p in poss],
                rows, labels=[int(labels[p]) for p in poss])
        self._snap = None

    def remove(self, row_id: int) -> None:
        rid = int(row_id)
        s, local = divmod(rid, self.cap_local)
        if not 0 <= s < self.n_shards:
            raise KeyError(f"row {rid} not in the IVF index")
        try:
            self.shards[s].remove(local)
        except KeyError:
            raise KeyError(f"row {rid} not in the IVF index") from None
        self._snap = None

    # ------------------------------------------------------------- queries

    def snapshot(self) -> Tuple[ShardedIVF, jax.Array]:
        """(immutable :class:`ShardedIVF` view, (S, Sp) spill) for
        :func:`ivf_search_sharded` — cached until the next mutation.
        Per-shard tables repack independently, so widths are re-padded
        to one common ``Cpad`` here (pad sentinel = ``cap_local``)."""
        if self._snap is None:
            pad = max(int(s.row_ids.shape[1]) for s in self.shards)
            tabs = [
                s.row_ids if int(s.row_ids.shape[1]) == pad else jnp.pad(
                    s.row_ids, ((0, 0), (0, pad - int(s.row_ids.shape[1]))),
                    constant_values=self.cap_local)
                for s in self.shards
            ]
            index = ShardedIVF(
                self._cent_stacked, jnp.stack(tabs),
                np.stack([s._fill.copy() for s in self.shards]),
                self.metric, self.cap_local)
            self._snap = (index, jnp.stack([s.spill for s in self.shards]))
        return self._snap

    def search(self, queries: jax.Array, gallery: jax.Array,
               mesh: jax.sharding.Mesh, *, nprobe: int = 8, k: int = 10,
               mask: Optional[jax.Array] = None,
               ) -> Tuple[jax.Array, jax.Array]:
        index, spill = self.snapshot()
        return ivf_search_sharded(queries, index, gallery, mesh,
                                  nprobe=nprobe, k=k, mask=mask,
                                  spill=spill)

    def stats(self) -> dict:
        index, _ = self.snapshot()
        out = index.stats()
        out.update(
            spill_used=sum(int((s._spill_np != s.capacity).sum())
                           for s in self.shards),
            spill_capacity=sum(len(s._spill_np) for s in self.shards),
            repacks=sum(s.repacks for s in self.shards),
            live_rows=sum(len(s._loc) for s in self.shards))
        return out


def build_ivf_sharded_online(
    gallery_buffer: jax.Array,
    n_valid: int,
    n_shards: int,
    n_clusters: Optional[int] = None,
    *,
    metric: str = "euclidean",
    spill_capacity: int = 256,
    slack: float = 1.25,
    **kw,
) -> ShardedOnlineIVF:
    """Cluster the first ``n_valid`` live rows of a row-sharded
    fixed-capacity buffer (one shared k-means — see
    :class:`ShardedOnlineIVF`), then split the cluster table by owning
    shard into per-shard mutable :class:`OnlineIVF` state with local
    slot ids. The initial live rows must occupy slots ``0..n_valid-1``
    (the engine's layout)."""
    capacity = int(gallery_buffer.shape[0])
    if n_shards < 1 or capacity % n_shards:
        raise ValueError(f"buffer capacity ({capacity}) must be divisible "
                         f"by n_shards ({n_shards}); pad the buffer")
    if n_valid < 1:
        raise ValueError("online IVF needs >= 1 initial live row to "
                         "cluster (capacity-only cold starts should "
                         "add rows first, then build)")
    cap_local = capacity // n_shards
    idx = build_ivf(gallery_buffer[:n_valid], n_clusters, metric=metric,
                    **kw)
    c = idx.nlist
    # invert the global table -> per-row labels (initial rows are the
    # contiguous prefix, so a shard's local ids are slot - s*cap_local)
    table = np.asarray(idx.row_ids)
    labels = np.empty(n_valid, np.int32)
    for ci in range(c):
        rows = table[ci][table[ci] < n_valid]
        labels[rows] = ci
    shards = []
    for s in range(n_shards):
        lo = min(s * cap_local, n_valid)
        hi = min(lo + cap_local, n_valid)
        tab_s, counts_s = pack_table(labels[lo:hi], c, cap_local)
        shards.append(OnlineIVF(
            IVFIndex(idx.centroids, jnp.asarray(tab_s), counts_s, metric),
            cap_local, cap_local, spill_capacity=spill_capacity,
            slack=slack))
    return ShardedOnlineIVF(idx.centroids, shards, cap_local, metric)
