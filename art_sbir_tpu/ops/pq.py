"""Product quantization (IVF-PQ) — approximate serving at extreme capacity.

A beyond-reference scale feature, one tier past `ops/quant.py`'s int8 mode
(the reference's retrieval is a per-query f32 full scan,
`/root/reference/inference.py:43-56`). PQ splits each 1024-d embedding
into ``M`` subspaces and stores one uint8 centroid code per subspace:
**M bytes per row** (default M=64 -> 64x smaller than f32, 16x smaller
than int8), so a serving index over millions of rows is resident in
hundreds of MB of HBM with the full-precision gallery dropped entirely.

The price is an approximation tier beyond IVF's: IVF only *misses*
candidates (scored distances stay exact); PQ also *scores* candidates
approximately (distance to the reconstructed row). The standard repair —
an exact rerank over the top ``rerank_factor * k`` PQ candidates — needs
resident exact rows, which forfeits most of the capacity win; this module
supports both modes and the serving engine defaults to pure-PQ only when
told to drop the rows.

TPU-native design (static shapes, no gathers on the hot scoring path):

* **Train** (:func:`train_pq`): per-subspace k-means, all ``M`` subspaces
  in ONE jitted vmapped program (k-means++ seeding + ``lax.scan`` Lloyd's
  on a row sample) — no per-subspace dispatch loop.
* **Encode** (:func:`encode_pq`): scan-chunked nearest-centroid argmin
  per subspace -> (N, M) uint8.
* **Search** (:func:`ivf_pq_search`): IVF centroid probe (tiny MXU
  matmul) -> candidate CODE gather ((R, M) uint8 — 64 bytes/row instead
  of 4096) -> ADC: per-query (M, 256) look-up table, scored as a
  ``lax.scan`` over subspaces of one-hot(code) x LUT batched matmuls —
  compare/select + MXU, no gather in the scan — -> approximate top-k
  (ties break by gallery index), optional exact rerank when rows are
  provided.

Approximation contract: recall is set by (nprobe, M, rerank) and is
regression-locked in ``tests/test_ops_pq.py``; measured TPU numbers live
in PERF.md ("IVF-PQ").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from art_sbir_tpu.ops.distance import (
    cosine_distance,
    euclidean_distance,
    pairwise_sq_l2,
)
from art_sbir_tpu.ops.ivf import IVFIndex, _kmeanspp_init, _l2n

_METRICS = ("euclidean", "cosine")


class PQCodebook(NamedTuple):
    """Per-subspace centroids. ``metric`` is host metadata: for cosine the
    codebook is trained on (and codes encode) L2-NORMALIZED rows, and the
    ADC table scores dot products instead of squared L2.

    ``residual``: the codebook quantizes IVF RESIDUALS ``x - c(x)``
    (the FAISS IVF-PQ ``by_residual`` design) instead of raw rows — the
    codes then spend their capacity on exactly the within-cluster
    variation ranking needs. Measured essential at scale: on a 600k
    clustered gallery, raw-row PQ collapses to recall@10 ~0.12 (every
    row in a cluster shares a code; ADC cannot rank within the cluster)
    while the residual form recovers it (PERF.md "IVF-PQ").

    ``rotation``: optional (D, D) ORTHOGONAL matrix applied before the
    subspace split (OPQ, Ge et al. 2013): codes quantize ``x @ R``, and
    because R is orthogonal every distance/dot in rotated space equals
    the original-space one, so the exactness contracts are unchanged —
    the rotation only redistributes variance/correlation across
    subspaces so independent per-subspace codebooks waste less capacity.
    Trained by alternating codebook fits with the closed-form Procrustes
    solve (host-side SVD of the (D, D) cross-covariance at build time)."""

    centroids: jax.Array  # (M, K, ds) f32
    metric: str
    residual: bool = False
    rotation: Optional[jax.Array] = None  # (D, D) orthogonal

    @property
    def m(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def k_codes(self) -> int:
        return int(self.centroids.shape[1])

    @property
    def ds(self) -> int:
        return int(self.centroids.shape[2])

    @property
    def dim(self) -> int:
        return self.m * self.ds


def _split(rows: jax.Array, m: int) -> jax.Array:
    """(N, D) -> (M, N, ds)."""
    n, d = rows.shape
    return jnp.transpose(rows.reshape(n, m, d // m), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _train_pq_core(xs: jax.Array, key: jax.Array, *, k: int,
                   iters: int) -> jax.Array:
    """All-subspace k-means in one program: xs (M, Nf, ds) -> (M, k, ds)."""

    def lloyd(x, cent):
        d2 = pairwise_sq_l2(x, cent, precision="default")
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, cent.shape[0], dtype=jnp.float32)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        return jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts, 1.0)[:, None], cent)

    def one(x, sub):
        cent = _kmeanspp_init(x, sub, c=k)

        def body(c, _):
            return lloyd(x, c), None

        cent, _ = jax.lax.scan(body, cent, None, length=iters)
        return cent

    return jax.vmap(one)(xs, jax.random.split(key, xs.shape[0]))


def train_pq(
    rows: jax.Array,
    m: int = 64,
    *,
    k_codes: int = 256,
    metric: str = "euclidean",
    iters: int = 10,
    seed: int = 0,
    sample: int = 65536,
    opq_iters: int = 0,
) -> PQCodebook:
    """Fit per-subspace codebooks on a seeded row sample.

    ``opq_iters > 0`` additionally learns the OPQ rotation by
    alternating codebook refits with the closed-form orthogonal
    Procrustes solve (``R = U V^T`` of ``X^T X_recon``, SVD on host —
    build-time only)."""
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")
    x = jnp.asarray(rows, jnp.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if not 1 <= k_codes <= 256:
        raise ValueError(f"k_codes must be in [1, 256] (uint8 codes), "
                         f"got {k_codes}")
    if n < k_codes:
        raise ValueError(f"need >= k_codes={k_codes} rows to train, got {n}")
    if metric == "cosine":
        x = _l2n(x)
    if n > sample:
        sel = jax.random.choice(jax.random.PRNGKey(seed + 1), n, (sample,),
                                replace=False)
        x = jnp.take(x, sel, axis=0)
    key = jax.random.PRNGKey(seed)
    if not opq_iters:
        cent = _train_pq_core(_split(x, m), key, k=k_codes, iters=iters)
        return PQCodebook(cent, metric)
    rot = jnp.eye(d, dtype=jnp.float32)
    cent = None
    ck = min(16384, int(x.shape[0]))
    for _ in range(opq_iters):
        xr = x @ rot
        cent = _train_pq_core(_split(xr, m), key, k=k_codes, iters=iters)
        rem = (-xr.shape[0]) % ck
        xp = (jnp.concatenate([xr, jnp.zeros((rem, d), xr.dtype)])
              if rem else xr)
        codes = _encode_core(xp, cent, chunk=ck)[: xr.shape[0]]
        recon = pq_decode(codes, PQCodebook(cent, "euclidean"))
        # orthogonal Procrustes: argmin_R ||x R - recon||_F, R = U V^T
        u, _, vt = np.linalg.svd(np.asarray(x.T @ recon), full_matrices=False)
        rot = jnp.asarray(u @ vt, jnp.float32)
    cent = _train_pq_core(_split(x @ rot, m), key, k=k_codes, iters=iters)
    return PQCodebook(cent, metric, False, rot)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _encode_core(rows: jax.Array, cent: jax.Array, *,
                 chunk: int) -> jax.Array:
    n, d = rows.shape
    m = cent.shape[0]
    xr = rows.reshape(-1, chunk, d)

    def body(_, xc):
        xs = _split(xc, m)  # (M, C, ds)
        d2 = jax.vmap(
            lambda a, c: pairwise_sq_l2(a, c, precision="default"))(xs, cent)
        return None, jnp.argmin(d2, axis=2).T.astype(jnp.uint8)  # (C, M)

    _, codes = jax.lax.scan(body, None, xr)
    return codes.reshape(n, m)


def encode_pq(rows: jax.Array, cb: PQCodebook, *,
              chunk: int = 16384) -> jax.Array:
    """Rows -> (N, M) uint8 codes (rows L2-normalized first for cosine)."""
    x = jnp.asarray(rows, jnp.float32)
    n, d = x.shape
    if d != cb.dim:
        raise ValueError(f"rows dim {d} != codebook dim {cb.dim}")
    if cb.metric == "cosine" and not cb.residual:
        # residual codebooks quantize IVF residuals verbatim (the caller
        # — build_ivf_pq — already normalized before subtracting)
        x = _l2n(x)
    if cb.rotation is not None:
        x = x @ cb.rotation  # OPQ: codes live in the rotated space
    chunk = min(chunk, max(n, 1))
    rem = (-n) % chunk
    if rem:
        x = jnp.concatenate([x, jnp.zeros((rem, d), x.dtype)])
    return _encode_core(x, cb.centroids, chunk=chunk)[:n]


def build_ivf_pq(
    gallery: jax.Array,
    index: IVFIndex,
    m: int = 64,
    *,
    k_codes: int = 256,
    iters: int = 10,
    seed: int = 0,
    sample: int = 65536,
    chunk: int = 16384,
    opq_iters: int = 0,
) -> Tuple[PQCodebook, jax.Array]:
    """RESIDUAL IVF-PQ build over an existing IVF index -> (codebook,
    (N, M) uint8 codes). Each row is assigned to its cluster, the PQ
    codebooks are trained (on a seeded sample) over the residuals
    ``x - c(x)`` — plain L2 quantization for both metrics; cosine
    residuals live in the normalized-row space — and every row's
    residual is encoded chunk by chunk (one transient chunk of residuals
    at a time, so the full residual matrix never materializes)."""
    from art_sbir_tpu.ops.ivf import _assign, _pad_rows

    g = jnp.asarray(gallery, jnp.float32)
    n, d = g.shape
    if index.metric == "cosine":
        g = _l2n(g)
    ck = min(chunk, max(n, 1))
    gp, _, _ = _pad_rows(g, ck)
    labels = _assign(gp, index.centroids, chunk=ck)[:n]

    sel = None
    if n > sample:
        sel = jax.random.choice(jax.random.PRNGKey(seed + 1), n, (sample,),
                                replace=False)
        res_s = (jnp.take(g, sel, axis=0)
                 - jnp.take(index.centroids, jnp.take(labels, sel), axis=0))
    else:
        res_s = g - jnp.take(index.centroids, labels, axis=0)
    base = train_pq(res_s, m, k_codes=k_codes, metric="euclidean",
                    iters=iters, seed=seed, sample=sample,
                    opq_iters=opq_iters)
    cb = PQCodebook(base.centroids, index.metric, True, base.rotation)
    codes = np.empty((n, m), np.uint8)
    for i in range(0, n, ck):
        res = (g[i: i + ck]
               - jnp.take(index.centroids, labels[i: i + ck], axis=0))
        codes[i: i + ck] = np.asarray(encode_pq(res, cb, chunk=ck))
    return cb, jnp.asarray(codes)


def build_ivf_pq_sharded(
    gallery: jax.Array,
    index,
    m: int = 64,
    *,
    k_codes: int = 256,
    iters: int = 10,
    seed: int = 0,
    sample: int = 65536,
    chunk: int = 16384,
    opq_iters: int = 0,
) -> Tuple[PQCodebook, jax.Array]:
    """Residual IVF-PQ build over a :class:`art_sbir_tpu.ops.ivf.ShardedIVF`
    -> (ONE shared codebook, (N, M) uint8 codes in global row order).

    Multi-chip analog of :func:`build_ivf_pq`: each row's residual is
    taken against its assigned centroid in ITS OWN shard's local index
    (shard ``s`` owns global rows ``[s*n_local, (s+1)*n_local)``), the
    codebook is trained ONCE on a residual sample pooled across shards
    (so ADC values are comparable across shards at search time), and
    codes are encoded shard block by shard block. The codes array is
    row-sharded with the gallery at search time
    (:func:`ivf_pq_search_sharded`)."""
    from art_sbir_tpu.ops.ivf import ShardedIVF, _assign, _pad_rows

    if not isinstance(index, ShardedIVF):
        raise ValueError("build_ivf_pq_sharded needs a ShardedIVF "
                         "(use build_ivf_pq for single-device indexes)")
    g = jnp.asarray(gallery, jnp.float32)
    n, d = g.shape
    s_count, n_local = index.n_shards, index.n_local
    if n != s_count * n_local:
        raise ValueError(f"gallery rows ({n}) != n_shards*n_local "
                         f"({s_count}*{n_local})")
    if index.metric == "cosine":
        g = _l2n(g)
    ck = min(chunk, max(n_local, 1))

    def _labels(s):
        gs = g[s * n_local: (s + 1) * n_local]
        gp, _, _ = _pad_rows(gs, ck)
        return _assign(gp, index.centroids[s], chunk=ck)[:n_local]

    labels = [_labels(s) for s in range(s_count)]

    def _residual(s, lo, hi):
        return (g[s * n_local + lo: s * n_local + hi]
                - jnp.take(index.centroids[s], labels[s][lo:hi], axis=0))

    # pooled sample: proportional per shard so no shard dominates the fit.
    # Gather the sampled rows/centroids directly (like build_ivf_pq) so
    # the full (n_local, D) residual matrix never materializes — this is
    # the extreme-capacity build path.
    per = max(1, min(sample // s_count, n_local))
    rng = jax.random.PRNGKey(seed + 1)
    parts = []
    for s in range(s_count):
        sel = jax.random.choice(jax.random.fold_in(rng, s), n_local,
                                (per,), replace=False)
        rows_s = jnp.take(g, sel + s * n_local, axis=0)
        cent_s = jnp.take(index.centroids[s],
                          jnp.take(labels[s], sel, axis=0), axis=0)
        parts.append(rows_s - cent_s)
    base = train_pq(jnp.concatenate(parts), m, k_codes=k_codes,
                    metric="euclidean", iters=iters, seed=seed,
                    sample=sample, opq_iters=opq_iters)
    cb = PQCodebook(base.centroids, index.metric, True, base.rotation)
    codes = np.empty((n, m), np.uint8)
    for s in range(s_count):
        for lo in range(0, n_local, ck):
            hi = min(lo + ck, n_local)
            codes[s * n_local + lo: s * n_local + hi] = np.asarray(
                encode_pq(_residual(s, lo, hi), cb, chunk=ck))
    return cb, jnp.asarray(codes)


@functools.partial(jax.jit, static_argnames=(
    "mesh", "ax", "n_local", "metric", "k", "nprobe", "rerank",
    "residual"))
def _ivf_pq_sharded_jit(queries, centroids, row_ids, codes, cb_cent,
                        rows=None, rot=None, *, mesh, ax, n_local, metric,
                        k, nprobe, rerank, residual):
    """One program: per-shard IVF-PQ (probe + ADC scan + optional local
    exact rerank over the shard's own rows) + the same (value, global
    index) lexsort merge as :func:`art_sbir_tpu.ops.ivf._ivf_sharded_jit`
    — full probe + full rerank reproduces the exact path's tie order."""
    from jax.sharding import PartitionSpec as P

    from art_sbir_tpu.ops.sharded import lexsort_topk_merge, resolve_shard_map

    shard_map = resolve_shard_map()
    n_dev = int(mesh.shape[ax])
    n = n_dev * n_local

    args = [queries, centroids, row_ids, codes, cb_cent]
    specs = [P(), P(ax, None, None), P(ax, None, None), P(ax, None), P()]
    if rows is not None:
        args.append(rows)
        specs.append(P(ax, None))
    if rot is not None:
        args.append(rot)
        specs.append(P())

    def worker(q, cent_s, tab_s, codes_s, cbc, *rest):
        rest = list(rest)
        rows_s = rest.pop(0) if rows is not None else None
        rot_r = rest.pop(0) if rot is not None else None
        core = _ivf_pq_residual_core if residual else _ivf_pq_core
        vals, ids = core(q, cent_s[0], tab_s[0], codes_s, cbc, rows_s,
                         rot_r, metric=metric, k=k, nprobe=nprobe,
                         rerank=rerank)
        off = jax.lax.axis_index(ax) * n_local
        gid = jnp.where(ids >= n_local, n, ids + off)  # pads -> global N
        return vals[None], gid[None]

    pv, pi = shard_map(
        worker, mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(ax), P(ax)),
        check_vma=False,  # the ADC scan's zeros-init carry is unvarying
        # while its per-step addend derives from sharded codes — the vma
        # checker rejects the mixed carry (same waiver as ops/quant.py)
    )(*args)

    return lexsort_topk_merge(pv, pi, k)


def ivf_pq_search_sharded(
    queries: jax.Array,
    index,
    codes: jax.Array,
    cb: PQCodebook,
    mesh: jax.sharding.Mesh,
    *,
    axis_name: Optional[str] = None,
    nprobe: int = 8,
    k: int = 10,
    rows: Optional[jax.Array] = None,
    rerank_factor: int = 4,
    row_budget_bytes: int = 1 << 30,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-chip IVF-PQ top-k -> (values, GLOBAL indices).

    Every shard probes its ``nprobe`` nearest local clusters, ADC-scores
    the gathered CODES (M bytes/row — candidate gathers never cross
    chips), optionally reranks its own top candidates exactly against
    its shard of ``rows``, and ships a (Q, k) partial; the merge
    lexsorts by (value, global index). Contracts (mirroring
    :func:`ivf_pq_search` / :func:`art_sbir_tpu.ops.ivf.ivf_search_sharded`):

    * rerank mode with ``nprobe == index.nlist`` and ``rerank_factor*k``
      covering every candidate is IDENTICAL to the exact path — values,
      indices, tie order (per-shard exact scores, same lexsort as the
      sharded exact merge);
    * pure mode (``rows=None``) values are distances to the PQ
      reconstruction, comparable across shards because the codebook is
      shared (:func:`build_ivf_pq_sharded`);
    * pad slots rank at ``+inf`` with index ``N``.

    ``rows``, when given, is the (N, D) gallery row-sharded like the
    codes (local exact rerank, then only (Q, k) partials ride ICI)."""
    from art_sbir_tpu.ops.ivf import ShardedIVF

    if not isinstance(index, ShardedIVF):
        raise ValueError("ivf_pq_search_sharded needs a ShardedIVF")
    if index.metric != cb.metric:
        raise ValueError(f"index metric {index.metric!r} != codebook "
                         f"metric {cb.metric!r}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if rows is not None and rerank_factor < 1:
        raise ValueError("rerank_factor must be >= 1 when rows are given")
    ax = axis_name or mesh.axis_names[0]
    n_dev = int(mesh.shape[ax])
    if n_dev != index.n_shards:
        raise ValueError(f"index built for {index.n_shards} shards, mesh "
                         f"'{ax}' axis has {n_dev}")
    n = int(codes.shape[0])
    if n != n_dev * index.n_local:
        raise ValueError(f"codes rows ({n}) != n_shards*n_local "
                         f"({n_dev}*{index.n_local})")
    if rows is not None and int(rows.shape[0]) != n:
        raise ValueError(f"rows ({rows.shape[0]}) must shard like the "
                         f"codes ({n})")
    if k > index.n_local:
        raise ValueError(f"k={k} exceeds the per-shard gallery size "
                         f"{index.n_local}; shrink the mesh axis or pad "
                         "the gallery")
    nprobe = min(nprobe, index.nlist)
    r = nprobe * index.pad_width
    k = min(k, r, index.n_local)
    # per-device, per-query: candidate codes + one-hot scan step + LUT(s)
    per_q = (r * (cb.m + 4 * cb.k_codes)
             + nprobe * cb.m * cb.k_codes * 4)
    qc = max(1, int(row_budget_bytes // max(per_q, 1)))
    nq = queries.shape[0]
    if nq == 0:
        return (jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32))
    rerank = rerank_factor if rows is not None else 0
    outs = [
        _ivf_pq_sharded_jit(
            jnp.asarray(queries[i: i + qc], jnp.float32), index.centroids,
            index.row_ids, codes, cb.centroids, rows, cb.rotation,
            mesh=mesh, ax=ax, n_local=index.n_local, metric=cb.metric,
            k=k, nprobe=nprobe, rerank=rerank, residual=cb.residual)
        for i in range(0, nq, qc)
    ]
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


def save_pq(cb: PQCodebook, codes: jax.Array, path) -> None:
    """Persist a codebook + codes as one ``.npz`` (pairs with
    :func:`art_sbir_tpu.ops.ivf.save_ivf` for full IVF-PQ restarts)."""
    extra = ({"rotation": np.asarray(cb.rotation)}
             if cb.rotation is not None else {})
    np.savez_compressed(
        path, centroids=np.asarray(cb.centroids),
        metric=np.asarray(cb.metric),
        residual=np.asarray(cb.residual),
        codes=np.asarray(codes), **extra)


def load_pq(path) -> Tuple[PQCodebook, jax.Array]:
    with np.load(path) as z:
        rot = jnp.asarray(z["rotation"]) if "rotation" in z else None
        cb = PQCodebook(jnp.asarray(z["centroids"]), str(z["metric"]),
                        bool(z["residual"]), rot)
        return cb, jnp.asarray(z["codes"])


def pq_decode(codes: jax.Array, cb: PQCodebook) -> jax.Array:
    """Codes -> reconstructed rows in the INPUT space (tests/diagnostics;
    one gather per subspace — NOT the serving path). OPQ codebooks
    un-rotate the reconstruction (R orthogonal: inverse = transpose)."""
    parts = jax.vmap(lambda c, tab: jnp.take(tab, c.astype(jnp.int32),
                                             axis=0),
                     in_axes=(1, 0))(codes, cb.centroids)  # (M, N, ds)
    out = jnp.transpose(parts, (1, 0, 2)).reshape(codes.shape[0], cb.dim)
    return out if cb.rotation is None else out @ cb.rotation.T


def _adc_lut(q: jax.Array, cb: PQCodebook) -> jax.Array:
    """(Q, D) -> (Q, M, K) ADC table. Euclidean: ||q_m - c_mk||^2 (sums to
    the exact squared L2 to the reconstruction). Cosine: -(q_m . c_mk)
    on normalized queries (sums to -cos to the reconstruction; the +1
    shift is rank-irrelevant and added back in the reported values)."""
    qs = _split(q, cb.m)  # (M, Q, ds)
    if cb.metric == "euclidean":
        lut = jax.vmap(
            lambda a, c: pairwise_sq_l2(a, c, precision="default"))(
                qs, cb.centroids)
    else:
        lut = -jax.vmap(
            lambda a, c: jnp.dot(a, c.T,
                                 preferred_element_type=jnp.float32))(
                qs, cb.centroids)
    return jnp.transpose(lut, (1, 0, 2))  # (Q, M, K)


def _pq_score(codes: jax.Array, lut: jax.Array) -> jax.Array:
    """ADC sum without gathers: scan over subspaces, each step scoring
    one-hot(code_m) against LUT[:, m] as a batched (R, K) x (K,) matmul
    (compare/select feeds the MXU; memory stays O(Q*R*K) per step).

    codes (Q, R, M) uint8, lut (Q, M, K) f32 -> (Q, R) f32."""
    k = lut.shape[2]

    def body(acc, inp):
        code_m, lut_m = inp  # (Q, R), (Q, K)
        # f32 select+matmul: the block is tiny (R x 256 per query) and
        # bf16 here costs ~3e-3 relative on the ADC values for nothing
        onehot = (code_m[..., None] == jnp.arange(k, dtype=jnp.int32)
                  ).astype(jnp.float32)
        step = jnp.einsum("qrk,qk->qr", onehot, lut_m,
                          preferred_element_type=jnp.float32)
        return acc + step, None

    init = jnp.zeros(codes.shape[:2], jnp.float32)
    acc, _ = jax.lax.scan(
        body, init,
        (jnp.transpose(codes, (2, 0, 1)).astype(jnp.int32),
         jnp.transpose(lut, (1, 0, 2))))
    return acc


def _pq_finish(
    qf: jax.Array,
    approx: jax.Array,
    ids: jax.Array,
    rows: Optional[jax.Array],
    *,
    metric: str,
    k: int,
    rerank: int,
    n: int,
) -> Tuple[jax.Array, jax.Array]:
    """Shared tail: approximate (Q, R) scores + candidate ids -> top-k,
    either reranked exactly (gallery-index tie order, torch-parity row
    forms — bit-compatible with the exact path when the candidate set
    covers it) or returned in ADC units."""
    if rerank and rows is not None:
        r = min(rerank * k, ids.shape[1])
        order = jnp.argsort(approx, axis=1, stable=True)[:, :r]
        rid = jnp.take_along_axis(ids, order, axis=1)
        rid = jnp.sort(rid, axis=1)  # exact ties break by gallery index
        rrows = jnp.take(rows, jnp.minimum(rid, n - 1),
                         axis=0).astype(jnp.float32)
        qx = qf[:, None, :]  # torch-parity row forms, like ivf.py
        exact = (euclidean_distance(qx, rrows) if metric == "euclidean"
                 else cosine_distance(qx, rrows))
        exact = jnp.where(rid >= n, jnp.inf, exact)
        fo = jnp.argsort(exact, axis=1, stable=True)[:, :k]
        return (jnp.take_along_axis(exact, fo, axis=1),
                jnp.take_along_axis(rid, fo, axis=1))
    order = jnp.argsort(approx, axis=1, stable=True)[:, :k]
    vals = jnp.take_along_axis(approx, order, axis=1)
    if metric == "euclidean":
        vals = jnp.sqrt(jnp.maximum(vals, 0.0))  # match distance units
    else:
        vals = 1.0 + vals  # -cos -> cosine distance
    vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
    return vals, jnp.take_along_axis(ids, order, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "nprobe", "rerank"))
def _ivf_pq_core(
    queries: jax.Array,
    centroids: jax.Array,
    row_ids: jax.Array,
    codes: jax.Array,
    cb_cent: jax.Array,
    rows: Optional[jax.Array],
    rot: Optional[jax.Array] = None,
    *,
    metric: str,
    k: int,
    nprobe: int,
    rerank: int,
) -> Tuple[jax.Array, jax.Array]:
    n = codes.shape[0]
    qf = jnp.asarray(queries, jnp.float32)
    qp = _l2n(qf) if metric == "cosine" else qf
    cdist = (pairwise_sq_l2(qp, centroids, precision="default")
             if metric == "euclidean"
             else -jnp.dot(qp, centroids.T,
                           preferred_element_type=jnp.float32))
    _, probe = jax.lax.top_k(-cdist, nprobe)
    ids = jnp.take(row_ids, probe, axis=0).reshape(qf.shape[0], -1)
    ids = jnp.sort(ids, axis=1)  # pads (=n) last; PQ ties break by index
    cand = jnp.take(codes, jnp.minimum(ids, n - 1), axis=0)  # (Q, R, M) u8
    qa = qp if rot is None else qp @ rot  # OPQ: score in rotated space
    lut = _adc_lut(qa, PQCodebook(cb_cent, metric))
    approx = _pq_score(cand, lut)
    approx = jnp.where(ids >= n, jnp.inf, approx)
    return _pq_finish(qf, approx, ids, rows, metric=metric, k=k,
                      rerank=rerank, n=n)


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "nprobe", "rerank"))
def _ivf_pq_residual_core(
    queries: jax.Array,
    centroids: jax.Array,
    row_ids: jax.Array,
    codes: jax.Array,
    cb_cent: jax.Array,
    rows: Optional[jax.Array],
    rot: Optional[jax.Array] = None,
    *,
    metric: str,
    k: int,
    nprobe: int,
    rerank: int,
) -> Tuple[jax.Array, jax.Array]:
    """Residual (FAISS ``by_residual``) scoring: a candidate's stored
    vector decomposes as ``c_probe + r̂``, exact per candidate because a
    row only ever appears in its own cluster's list. Euclidean builds one
    ADC table per (query, probe) over ``q - c_probe``; cosine reuses one
    residual dot table per query plus the scalar ``q̂·c_probe`` shift.
    Pure-mode ties break in probe-major candidate order (deterministic);
    rerank mode re-sorts candidate ids so exact ties keep the exact
    path's gallery-index order."""
    n = codes.shape[0]
    qn = queries.shape[0]
    qf = jnp.asarray(queries, jnp.float32)
    qp = _l2n(qf) if metric == "cosine" else qf
    cdist = (pairwise_sq_l2(qp, centroids, precision="default")
             if metric == "euclidean"
             else -jnp.dot(qp, centroids.T,
                           preferred_element_type=jnp.float32))
    _, probe = jax.lax.top_k(-cdist, nprobe)      # (Q, P)
    ids = jnp.take(row_ids, probe, axis=0)        # (Q, P, C)
    cand = jnp.take(codes, jnp.minimum(ids, n - 1).reshape(qn * nprobe, -1),
                    axis=0)                       # (Q*P, C, M) u8
    if metric == "euclidean":
        qr = qp[:, None, :] - jnp.take(centroids, probe, axis=0)  # (Q,P,D)
        if rot is not None:
            qr = qr @ rot  # OPQ: residual space is rotated
        lut = _adc_lut(qr.reshape(qn * nprobe, -1),
                       PQCodebook(cb_cent, "euclidean"))  # (Q*P, M, K)
        approx = _pq_score(cand, lut).reshape(qn, nprobe, -1)
    else:
        qa = qp if rot is None else qp @ rot  # dot(q,r) == dot(qR, rR)
        lut = _adc_lut(qa, PQCodebook(cb_cent, "cosine"))  # (Q, M, K) -dot
        lutp = jnp.broadcast_to(
            lut[:, None], (qn, nprobe, *lut.shape[1:])
        ).reshape(qn * nprobe, *lut.shape[1:])
        const = -jnp.einsum("qd,qpd->qp", qp,
                            jnp.take(centroids, probe, axis=0))
        approx = (_pq_score(cand, lutp).reshape(qn, nprobe, -1)
                  + const[:, :, None])
    ids = ids.reshape(qn, -1)
    approx = approx.reshape(qn, -1)
    approx = jnp.where(ids >= n, jnp.inf, approx)
    return _pq_finish(qf, approx, ids, rows, metric=metric, k=k,
                      rerank=rerank, n=n)


def ivf_pq_search(
    queries: jax.Array,
    index: IVFIndex,
    codes: jax.Array,
    cb: PQCodebook,
    *,
    nprobe: int = 8,
    k: int = 10,
    rows: Optional[jax.Array] = None,
    rerank_factor: int = 4,
    row_budget_bytes: int = 1 << 30,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k over the probed clusters -> (values, indices).

    Pure-PQ mode (``rows=None``): values are distances to the PQ
    RECONSTRUCTION (approximate; ~the quantization error of the corpus),
    ordering is the ADC ordering with gallery-index ties. Rerank mode
    (``rows=`` the exact/bf16 gallery): the top ``rerank_factor * k`` ADC
    candidates are re-scored exactly, so values are exact and the only
    error mode is a true neighbor leaving the candidate set. Pad slots
    rank at +inf with index N, like :func:`art_sbir_tpu.ops.ivf.ivf_search`.
    """
    if index.metric != cb.metric:
        raise ValueError(f"index metric {index.metric!r} != codebook "
                         f"metric {cb.metric!r}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if rows is not None and rerank_factor < 1:
        raise ValueError("rerank_factor must be >= 1 when rows are given")
    nprobe = min(nprobe, index.nlist)
    n = int(codes.shape[0])
    r = nprobe * index.pad_width
    k = min(k, r, n)
    # per-query: candidate codes (R, M) + one-hot scan step (R, K) f32
    # + the ADC table(s) (nprobe per query in residual-euclidean mode)
    per_q = (r * (cb.m + 4 * cb.k_codes)
             + nprobe * cb.m * cb.k_codes * 4)
    qc = max(1, int(row_budget_bytes // max(per_q, 1)))
    nq = queries.shape[0]
    if nq == 0:
        return (jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32))
    rerank = rerank_factor if rows is not None else 0
    core = _ivf_pq_residual_core if cb.residual else _ivf_pq_core
    outs = [
        core(queries[i: i + qc], index.centroids, index.row_ids,
             codes, cb.centroids, rows, cb.rotation, metric=cb.metric,
             k=k, nprobe=nprobe, rerank=rerank)
        for i in range(0, nq, qc)
    ]
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))
