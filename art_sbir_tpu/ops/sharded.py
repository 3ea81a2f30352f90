"""Shared scaffolding for the row-sharded retrieval routes.

Every multi-chip route in this package (exact fused sweep in
``retrieval_pallas.py``, int8 scan in ``quant.py``, IVF probe in
``ivf.py``, IVF-PQ in ``pq.py``) follows the same pattern: a
``shard_map`` worker ranks its own gallery rows and ships a ``(Q, k)``
partial, and the host program merges the ``(S, Q, k)`` partials by
``(value, global index)`` lexsort — ascending-index tie order, matching
the single-device exact path. The merge IS the cross-route tie-order
contract (regression-locked per route in ``tests/``), so it lives here
once instead of four diverging copies.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resolve_shard_map():
    """``jax.shard_map`` (jax >= 0.5 public namespace) with the
    ``jax.experimental.shard_map`` fallback for older jax."""
    try:
        return jax.shard_map
    except AttributeError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map


def lexsort_topk_merge(
    part_vals: jax.Array, part_idx: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k partials -> global (Q, k) top-k.

    ``part_vals``/``part_idx`` are the ``(S, Q, k)`` shard_map outputs
    (values ascending per shard, indices GLOBAL with pads mapped to a
    sentinel that sorts last, e.g. ``+inf``/``N``). The merge lexsorts
    each query's ``S*k`` candidates by (value, index): exact values make
    the result identical to the single-device path including duplicate
    and cross-shard tie order.
    """
    nq = part_vals.shape[1]
    width = part_vals.shape[0] * k
    vals_all = jnp.moveaxis(part_vals, 0, 1).reshape(nq, width)
    idx_all = jnp.moveaxis(part_idx, 0, 1).reshape(nq, width)
    order = jnp.lexsort((idx_all, vals_all), axis=-1)[:, :k]
    return (jnp.take_along_axis(vals_all, order, axis=-1),
            jnp.take_along_axis(idx_all, order, axis=-1))
