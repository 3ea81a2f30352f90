"""Post-training BatchNorm recalibration (VERDICT r3 item 5).

Why this exists. The triplet step normalizes each modality by its OWN
batch statistics (``_forward3`` vmaps the sketch/positive/negative
slices, matching the reference's three sequential forwards, reference
`train.py:27-37`), but inference normalizes BOTH modalities with ONE set
of running statistics — an EMA of a ~1/3-sketch + 2/3-photo mixture in
``_forward3``'s update order. On modality-bimodal data trained from
scratch this opens a measured gap: train-split retrieval MRR 0.93 with
batch-stat embeddings vs 0.20 with running-stat embeddings after the
same steps (PERF.md "learnable corpus"). The reference only escapes it
via pretrained CLIP weights (reference `models.py:275-360` is always
warm-started, `utils.py:132-206`); from-scratch users get no knob there.

This module converts the limitation into a capability:

* :func:`collect_batch_stats` — replace the EMA running statistics with
  the POPULATION statistics of a representative sweep (the mean of
  per-batch moments, the same estimator torchvision's
  ``update_bn``-style recalibration uses). Feeding it a mixed
  sketch+photo sweep fixes the EMA's arbitrary mixture weighting.
* :func:`embed_fn_per_modality` — the stronger knob: recalibrate ONE
  stats set PER MODALITY and embed each modality with its own, which
  reproduces the batch-stat geometry deterministically (population
  moments instead of per-batch noise). Recovers most of the 0.93
  (tests/test_bn_recalibrate.py measures the ladder on a high-contrast
  corpus).

CLI surface: ``cli/train.py --bn_recalibrate {mixed,per_modality}`` and
``cli/inference.py --bn_recalibrate ...`` (re-sweeps the saved model).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Tuple

import jax
import jax.numpy as jnp

from art_sbir_tpu.models.layers import BN_MOMENTUM


def collect_batch_stats(
    apply_fn: Callable,
    params: Any,
    batch_stats: Any,
    batches: Iterable[jax.Array],
) -> Any:
    """Population BN statistics over ``batches`` (each (B, H, W, C)).

    Runs one train-mode forward per batch from the FIXED base
    ``batch_stats`` and inverts flax's EMA update
    (``u = m*s0 + (1-m)*b``) to recover each batch's own moments ``b``,
    then averages them — E[batch mean] is the population mean; E[batch
    var] the standard recalibration variance estimator (within-batch
    variance; unbiased enough at the batch sizes the sweep uses, and
    exactly what a momentum->0 EMA sweep would converge to).

    All accumulation happens on device; one host sync at the end via the
    returned tree's consumers. Raises if ``batches`` is empty.
    """
    m = BN_MOMENTUM

    @jax.jit
    def batch_moments(p, s0, x):
        _, muts = apply_fn({"params": p, "batch_stats": s0}, x,
                           train=True, mutable=["batch_stats"])
        return jax.tree_util.tree_map(
            lambda a, u: (u - a * m) / (1.0 - m), s0, muts["batch_stats"])

    acc = None
    k = 0
    for x in batches:
        b = batch_moments(params, batch_stats, jnp.asarray(x))
        acc = b if acc is None else jax.tree_util.tree_map(jnp.add, acc, b)
        k += 1
    if acc is None:
        raise ValueError("BN recalibration needs at least one batch")
    return jax.tree_util.tree_map(lambda t: t / k, acc)


def recalibrate_mixed(
    apply_fn: Callable,
    params: Any,
    batch_stats: Any,
    sketches: Callable[[], Iterable[jax.Array]],
    photos: Callable[[], Iterable[jax.Array]],
) -> Any:
    """One stats set from an interleaved sketch+photo sweep — drop-in
    replacement running statistics (checkpoint-compatible). Interleaving
    at the BATCH level keeps each batch single-modality (matching how
    train-mode BN saw the data) while the average weighs both modalities
    by their sweep share."""
    def mixed():
        a, b = iter(sketches()), iter(photos())
        while True:
            done = True
            for it in (a, b):
                try:
                    yield next(it)
                    done = False
                except StopIteration:
                    pass
            if done:
                return

    return collect_batch_stats(apply_fn, params, batch_stats, mixed())


def recalibrate_per_modality(
    apply_fn: Callable,
    params: Any,
    batch_stats: Any,
    sketches: Callable[[], Iterable[jax.Array]],
    photos: Callable[[], Iterable[jax.Array]],
) -> Tuple[Any, Any]:
    """(sketch_stats, photo_stats) population moments — embed each
    modality with its own set (see :func:`embed_fn_per_modality`)."""
    return (collect_batch_stats(apply_fn, params, batch_stats, sketches()),
            collect_batch_stats(apply_fn, params, batch_stats, photos()))


def recalibrate_from_catalog(
    apply_fn: Callable,
    params: Any,
    batch_stats: Any,
    catalog,
    *,
    mode: str,
    image_size: int = 224,
    resize_mode: str = "square",
    batch_size: int = 64,
    max_batches: int = 64,
):
    """CLI-facing sweep: decode the TRAIN catalog's sketches and photos
    (the data whose statistics training saw), preprocess with the shared
    gallery pipeline, and recalibrate.

    ``mode='mixed'`` -> one drop-in ``batch_stats``;
    ``mode='per_modality'`` -> ``(sketch_stats, photo_stats)``.

    Partial tail batches are dropped (fixed compiled shape; the sweep is
    statistics, not coverage) and each modality is capped at
    ``max_batches`` batches.
    """
    from art_sbir_tpu.data.loader import GalleryLoader
    from art_sbir_tpu.train.prepare import finish_gallery_batch

    def apply_pre(variables, x, **kw):
        return apply_fn(variables, finish_gallery_batch(x), **kw)

    def sweep(paths):
        loader = GalleryLoader(paths, image_size, resize_mode)
        n_full = min(len(loader) // batch_size, max_batches)

        def gen():
            for i in range(n_full):
                yield loader(i * batch_size, batch_size)

        if n_full == 0:
            raise ValueError(
                f"BN recalibration needs >= {batch_size} images per "
                f"modality; catalog has {len(loader)}")
        return gen

    sk, ph = sweep(catalog.sketch_paths), sweep(catalog.photo_paths)
    if mode == "mixed":
        return recalibrate_mixed(apply_pre, params, batch_stats, sk, ph)
    if mode == "per_modality":
        return recalibrate_per_modality(apply_pre, params, batch_stats,
                                        sk, ph)
    raise ValueError(f"unknown bn_recalibrate mode {mode!r}")


def embed_fn_per_modality(
    apply_fn: Callable,
    params: Any,
    sketch_stats: Any,
    photo_stats: Any,
) -> Tuple[Callable, Callable]:
    """(embed_sketch, embed_photo): ONE jitted eval-mode embedder with
    params/stats passed as ARGUMENTS (two stats sets share the compiled
    program, and nothing large is baked into the HLO as a constant —
    the remote-compiler contract, CLAUDE.md); classification models'
    tuple output reduces to the embedding."""
    @jax.jit
    def embed(p, stats, x):
        out = apply_fn({"params": p, "batch_stats": stats}, x, train=False)
        return out[0] if isinstance(out, (tuple, list)) else out

    return (lambda x: embed(params, sketch_stats, x),
            lambda x: embed(params, photo_stats, x))
