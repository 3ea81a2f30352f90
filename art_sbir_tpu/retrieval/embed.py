"""Gallery and query embedding.

Replaces the reference's batch-50 python loop with per-image ``.to(device)``
transfers (reference `inference.py:72-92`) by a jitted, batch-sharded encoder
sweep that writes straight into an HBM-resident (N, D) matrix. Under a data
mesh the gallery batch axis is sharded and each chip embeds its shard.

The embedding cache keeps the reference's contract (reference
`utils.py:258-284`): ``data/image_features/<model>_<dataset>_<ts>/`` with
``image_paths.csv`` — but stores features as ``.npy`` (with a CSV
compatibility reader/writer for interop with reference-produced caches).
"""

from __future__ import annotations

import csv
from datetime import datetime
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from art_sbir_tpu.parallel.mesh import batch_sharding, pad_to_multiple

# on the host-return path, accumulated device outputs are drained in groups
# of roughly this many bytes: unbounded accumulation would hold the whole
# (N, D) twice on device at 1M-gallery scale, while per-batch drains
# barrier the dispatch pipeline (one tunnel RTT each). Module-level so the
# suite can shrink it to exercise multi-group draining on small corpora.
DRAIN_GROUP_BYTES = 512 << 20


def embed_batched(
    apply_fn: Callable[[jax.Array], jax.Array],
    images: Callable[[int, int], np.ndarray] | np.ndarray,
    n_images: Optional[int] = None,
    batch_size: int = 256,
    mesh=None,
    feature_dim: Optional[int] = None,
    return_device: bool = False,
    jit_apply: bool = True,
) -> np.ndarray:
    """Embed ``n_images`` through a jitted encoder in fixed-shape batches.

    ``images`` is either an (N, H, W, C) array or a loader callable
    ``(start, count) -> (count, H, W, C)`` (host pipeline). The tail batch is
    padded to keep one compiled program. Returns (N, D) float32 on host —
    or the HBM-resident device array with ``return_device`` (retrieval
    consumes the matrix on device; skipping the host roundtrip saves two
    (N, D) transfers per corpus sweep).

    ``jit_apply=False`` is for callers whose ``apply_fn`` already wraps a
    jitted function with params passed as ARGUMENTS (e.g. the per-epoch
    eval hook): re-jitting such a closure would bake that epoch's params
    into the HLO as constants and recompile the encoder every epoch.
    """
    if not callable(images):
        arr = images
        n_images = arr.shape[0]
        images = lambda s, c: arr[s : s + c]
    assert n_images is not None
    # don't compile a wider program than the corpus needs, but keep the
    # batch a multiple of 32 so gallery and query sweeps of different sizes
    # share one compiled forward
    batch_size = max(32, min(batch_size, pad_to_multiple(n_images, 32)))

    jit_apply = jax.jit(apply_fn) if jit_apply else apply_fn
    feats: List[np.ndarray] = []

    def fetch(start: int) -> Tuple[np.ndarray, int]:
        count = min(batch_size, n_images - start)
        host = np.asarray(images(start, count))
        if count < batch_size:  # pad tail to the compiled shape
            pad = np.repeat(host[:1], batch_size - count, axis=0)
            host = np.concatenate([host, pad])
        return host, count

    # host decode of batch k+1 overlaps the device embedding of batch k —
    # the sweep is host-decode bound on real corpora (the BASELINE north
    # star path), mirroring TripletLoader's prefetch. Outputs stay on
    # device until the end: a per-batch np.asarray would be a full
    # pipeline barrier (plus one tunnel RTT) every iteration; instead the
    # dispatch queue runs ahead and ONE (N, D) transfer drains it.
    import concurrent.futures

    starts = list(range(0, n_images, batch_size))
    host_parts: List[np.ndarray] = []
    group_bytes = DRAIN_GROUP_BYTES  # see module docstring at the constant

    def drain() -> None:
        host_parts.append(np.asarray(jnp.concatenate(feats), np.float32))
        feats.clear()

    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        future = pool.submit(fetch, starts[0]) if starts else None
        for i, _ in enumerate(starts):
            host, count = future.result()
            future = (pool.submit(fetch, starts[i + 1])
                      if i + 1 < len(starts) else None)
            x = jnp.asarray(host)
            if mesh is not None:
                x = jax.device_put(x, batch_sharding(mesh, x.ndim))
            out = jit_apply(x)
            if isinstance(out, (tuple, list)):  # classification models
                out = out[0]
            feats.append(out.astype(jnp.float32))
            if (not return_device
                    and len(feats) * batch_size * out.shape[-1] * 4
                    >= group_bytes):
                drain()
    if not feats and not host_parts:
        empty = np.zeros((0, feature_dim or 0), np.float32)
        return jnp.asarray(empty) if return_device else empty
    if return_device:
        # only the tail batch is padded, so one concat + slice is exact
        return jnp.concatenate(feats)[:n_images]
    if feats:
        drain()
    return np.concatenate(host_parts)[:n_images]


# ------------------------------------------------------------- cache


def save_image_features(
    model_name: str,
    dataset_name: str,
    image_paths: Sequence[Path | str],
    features: np.ndarray,
    root: Path | str = Path("data/image_features"),
    timestamp: Optional[str] = None,
) -> str:
    """Cache layout parity with reference `utils.py:265-284`."""
    ts = timestamp or datetime.now().strftime("%Y-%m-%d_%H-%M")
    folder = Path(root) / f"{model_name}_{dataset_name}_{ts}"
    folder.mkdir(parents=True, exist_ok=True)
    with open(folder / "image_paths.csv", "w") as f:
        csv.writer(f).writerows([[str(p)] for p in image_paths])
    np.save(folder / "image_features.npy", np.asarray(features, np.float32))
    return folder.name


def load_image_features(
    folder_name: str, root: Path | str = Path("data/image_features")
) -> Tuple[List[Path], np.ndarray]:
    """Loads .npy caches and, for interop, reference-style
    ``image_features.csv`` files (reference `utils.py:258-263`)."""
    folder = Path(root) / folder_name
    with open(folder / "image_paths.csv") as f:
        paths = [Path(row[0]) for row in csv.reader(f) if row]
    npy = folder / "image_features.npy"
    if npy.is_file():
        feats = np.load(npy)
    else:
        feats = np.loadtxt(folder / "image_features.csv", delimiter=",", dtype=np.float64)
        feats = np.atleast_2d(feats)
    return paths, feats
