"""Host-side batch loader: decode + resize into fixed-shape uint8 batches,
with background prefetch; all further math (normalize, augment, rasterize)
runs on device inside the jitted step.

Replaces the reference's torch DataLoader worker processes
(`train.py:154-155`) — on TPU hosts the loader's only jobs are decode and
shaping; keeping batches uint8 quarters the host->HBM transfer vs float32.

Decode backends: the native C++ pipeline (``native/imgpipe.cpp`` via
:mod:`art_sbir_tpu.data.native_loader` — threaded libjpeg/libpng decode +
Pillow-exact resize, bit-identical output) handles whole batches without
the GIL; PIL covers anything the native path reports as unsupported, and
remains the reference implementation (:func:`decode_image`).
"""

from __future__ import annotations

import concurrent.futures
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

from art_sbir_tpu.ops.resize import center_crop_slices, shortest_side_size

# the Kaggle corpus contains one 283-megapixel scan (reference
# `data_preparation.py:489`); keep PIL's decompression-bomb guard above it
Image.MAX_IMAGE_PIXELS = max(Image.MAX_IMAGE_PIXELS or 0, 283_327_980)


def decode_image(
    path: Path | str, size: int, resize_mode: str = "square", grayscale: bool = False
) -> np.ndarray:
    """PIL decode -> uint8 (size, size, 3) (or (size, size, 1) grayscale).

    ``square``: Resize((size, size)) parity with `transformations.py:9-15`.
    ``shortest_crop``: Resize(size) + CenterCrop parity with the model
    transform (reference `models.py:289-292`).
    """
    img = Image.open(path)
    img = img.convert("L" if grayscale else "RGB")
    if resize_mode == "square":
        img = img.resize((size, size), Image.BICUBIC)
    elif resize_mode == "shortest_crop":
        h, w = img.height, img.width
        nh, nw = shortest_side_size(h, w, size)
        img = img.resize((nw, nh), Image.BICUBIC)
        top, left = center_crop_slices(nh, nw, size)
        img = img.crop((left, top, left + size, top + size))
    else:
        raise ValueError(f"unknown resize_mode {resize_mode}")
    arr = np.asarray(img, np.uint8)
    if grayscale:
        arr = arr[..., None]
    return arr


def decode_paths(
    paths: Sequence[Path | str],
    size: int,
    resize_mode: str = "square",
    grayscale: bool = False,
    backend: str = "auto",
) -> np.ndarray:
    """Decode ``paths`` into one (N, size, size, C) uint8 batch.

    ``backend``: ``"native"`` requires the C++ pipeline, ``"pil"`` forces
    the per-image PIL path, ``"auto"`` uses native when the library loads
    and PIL otherwise. Images the native decoder rejects (CMYK, 16-bit,
    corrupt, exotic) are decoded with PIL individually — a PIL failure
    there propagates to the caller (loaders wrap with their corrupt-image
    fallback). Both backends produce bit-identical pixels."""
    if backend not in ("auto", "native", "pil"):
        raise ValueError(f"unknown decode backend {backend}")
    use_native = False
    if backend in ("auto", "native"):
        from art_sbir_tpu.data import native_loader

        use_native = native_loader.available()
        if backend == "native" and not use_native:
            raise native_loader.NativeUnavailable(
                "native decode requested but libimgpipe is unavailable")
    if use_native:
        from art_sbir_tpu.data import native_loader

        batch, failed = native_loader.decode_batch(
            paths, size, resize_mode, grayscale=grayscale)
        for i in failed:
            batch[i] = decode_image(paths[i], size, resize_mode, grayscale)
        return batch
    return np.stack(
        [decode_image(p, size, resize_mode, grayscale) for p in paths])


def decode_bytes(
    data: bytes, size: int, resize_mode: str = "square",
    grayscale: bool = False, backend: str = "auto",
) -> np.ndarray:
    """Decode ONE in-memory image (the serving path's HTTP request
    bodies) -> uint8 (size, size, C). Native C++ when available
    (``decode_resize_batch_mem`` — no temp files, no GIL during decode),
    PIL for anything it rejects; both produce bit-identical pixels
    (tests/test_native_loader.py)."""
    if backend not in ("auto", "native", "pil"):
        raise ValueError(f"unknown decode backend {backend}")
    if backend in ("auto", "native"):
        from art_sbir_tpu.data import native_loader

        use_native = native_loader.available()
        if backend == "native" and not use_native:
            raise native_loader.NativeUnavailable(
                "native decode requested but libimgpipe is unavailable")
        if use_native:
            batch, failed = native_loader.decode_batch_mem(
                [data], size, resize_mode, grayscale=grayscale, n_threads=1)
            if not failed:
                return batch[0]
    import io

    return decode_image(io.BytesIO(data), size, resize_mode, grayscale)


class TripletLoader:
    """Batches a RetrievalCatalog's triplets.

    Yields dicts of host numpy arrays: ``sketch``/``positive``/``negative``
    uint8 (B, S, S, 3) (+ ``label``/``label2`` int32). Train mode shuffles
    per epoch; a background thread builds batch k+1 while the device chews
    batch k. Corrupt images fall back to item 0 with a warning (reference
    `data_preparation.py:517-525`).
    """

    def __init__(
        self,
        catalog,
        batch_size: int = 32,
        image_size: int = 224,
        resize_mode: Optional[str] = None,
        shuffle: Optional[bool] = None,
        seed: int = 0,
        prefetch: bool = True,
        keys=("sketch", "positive", "negative"),
        decode_backend: str = "auto",
    ):
        self.catalog = catalog
        self.batch_size = batch_size
        self.image_size = image_size
        # None -> the catalog family's reference-parity geometry
        # (RetrievalCatalog.resize_mode); explicit value overrides
        self.resize_mode = resize_mode or getattr(catalog, "resize_mode", "square")
        self.shuffle = shuffle if shuffle is not None else (catalog.mode == "train")
        self.rng = random.Random(seed)
        self.prefetch = prefetch
        self.keys = keys
        self.decode_backend = decode_backend

    def __len__(self) -> int:
        return (len(self.catalog) + self.batch_size - 1) // self.batch_size

    def _decode(self, path):
        try:
            return decode_image(path, self.image_size, self.resize_mode)
        except Exception as e:  # corrupt-image fallback (reference behavior)
            print(f"error decoding {path}: {e}", flush=True)
            fallback = self.catalog.item(0)
            key = self.keys[1] if self.keys[1] in fallback else self.keys[0]
            return decode_image(fallback[key], self.image_size, self.resize_mode)

    def _decode_many(self, paths) -> np.ndarray:
        try:
            return decode_paths(paths, self.image_size, self.resize_mode,
                                backend=self.decode_backend)
        except Exception:
            # rare corrupt file: redo this key per-image so the reference's
            # item-0 substitution applies to exactly the broken images
            return np.stack([self._decode(p) for p in paths])

    def _build(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        items = [self.catalog.item(i) for i in indices]
        batch: Dict[str, np.ndarray] = {}
        for key in self.keys:
            if key not in items[0]:
                continue
            batch[key] = self._decode_many([it[key] for it in items])
        for lk in ("label", "label2", "augment"):
            if lk in items[0]:
                batch[lk] = np.asarray([it[lk] for it in items], np.int32)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order: List[int] = list(range(len(self.catalog)))
        if self.shuffle:
            self.rng.shuffle(order)
        chunks = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if not self.prefetch:
            for c in chunks:
                yield self._build(c)
            return
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            future = pool.submit(self._build, chunks[0]) if chunks else None
            for i, _ in enumerate(chunks):
                batch = future.result()
                future = (
                    pool.submit(self._build, chunks[i + 1])
                    if i + 1 < len(chunks)
                    else None
                )
                yield batch


class GalleryLoader:
    """Feeds :func:`art_sbir_tpu.retrieval.embed.embed_batched`: a
    ``(start, count) -> (count, S, S, 3)`` view over dedup-sorted paths."""

    def __init__(self, image_paths, image_size: int = 224,
                 resize_mode: str = "square", decode_backend: str = "auto"):
        self.image_paths = list(image_paths)
        self.image_size = image_size
        self.resize_mode = resize_mode
        self.decode_backend = decode_backend

    def __len__(self):
        return len(self.image_paths)

    def __call__(self, start: int, count: int) -> np.ndarray:
        return decode_paths(
            self.image_paths[start : start + count], self.image_size,
            self.resize_mode, backend=self.decode_backend,
        )
