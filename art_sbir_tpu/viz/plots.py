"""Plot library + dispatcher for the results-directory contract.

Covers the reference's reporting surface (reference `visualization.py`):
loss curves (train/test + iteration curves), top-k accuracy bar charts
(single run and comparisons), retrieval-sample grids with a green frame on
the ground-truth image (`visualization.py:196-241`), triplet sheets, and the
``visualize(folder, training_dict, inference_dict)`` entry that dispatches
on the inference-dict shape (`visualization.py:262-273`). Dispatch is by
explicit function table, not ``eval`` (`visualization.py:499`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def loss_curves(
    train_losses: Sequence[float], test_losses: Sequence[float], out: Path,
    title: str = "Triplet loss", ylabel: str = "loss",
) -> Path:
    fig, ax = plt.subplots(figsize=(7, 4.5))
    epochs = np.arange(1, len(train_losses) + 1)
    ax.plot(epochs, train_losses, label="train", marker="o")
    if test_losses:
        ax.plot(np.arange(1, len(test_losses) + 1), test_losses, label="test",
                marker="o")
    ax.set_xlabel("epoch")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def iteration_loss_curves(
    itrain: Sequence[float], itest: Sequence[float], frequency: int, out: Path
) -> Optional[Path]:
    if not itrain:
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    xs = np.arange(1, len(itrain) + 1) * max(frequency, 1)
    ax.plot(xs, itrain, label="train (window)")
    if itest:
        ax.plot(np.arange(1, len(itest) + 1) * max(frequency, 1), itest,
                label="test (mini eval)")
    ax.set_xlabel("iteration")
    ax.set_ylabel("loss")
    ax.set_title("Iteration losses")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def topk_bars(topk_acc: Sequence[float], out: Path, label: str = "") -> Path:
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ks = np.arange(1, len(topk_acc) + 1)
    ax.bar(ks, np.asarray(topk_acc) * 100.0)
    ax.set_xticks(ks)
    ax.set_xlabel("k")
    ax.set_ylabel("top-k accuracy [%]")
    ax.set_title(f"Top-k retrieval accuracy {label}".strip())
    for k, v in zip(ks, topk_acc):
        ax.text(k, v * 100.0, f"{v * 100:.1f}", ha="center", va="bottom",
                fontsize=8)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def compared_topk_bars(results: Dict[str, Sequence[float]], out: Path) -> Path:
    fig, ax = plt.subplots(figsize=(8, 5))
    names = list(results)
    k = len(next(iter(results.values())))
    width = 0.8 / len(names)
    for i, name in enumerate(names):
        xs = np.arange(1, k + 1) + (i - len(names) / 2) * width
        ax.bar(xs, np.asarray(results[name]) * 100.0, width=width, label=name)
    ax.set_xlabel("k")
    ax.set_ylabel("top-k accuracy [%]")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def _load_thumb(path: str, size: int = 128) -> np.ndarray:
    try:
        img = Image.open(path).convert("RGB").resize((size, size), Image.BICUBIC)
        return np.asarray(img)
    except Exception:
        return np.full((size, size, 3), 230, np.uint8)


def retrieval_grid(
    retrieval_samples: List[Dict], out: Path, k: int = 10, thumb: int = 128
) -> Optional[Path]:
    """Rows = queries; col 0 the sketch, cols 1..k the retrieved images;
    the ground-truth match gets a green frame (reference
    `visualization.py:196-241`)."""
    if not retrieval_samples:
        return None
    rows = len(retrieval_samples)
    fig, axes = plt.subplots(rows, k + 1, figsize=(1.3 * (k + 1), 1.4 * rows))
    axes = np.atleast_2d(axes)
    for r, sample in enumerate(retrieval_samples):
        (sketch_path, entries), = sample.items()
        axes[r, 0].imshow(_load_thumb(sketch_path, thumb))
        axes[r, 0].set_title("query", fontsize=7)
        sketch_stem = Path(sketch_path).stem.split("-")[0]
        for c, (img_path, dist) in enumerate(entries[:k], start=1):
            ax = axes[r, c]
            ax.imshow(_load_thumb(img_path, thumb))
            ax.set_title(f"{dist:.2f}", fontsize=6)
            if Path(img_path).stem == sketch_stem:
                for spine in ax.spines.values():
                    spine.set_edgecolor("lime")
                    spine.set_linewidth(4)
        for c in range(k + 1):
            axes[r, c].set_xticks([])
            axes[r, c].set_yticks([])
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def triplet_grid(
    triplets: Sequence, out: Path, titles=("sketch", "positive", "negative")
) -> Path:
    """Rows of (sketch, pos, neg) uint8/float arrays (HWC)."""
    rows = len(triplets)
    fig, axes = plt.subplots(rows, 3, figsize=(4.5, 1.6 * rows))
    axes = np.atleast_2d(axes)
    for r, trip in enumerate(triplets):
        for c, img in enumerate(trip[:3]):
            img = np.asarray(img)
            if img.dtype != np.uint8:
                img = np.clip(img, 0, 1) * 255
                img = img.astype(np.uint8)
            axes[r, c].imshow(img.squeeze(), cmap="gray" if img.shape[-1] == 1 else None)
            if r == 0:
                axes[r, c].set_title(titles[c], fontsize=8)
            axes[r, c].axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return Path(out)


def image_comparison(
    cols: int, *image_rows, filepath: Path | str = Path("comparison.png"),
    frame=None,
) -> Path:
    """Grid of up to N rows of images (reference `visualization.py:277-297`):
    each row is a sequence of HWC arrays/paths; ``frame[r]`` draws a black
    frame around row r's axes."""
    rows = [r for r in image_rows if r is not None]
    frame = frame or [False] * len(rows)
    fig, axes = plt.subplots(len(rows), cols,
                             figsize=(1.4 * cols, 1.5 * len(rows)))
    axes = np.atleast_2d(axes)
    for r, row in enumerate(rows):
        for c in range(cols):
            ax = axes[r, c]
            img = row[c]
            if isinstance(img, (str, Path)):
                img = _load_thumb(str(img))
            img = np.asarray(img)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ax.imshow(img.squeeze(), cmap="gray" if img.ndim == 2 or
                      img.shape[-1] == 1 else None)
            ax.set_xticks([])
            ax.set_yticks([])
            if frame[r]:
                for spine in ax.spines.values():
                    spine.set_linewidth(0.4)
            else:
                ax.axis("off")
    fig.tight_layout()
    fig.savefig(filepath, dpi=120)
    plt.close(fig)
    return Path(filepath)


def visualize(folder: Path | str, training_dict: Dict, inference_dict: Dict) -> None:
    """Write all applicable plots into the run folder, dispatching on dict
    shape like the reference `visualize` (`visualization.py:262-273`)."""
    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    if training_dict.get("train_losses"):
        tl = training_dict["train_losses"]
        if isinstance(tl, dict):  # VAE/GAN multi-loss dicts
            for key, series in tl.items():
                loss_curves(series, training_dict.get("test_losses", {}).get(key, []),
                            folder / f"loss_{key}.png", title=key, ylabel=key)
        else:
            loss_curves(tl, training_dict.get("test_losses", []),
                        folder / "losses.png")
            iteration_loss_curves(
                training_dict.get("itrain_losses", []),
                training_dict.get("itest_losses", []),
                training_dict.get("iteration_loss_frequency", 1),
                folder / "iteration_losses.png",
            )

    def _plot_inference(d: Dict, suffix: str = "") -> None:
        if "topk_acc" in d:
            topk_bars(d["topk_acc"], folder / f"topk_acc{suffix}.png")
        if d.get("retrieval_samples"):
            retrieval_grid(d["retrieval_samples"],
                           folder / f"retrieval_samples{suffix}.png")

    if "drawing_stats" in inference_dict:  # kaggle/mixed two-pass shape
        _plot_inference(inference_dict["drawing_stats"], "_drawings")
        _plot_inference(inference_dict.get("sketch_stats", {}), "_sketches")
    elif inference_dict:
        _plot_inference(inference_dict)
