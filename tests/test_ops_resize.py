"""Bicubic resize parity with PIL / torchvision semantics."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from art_sbir_tpu.ops import resize as R


def test_resize_matches_pil_float_path(rng):
    """PIL 'F'-mode resize is pure float -> near-exact parity."""
    img = (rng.random((57, 83)) * 255).astype(np.float32)
    ref = np.asarray(Image.fromarray(img, mode="F").resize((32, 24), Image.BICUBIC))
    ours = np.asarray(R.resize_bicubic(jnp.array(img[..., None]), 24, 32))[..., 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_resize_upscale_matches_pil_float(rng):
    img = (rng.random((16, 20)) * 255).astype(np.float32)
    ref = np.asarray(Image.fromarray(img, mode="F").resize((64, 48), Image.BICUBIC))
    ours = np.asarray(R.resize_bicubic(jnp.array(img[..., None]), 48, 64))[..., 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_resize_close_to_pil_uint8_path(rng):
    """PIL's uint8 path quantizes between passes; stay within ~1.5/255."""
    img = (rng.random((100, 140, 3)) * 255).astype(np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC)).astype(
        np.float32
    )
    ours = np.asarray(
        R.resize_bicubic(jnp.array(img, jnp.float32), 224, 224, emulate_uint8=True)
    )
    diff = np.abs(ours - ref)
    # float64 coeffs vs PIL's fixed-point coeffs: at most 1 quantization step
    assert np.percentile(diff, 99.9) <= 1.0, np.percentile(diff, 99.9)
    assert diff.mean() < 0.1, diff.mean()


def test_shortest_side_semantics():
    # torchvision: short side -> size, long side int-truncated
    assert R.shortest_side_size(100, 200, 224) == (224, 448)
    assert R.shortest_side_size(300, 150, 224) == (448, 224)
    assert R.shortest_side_size(224, 224, 224) == (224, 224)


def test_resize_center_crop_shape(rng):
    img = rng.random((1, 300, 180, 3)).astype(np.float32)
    out = R.resize_center_crop(jnp.array(img), 224)
    assert out.shape == (1, 224, 224, 3)


def test_clip_normalize_constants(rng):
    x = rng.random((4, 8, 8, 3)).astype(np.float32)
    out = np.asarray(R.normalize(jnp.array(x)))
    ref = (x - np.array(R.CLIP_MEAN)) / np.array(R.CLIP_STD)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_clip_preprocess_end_to_end(rng):
    """Full uint8 -> normalized tensor pipeline vs the PIL+normalize chain
    the reference composes (torchvision is PIL underneath for this path)."""
    img = (rng.random((120, 90, 3)) * 255).astype(np.uint8)
    pil = np.asarray(
        Image.fromarray(img).resize((224, 224), Image.BICUBIC), dtype=np.float32
    )
    ref = (pil / 255.0 - np.array(R.CLIP_MEAN, np.float32)) / np.array(
        R.CLIP_STD, np.float32
    )
    ours = np.asarray(R.clip_preprocess(jnp.array(img)))
    diff = np.abs(ours - ref)
    # <= 1 uint8 quantization step after normalization
    assert np.percentile(diff, 99.9) < 1.0 / 255.0 / min(R.CLIP_STD) * 1.01
    assert diff.mean() < 0.005
