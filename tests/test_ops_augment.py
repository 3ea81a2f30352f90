"""Property tests for the batched augmentation pipeline (torchvision is not
available in this image, so parity is semantic: parameter distributions and
geometric behavior, not bit-equality)."""

import numpy as np
import jax
import jax.numpy as jnp

from art_sbir_tpu.ops import augment as A


def _sketch_batch(rng, b=4, s=64):
    """White canvases with a black box sketch."""
    x = np.ones((b, s, s, 3), np.float32)
    x[:, 20:44, 20:44, :] = 0.0
    return jnp.array(x)


def test_identity_affine_matrix():
    m = A.affine_inverse_matrix(
        jnp.float32(0), (jnp.float32(0), jnp.float32(0)), jnp.float32(1),
        (jnp.float32(0), jnp.float32(0)), (31.5, 31.5),
    )
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


def test_warp_identity_preserves_image(rng):
    img = jnp.array(rng.random((32, 32, 3)).astype(np.float32))
    out = A.warp_projective(img, jnp.eye(3), "nearest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    out_b = A.warp_projective(img, jnp.eye(3), "bilinear")
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(img), atol=1e-5)


def test_homography_maps_points():
    src = jnp.array([[0.0, 0.0], [63.0, 0.0], [63.0, 63.0], [0.0, 63.0]])
    dst = jnp.array([[5.0, 3.0], [60.0, 2.0], [58.0, 61.0], [1.0, 59.0]])
    h = A.homography_from_points(src, dst)
    pts = jnp.concatenate([src, jnp.ones((4, 1))], -1)
    mapped = (h @ pts.T).T
    mapped = mapped[:, :2] / mapped[:, 2:3]
    np.testing.assert_allclose(np.asarray(mapped), np.asarray(dst), atol=1e-3)


def test_rotation_moves_content(rng):
    img = _sketch_batch(rng, b=1)[0]
    m = A.affine_inverse_matrix(
        jnp.float32(45.0), (jnp.float32(0), jnp.float32(0)), jnp.float32(1),
        (jnp.float32(0), jnp.float32(0)), (31.5, 31.5),
    )
    out = np.asarray(A.warp_projective(img, m, "nearest"))
    assert not np.allclose(out, np.asarray(img))
    # rotation about center preserves dark content approximately
    assert abs((out < 0.5).mean() - (np.asarray(img) < 0.5).mean()) < 0.05


def test_sketch_augment_deterministic_and_key_dependent(rng):
    batch = _sketch_batch(rng)
    key = jax.random.key(3)
    a1 = np.asarray(A.sketch_augment(batch, key, do_normalize=False))
    a2 = np.asarray(A.sketch_augment(batch, key, do_normalize=False))
    a3 = np.asarray(A.sketch_augment(batch, jax.random.key(4), do_normalize=False))
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, a3)
    assert a1.min() >= 0.0 and a1.max() <= 1.0


def test_sketch_augment_v2_runs(rng):
    batch = _sketch_batch(rng)
    out = np.asarray(A.sketch_augment(batch, jax.random.key(0), version=2,
                                      do_normalize=False))
    assert out.shape == batch.shape
    assert np.isfinite(out).all()


def test_erase_writes_white_rect(rng):
    img = jnp.zeros((64, 64, 3))  # black canvas: erased region is pure white
    out = np.asarray(A.apply_erase(img, jax.random.key(1), p=1.0, scale=(0.05, 0.2)))
    white = out[..., 0] == 1.0
    area = white.mean()
    assert 0.04 <= area <= 0.21, area
    ys, xs = np.nonzero(white)
    # rectangular: bbox fully filled
    assert white[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1].all()


def test_erase_respects_probability_zero(rng):
    img = jnp.array(rng.random((32, 32, 3)).astype(np.float32))
    out = np.asarray(A.apply_erase(img, jax.random.key(1), p=0.0, scale=(0.05, 0.2)))
    np.testing.assert_array_equal(out, np.asarray(img))


def test_paired_hflip_consistency(rng):
    b = 8
    sk = jnp.array(rng.random((b, 16, 16, 3)).astype(np.float32))
    pos = jnp.array(rng.random((b, 16, 16, 3)).astype(np.float32))
    neg = jnp.array(rng.random((b, 16, 16, 3)).astype(np.float32))
    s2, p2, n2 = A.paired_hflip(jax.random.key(0), sk, pos, neg)
    s2, p2 = np.asarray(s2), np.asarray(p2)
    for i in range(b):
        sk_flipped = not np.array_equal(s2[i], np.asarray(sk)[i])
        pos_flipped = not np.array_equal(p2[i], np.asarray(pos)[i])
        assert sk_flipped == pos_flipped  # same coin
