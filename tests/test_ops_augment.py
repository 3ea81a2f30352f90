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


# ------------------------------------------------------------------
# Distribution-level oracles (VERDICT r2 item 4): plain-numpy
# reimplementations of torchvision's documented parameter samplers
# (RandomPerspective.get_params, RandomAffine.get_params,
# RandomErasing.get_params — reference transformations.py:18-55), compared
# against the jax samplers at KS / moment level on seeded draws.
# Bit-identical RNG parity with torch is impossible; equality of LAWS is
# what the module docstring claims and what these tests discharge.

from scipy import stats as _st

_N = 4000


def _jax_draws(fn, n=_N, seed=0):
    keys = jax.random.split(jax.random.key(seed), n)
    return jax.vmap(fn)(keys)


def test_perspective_endpoint_distribution():
    """Each corner displacement is discrete-uniform on {0..int(d*half)}
    (torchvision RandomPerspective.get_params)."""
    h = w = 64
    d = 0.3
    dw = int(d * (w // 2))  # inclusive max displacement = 9
    dh = int(d * (h // 2))
    start, end = _jax_draws(lambda k: A.perspective_endpoints(k, h, w, d))
    end = np.asarray(end)  # (N, 4, 2) = tl, tr, br, bl
    np.testing.assert_array_equal(np.asarray(start)[0],
                                  [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]])
    # recover the raw displacement u for all 8 coordinates
    disp = np.stack([
        end[:, 0, 0], end[:, 0, 1],                 # tl: x, y
        (w - 1) - end[:, 1, 0], end[:, 1, 1],       # tr
        (w - 1) - end[:, 2, 0], (h - 1) - end[:, 2, 1],  # br
        end[:, 3, 0], (h - 1) - end[:, 3, 1],       # bl
    ])
    for row, dmax in zip(disp, [dw, dh] * 4):
        vals = row.astype(int)
        assert vals.min() >= 0 and vals.max() <= dmax
        counts = np.bincount(vals, minlength=dmax + 1)
        freq = counts / len(vals)
        # discrete uniform: every cell populated, freq within 4 sigma
        sigma = np.sqrt((1 / (dmax + 1)) * (1 - 1 / (dmax + 1)) / len(vals))
        assert (counts > 0).all()
        assert np.abs(freq - 1 / (dmax + 1)).max() < 4.5 * sigma, freq


def test_affine_params_distribution():
    """angle/scale/shear ~ U(ranges); translate = round(U(-max_d, max_d))
    (torchvision RandomAffine.get_params)."""
    h = w = 224
    r = A.AffineRanges(degrees=15.0, translate=0.1, scale=(0.9, 1.1), shear=7.0)
    angle, (tx, ty), scale, (shx, shy) = _jax_draws(
        lambda k: A.affine_params(k, h, w, r))
    rng = np.random.default_rng(7)
    checks = [
        (np.asarray(angle), rng.uniform(-15, 15, _N)),
        (np.asarray(scale), rng.uniform(0.9, 1.1, _N)),
        (np.asarray(shx), rng.uniform(-7, 7, _N)),
        (np.asarray(shy), rng.uniform(-7, 7, _N)),
        (np.asarray(tx), np.round(rng.uniform(-0.1 * w, 0.1 * w, _N))),
        (np.asarray(ty), np.round(rng.uniform(-0.1 * h, 0.1 * h, _N))),
    ]
    for ours, oracle in checks:
        ks = _st.ks_2samp(ours, oracle)
        assert ks.statistic < 0.05, (ks.statistic, ours[:5], oracle[:5])
    # translations are integral
    assert np.all(np.asarray(tx) == np.round(np.asarray(tx)))


def _erase_oracle(rng, h, w, scale, ratio, n=_N, attempts=10):
    """torchvision RandomErasing.get_params, documented algorithm."""
    out = []
    area = h * w
    logr = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(n):
        rec = (0, 0, 0, 0, False)
        for _a in range(attempts):
            ea = area * rng.uniform(scale[0], scale[1])
            ar = np.exp(rng.uniform(*logr))
            eh = int(round(np.sqrt(ea * ar)))
            ew = int(round(np.sqrt(ea / ar)))
            if not (eh < h and ew < w and eh > 0 and ew > 0):
                continue
            i = rng.integers(0, h - eh + 1)
            j = rng.integers(0, w - ew + 1)
            rec = (i, j, eh, ew, True)
            break
        out.append(rec)
    return np.array(out, dtype=float)


def test_erase_params_distribution():
    """(i, j, eh, ew, found) matches the numpy oracle of torchvision's
    10-attempt loop at KS level, for an easy and a rejection-heavy regime."""
    for h, w, scale, ratio in [
        (224, 224, (0.05, 0.2), (0.3, 3.3)),   # V1 regime: ~always found
        (24, 24, (0.05, 0.2), (0.05, 20.0)),    # extreme aspects: rejections
    ]:
        i, j, eh, ew, found = _jax_draws(
            lambda k: A.erase_params(k, h, w, scale, ratio), seed=hash((h, w)) % 2**31)
        ours = np.stack([np.asarray(v, float) for v in (i, j, eh, ew)], 1)
        ok = np.asarray(found)
        oracle = _erase_oracle(np.random.default_rng(11), h, w, scale, ratio)
        assert abs(ok.mean() - oracle[:, 4].mean()) < 0.03
        for col in range(4):
            ks = _st.ks_2samp(ours[ok][:, col], oracle[oracle[:, 4] > 0][:, col])
            assert ks.statistic < 0.06, (h, col, ks.statistic)
        # erased area fraction within the configured range when found
        # (slack covers the +-0.5 px rounding of eh/ew, which at h=24 moves
        # the area fraction by up to ~(eh+ew)/2/(h*w) ~ 30%)
        frac = ours[ok][:, 2] * ours[ok][:, 3] / (h * w)
        assert frac.min() > scale[0] * 0.6 and frac.max() < scale[1] * 1.5
