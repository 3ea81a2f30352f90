"""Batched, device-side sketch augmentations with jax PRNG.

Replaces the reference's per-sample PIL/torchvision pipeline (reference
`transformations.py:18-55`): RandomPerspective + RandomAffine(scale) applied
together with p=0.5, a second RandomAffine (rotate/translate/scale/shear)
with p=0.5 (V2: p=0.7, wider ranges), then RandomErasing(value=white) after
ToTensor. Parameter *distributions* match torchvision's samplers exactly
(corner displacement for perspective, uniform angle/translate/scale/shear,
log-uniform erase aspect with 10 fitting attempts); bit-identical RNG parity
with torch is impossible and not attempted.

TPU-first: every transform is one batched inverse-warp gather over the whole
batch — per-sample 3x3 projective matrices built from PRNG draws, grid
computed in-kernel, nearest or bilinear sampling with white fill, fused with
normalization downstream. Interpolation modes match torchvision defaults
(perspective: bilinear; affine: nearest).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize


def _deg2rad(x):
    return x * (jnp.pi / 180.0)


# ---------------------------------------------------------------- warps


def warp_projective(
    img: jax.Array, h_inv: jax.Array, method: str = "bilinear", fill: float = 1.0
) -> jax.Array:
    """Inverse-warp one (H, W, C) image by a 3x3 output->input matrix."""
    h, w, _ = img.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ones = jnp.ones_like(gx)
    v = jnp.einsum("ij,jhw->ihw", h_inv, jnp.stack([gx, gy, ones]))
    xi = v[0] / v[2]
    yi = v[1] / v[2]

    if method == "nearest":
        xn = jnp.round(xi).astype(jnp.int32)
        yn = jnp.round(yi).astype(jnp.int32)
        inb = (xn >= 0) & (xn < w) & (yn >= 0) & (yn < h)
        xn = jnp.clip(xn, 0, w - 1)
        yn = jnp.clip(yn, 0, h - 1)
        out = img[yn, xn]
        return jnp.where(inb[..., None], out, fill)

    x0 = jnp.floor(xi)
    y0 = jnp.floor(yi)
    fx = (xi - x0)[..., None]
    fy = (yi - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        p = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inb[..., None], p, fill)

    p00 = tap(y0i, x0i)
    p01 = tap(y0i, x0i + 1)
    p10 = tap(y0i + 1, x0i)
    p11 = tap(y0i + 1, x0i + 1)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def affine_inverse_matrix(
    angle: jax.Array,
    translate: Tuple[jax.Array, jax.Array],
    scale: jax.Array,
    shear: Tuple[jax.Array, jax.Array],
    center: Tuple[float, float],
) -> jax.Array:
    """3x3 output->input matrix for rotate/translate/scale/shear about the
    image center — torchvision `_get_inverse_affine_matrix` math."""
    rot = _deg2rad(angle)
    sx = _deg2rad(shear[0])
    sy = _deg2rad(shear[1])
    cx, cy = center
    tx, ty = translate

    a = jnp.cos(rot - sy) / jnp.cos(sy)
    b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
    c = jnp.sin(rot - sy) / jnp.cos(sy)
    d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)

    # inverse of [[a, b], [c, d]] * scale
    m00, m01 = d / scale, -b / scale
    m10, m11 = -c / scale, a / scale
    # translation: x_in = M (x_out - c - t) + c
    m02 = cx - m00 * (cx + tx) - m01 * (cy + ty)
    m12 = cy - m10 * (cx + tx) - m11 * (cy + ty)
    zeros = jnp.zeros_like(m00)
    ones = jnp.ones_like(m00)
    return jnp.stack(
        [
            jnp.stack([m00, m01, m02]),
            jnp.stack([m10, m11, m12]),
            jnp.stack([zeros, zeros, ones]),
        ]
    )


def homography_from_points(src: jax.Array, dst: jax.Array) -> jax.Array:
    """3x3 H with H @ [src, 1] ~ dst, from 4 point pairs (4, 2) each.

    Coordinates are pre-scaled into ~[0, 1] before the 8x8 solve: XLA's f32
    LU loses ~2e-3 relative accuracy on the raw pixel-scale system, and the
    normalized system is well-conditioned (then H is rescaled back).
    """
    s = jnp.maximum(jnp.max(jnp.abs(jnp.stack([src, dst]))), 1.0)
    src = src / s
    dst = dst / s
    rows = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y]))
        rows.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y]))
    a = jnp.stack(rows)
    b = dst.reshape(-1)
    h8 = jnp.linalg.solve(a, b)
    h = jnp.concatenate([h8, jnp.ones(1)]).reshape(3, 3)
    # undo the normalization: H = D Hn D^{-1} with D = diag(s, s, 1)
    h = h.at[0:2, 2].mul(s)
    h = h.at[2, 0:2].divide(s)
    return h


# ------------------------------------------------- parameter samplers


def perspective_endpoints(
    key: jax.Array, h: int, w: int, distortion_scale: float
) -> Tuple[jax.Array, jax.Array]:
    """torchvision RandomPerspective.get_params: integer corner jitter."""
    half_h, half_w = h // 2, w // 2
    dw = int(distortion_scale * half_w) + 1
    dh = int(distortion_scale * half_h) + 1
    ks = jax.random.split(key, 8)
    ri = lambda k, lo, hi: jax.random.randint(k, (), lo, hi).astype(jnp.float32)
    tl = jnp.stack([ri(ks[0], 0, dw), ri(ks[1], 0, dh)])
    tr = jnp.stack([w - 1 - ri(ks[2], 0, dw), ri(ks[3], 0, dh)])
    br = jnp.stack([w - 1 - ri(ks[4], 0, dw), h - 1 - ri(ks[5], 0, dh)])
    bl = jnp.stack([ri(ks[6], 0, dw), h - 1 - ri(ks[7], 0, dh)])
    start = jnp.array([[0.0, 0.0], [w - 1, 0.0], [w - 1, h - 1], [0.0, h - 1]])
    end = jnp.stack([tl, tr, br, bl])
    return start, end


class AffineRanges(NamedTuple):
    degrees: float = 0.0
    translate: float = 0.0
    scale: Tuple[float, float] = (1.0, 1.0)
    shear: float = 0.0


def affine_params(key: jax.Array, h: int, w: int, r: AffineRanges):
    """torchvision RandomAffine.get_params distributions."""
    ka, kt1, kt2, ks, ksh1, ksh2 = jax.random.split(key, 6)
    u = lambda k, lo, hi: jax.random.uniform(k, (), minval=lo, maxval=hi)
    angle = u(ka, -r.degrees, r.degrees)
    max_dx, max_dy = r.translate * w, r.translate * h
    tx = jnp.round(u(kt1, -max_dx, max_dx))
    ty = jnp.round(u(kt2, -max_dy, max_dy))
    scale = u(ks, r.scale[0], r.scale[1])
    shx = u(ksh1, -r.shear, r.shear)
    shy = u(ksh2, -r.shear, r.shear)
    return angle, (tx, ty), scale, (shx, shy)


def erase_params(
    key: jax.Array, h: int, w: int, scale: Tuple[float, float],
    ratio: Tuple[float, float] = (0.3, 3.3), attempts: int = 10
):
    """torchvision RandomErasing.get_params: 10 attempts, first fit wins.

    Returns (i, j, eh, ew, found). When no attempt fits, found=False and the
    erase is a no-op (torchvision returns the original image).
    """
    keys = jax.random.split(key, attempts)

    def one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        area = h * w
        ea = area * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
        logr = jax.random.uniform(
            k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
        )
        ar = jnp.exp(logr)
        eh = jnp.round(jnp.sqrt(ea * ar)).astype(jnp.int32)
        ew = jnp.round(jnp.sqrt(ea / ar)).astype(jnp.int32)
        ok = (eh < h) & (ew < w) & (eh > 0) & (ew > 0)
        i = jax.random.randint(k3, (), 0, jnp.maximum(h - eh + 1, 1))
        j = jax.random.randint(k4, (), 0, jnp.maximum(w - ew + 1, 1))
        return i, j, eh, ew, ok

    i, j, eh, ew, ok = jax.vmap(one)(keys)
    first = jnp.argmax(ok)
    found = jnp.any(ok)
    return i[first], j[first], eh[first], ew[first], found


def apply_erase(img: jax.Array, key: jax.Array, p: float, scale, ratio=(0.3, 3.3),
                value: float = 1.0) -> jax.Array:
    """One RandomErasing pass on (H, W, C)."""
    kp, kg = jax.random.split(key)
    h, w, _ = img.shape
    i, j, eh, ew, found = erase_params(kg, h, w, scale, ratio)
    gy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (gy >= i) & (gy < i + eh) & (gx >= j) & (gx < j + ew)
    do = (jax.random.uniform(kp, ()) < p) & found
    return jnp.where((inside & do)[..., None], value, img)


# --------------------------------------------------------- pipelines


def _augment_one(img: jax.Array, key: jax.Array, version: int) -> jax.Array:
    """One sketch (H, W, C) in [0, 1], white background -> augmented [0, 1]."""
    h, w, _ = img.shape
    center = ((w - 1) * 0.5, (h - 1) * 0.5)
    if version == 1:
        distortion, p1 = 0.3, 0.5
        aff2 = AffineRanges(degrees=15.0, translate=0.1, scale=(0.9, 1.1), shear=7.0)
        p2 = 0.5
        erases = [(0.5, (0.05, 0.2), (0.3, 3.3))]
    elif version == 2:
        distortion, p1 = 0.35, 0.5
        aff2 = AffineRanges(degrees=15.0, translate=0.3, scale=(0.8, 1.2), shear=10.0)
        p2 = 0.7
        erases = [
            (0.7, (0.05, 0.1), (0.3, 3.3)),
            (0.7, (0.05, 0.1), (0.2, 2.0)),
            (0.7, (0.05, 0.1), (0.4, 4.0)),
        ]
    else:
        raise ValueError(f"unknown augmentation version {version}")

    kp1, kpersp, kscale, kp2, kaff, *kerase = jax.random.split(key, 5 + len(erases))

    # group 1 (p=0.5): perspective (bilinear) then affine-scale (nearest)
    apply1 = jax.random.uniform(kp1, ()) < p1
    start, end = perspective_endpoints(kpersp, h, w, distortion)
    h_inv = homography_from_points(end, start)  # output->input
    out = warp_projective(img, h_inv, "bilinear", fill=1.0)
    angle, tr, sc, sh = affine_params(
        kscale, h, w, AffineRanges(scale=(1.05, 1.3))
    )
    out = warp_projective(
        out, affine_inverse_matrix(angle, tr, sc, sh, center), "nearest", fill=1.0
    )
    img = jnp.where(apply1, out, img)

    # group 2: full affine (nearest)
    apply2 = jax.random.uniform(kp2, ()) < p2
    angle, tr, sc, sh = affine_params(kaff, h, w, aff2)
    out2 = warp_projective(
        img, affine_inverse_matrix(angle, tr, sc, sh, center), "nearest", fill=1.0
    )
    img = jnp.where(apply2, out2, img)

    for ke, (pe, sce, rat) in zip(kerase, erases):
        img = apply_erase(img, ke, pe, sce, rat, value=1.0)
    return img


@functools.partial(jax.jit, static_argnames=("version", "do_normalize"))
def sketch_augment(
    batch: jax.Array, key: jax.Array, version: int = 1, do_normalize: bool = True
) -> jax.Array:
    """Batched sketch augmentation, (B, H, W, C) in [0, 1] -> augmented
    (+ CLIP-normalized), replacing reference `sketch_transformV1/V2`."""
    keys = jax.random.split(key, batch.shape[0])
    out = jax.vmap(lambda im, k: _augment_one(im, k, version))(batch, keys)
    if do_normalize:
        out = normalize(out, CLIP_MEAN, CLIP_STD)
    return out


def paired_hflip(
    key: jax.Array, sketch: jax.Array, pos: jax.Array, neg: jax.Array, p: float = 0.5
):
    """AugmentedKaggle's paired flip: one coin for (sketch, pos), an
    independent coin for neg (reference `data_preparation.py:644-657`)."""
    k1, k2 = jax.random.split(key)
    b = sketch.shape[0]
    f1 = jax.random.uniform(k1, (b,)) < p
    f2 = jax.random.uniform(k2, (b,)) < p
    flip = lambda x, f: jnp.where(f[:, None, None, None], x[:, :, ::-1, :], x)
    return flip(sketch, f1), flip(pos, f1), flip(neg, f2)
