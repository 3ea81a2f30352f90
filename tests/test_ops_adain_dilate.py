"""AdaIN statistics / CORAL vs torch reference math; dilation vs scipy/cv2."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage
import torch

from art_sbir_tpu.ops import adain, dilate


def test_calc_mean_std_matches_torch_unbiased(rng):
    x = rng.standard_normal((2, 7, 9, 5)).astype(np.float32)  # NHWC
    mean, std = adain.calc_mean_std(jnp.array(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref_var = xt.reshape(2, 5, -1).var(dim=2) + 1e-5
    ref_std = ref_var.sqrt().numpy()
    ref_mean = xt.reshape(2, 5, -1).mean(dim=2).numpy()
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, :], ref_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std)[:, 0, 0, :], ref_std, rtol=1e-4, atol=1e-5)


def test_adain_transfers_statistics(rng):
    c = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    s = (rng.standard_normal((1, 8, 8, 4)) * 3 + 5).astype(np.float32)
    out = np.asarray(adain.adaptive_instance_normalization(jnp.array(c), jnp.array(s)))
    s_mean = s.reshape(1, -1, 4).mean(1)
    o_mean = out.reshape(1, -1, 4).mean(1)
    np.testing.assert_allclose(o_mean, s_mean, rtol=1e-3, atol=1e-3)


def test_coral_aligns_channel_stats(rng):
    src = rng.random((16, 16, 3)).astype(np.float32)
    tgt = (rng.random((16, 16, 3)) * 0.5 + 0.25).astype(np.float32)
    out = np.asarray(adain.coral(jnp.array(src), jnp.array(tgt)))
    np.testing.assert_allclose(
        out.reshape(-1, 3).mean(0), tgt.reshape(-1, 3).mean(0), atol=2e-2
    )
    assert out.shape == src.shape


def test_binary_dilate_cross_matches_scipy(rng):
    img = (rng.random((32, 32)) > 0.9).astype(np.float32)
    ours = np.asarray(dilate.binary_dilate_cross(jnp.array(img)))
    ref = scipy.ndimage.binary_dilation(img)
    np.testing.assert_array_equal(ours, ref)


def test_binary_dilate_cross_batched(rng):
    img = (rng.random((3, 16, 16)) > 0.85).astype(np.float32)
    ours = np.asarray(dilate.binary_dilate_cross(jnp.array(img)))
    for i in range(3):
        np.testing.assert_array_equal(ours[i], scipy.ndimage.binary_dilation(img[i]))


def test_dilate_binarize_matches_cv2(rng):
    import cv2

    img = (rng.random((40, 40)) * 255).astype(np.uint8)
    kernel = np.ones((4, 4), np.uint8)
    ref = cv2.dilate(img, kernel)
    ref = np.where(ref > 250, 255, 0).astype(np.uint8)
    ours = np.asarray(dilate.dilate_binarize(jnp.array(img)))
    np.testing.assert_array_equal(ours, ref)
