"""Small components: LR schedules, style helpers, replay buffer, unpaired
catalog, CLIP transformer block, dilate CLI."""

import numpy as np
import jax
import jax.numpy as jnp


def test_linear_decay_schedule():
    from art_sbir_tpu.train.schedules import linear_decay

    s = linear_decay(1.0, n_epochs=2, n_epochs_decay=4, steps_per_epoch=1)
    assert float(s(0)) == 1.0
    assert float(s(2)) == 1.0
    np.testing.assert_allclose(float(s(4)), 0.5)
    assert float(s(6)) == 0.0


def test_step_and_cosine_schedules():
    from art_sbir_tpu.train.schedules import cosine_decay, step_decay

    s = step_decay(1.0, decay_iters=2, gamma=0.1)
    np.testing.assert_allclose([float(s(i)) for i in (0, 1, 2, 4)],
                               [1.0, 1.0, 0.1, 0.01], rtol=1e-6)
    c = cosine_decay(1.0, n_epochs=10)
    assert float(c(0)) == 1.0
    np.testing.assert_allclose(float(c(10)), 0.0, atol=1e-6)


def test_reduce_on_plateau():
    from art_sbir_tpu.train.schedules import ReduceOnPlateau

    sch = ReduceOnPlateau(1.0, factor=0.5, patience=1)
    assert sch.update(1.0) == 1.0
    assert sch.update(1.0) == 1.0  # bad epoch 1
    assert sch.update(1.0) == 0.5  # bad epoch 2 > patience


def test_gram_matrix_matches_torch(rng):
    import torch

    from art_sbir_tpu.ops.style_misc import gram_matrix

    x = rng.standard_normal((2, 4, 5, 3)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.array(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    (b, ch, h, w) = xt.shape
    feat = xt.view(b, ch, w * h)
    ref = feat.bmm(feat.transpose(1, 2)) / (ch * h * w)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_replay_buffer_semantics(rng):
    from art_sbir_tpu.ops.style_misc import ReplayBuffer

    buf = ReplayBuffer(max_size=4, seed=0)
    first = jnp.array(rng.random((4, 2, 2, 1)).astype(np.float32))
    out = buf.push_and_pop(first)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(first))  # filling
    second = jnp.array(rng.random((4, 2, 2, 1)).astype(np.float32))
    out2 = np.asarray(buf.push_and_pop(second))
    assert out2.shape == (4, 2, 2, 1)


def test_unpaired_catalog(tmp_path, rng):
    from PIL import Image

    from art_sbir_tpu.data.unpaired import UnpairedImageCatalog

    for d in ("a/sub", "b"):
        (tmp_path / d).mkdir(parents=True)
    for i in range(3):
        Image.fromarray((rng.random((8, 8, 3)) * 255).astype(np.uint8)).save(
            tmp_path / "a/sub" / f"x{i}.jpg")
        Image.fromarray((rng.random((8, 8, 3)) * 255).astype(np.uint8)).save(
            tmp_path / "b" / f"y{i}.png")
    cat = UnpairedImageCatalog(tmp_path / "a", tmp_path / "b", mode="train")
    assert len(cat) == 3
    it = cat.item(0)
    assert "image2" in it and it["image2"].parent.name == "b"


def test_residual_attention_block(rng):
    from art_sbir_tpu.models.transformer import ResidualAttentionBlock, quick_gelu

    x = jnp.array(rng.standard_normal((2, 7, 16)).astype(np.float32))
    blk = ResidualAttentionBlock(d_model=16, n_head=4)
    vars_ = blk.init(jax.random.key(0), x)
    out = blk.apply(vars_, x)
    assert out.shape == x.shape
    # quickgelu sanity vs formula
    v = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(quick_gelu(v)),
        np.asarray(v) * (1 / (1 + np.exp(-1.702 * np.asarray(v)))), rtol=1e-6,
    )


def test_global_generator2(rng):
    from art_sbir_tpu.models.drawing import GlobalGenerator2

    g = GlobalGenerator2(output_nc=3, ngf=4, n_blocks=1)
    x = jnp.array(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    vars_ = jax.jit(g.init, static_argnames="train")(jax.random.key(0), x, train=False)
    out = jax.jit(g.apply, static_argnames="train")(vars_, x, train=False)
    # 3 transposed 'downs' (x2 each) + 3 ups (x2 each) = x64 spatial
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(np.asarray(out)).all()


def test_dilate_cli(tmp_path, rng):
    from PIL import Image

    from art_sbir_tpu.cli.transformations import dilate_folder

    src = tmp_path / "opensketch_drawings"
    src.mkdir()
    # cv2-style grayscale dilation grows BRIGHT regions: white strokes on a
    # dark canvas get thicker (inverted line-drawing outputs)
    arr = np.zeros((32, 32), np.uint8)
    arr[10:20, 15] = 255
    Image.fromarray(arr, mode="L").save(src / "a.png")
    out_dir = dilate_folder(src)
    out = np.asarray(Image.open(out_dir / "a.png"))
    assert set(np.unique(out)) <= {0, 255}
    assert (out == 255).sum() > (arr > 250).sum()  # stroke thickened
