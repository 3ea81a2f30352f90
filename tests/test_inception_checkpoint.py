"""InceptionV3 shapes + orbax checkpoint/resume roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp


def test_inception_v3_shapes(rng):
    from art_sbir_tpu.models.inception import InceptionV3

    m = InceptionV3(num_classes=7, every_feat=False)
    x = jnp.array(rng.standard_normal((1, 299, 299, 3)).astype(np.float32))
    vars_ = jax.jit(m.init, static_argnames="train")(jax.random.key(0), x,
                                                     train=False)
    logits, aux = jax.jit(m.apply, static_argnames="train")(vars_, x, train=False)
    assert logits.shape == (1, 7)
    assert aux is None  # eval mode

    m2 = InceptionV3(num_classes=7, every_feat=True)
    vars2 = jax.jit(m2.init, static_argnames="train")(jax.random.key(0), x,
                                                      train=False)
    logits, feat = jax.jit(m2.apply, static_argnames="train")(vars2, x, train=False)
    assert feat.shape == (1, 17, 17, 768)  # Mixed_6b map


def test_checkpoint_manager_roundtrip(tmp_path, rng):
    from art_sbir_tpu.core.checkpoint import CheckpointManager

    state = {
        "params": {"w": jnp.array(rng.standard_normal((4, 4)).astype(np.float32))},
        "step": jnp.int32(7),
    }
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    mgr.save(7, state)
    assert mgr.latest_step() == 7
    like = {"params": {"w": jnp.zeros((4, 4))}, "step": jnp.int32(0)}
    restored = mgr.restore(like)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7
    mgr.save(8, state)
    mgr.save(9, state)
    assert mgr.latest_step() == 9
    mgr.close()


def test_save_load_pytree_roundtrip(tmp_path, rng):
    from art_sbir_tpu.core.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.array(rng.standard_normal(5).astype(np.float32)),
            "nested": {"b": jnp.arange(3)}}
    save_pytree(tmp_path / "m", tree)
    out = load_pytree(tmp_path / "m", jax.tree_util.tree_map(jnp.zeros_like, tree))
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(out["nested"]["b"]), np.arange(3))
