"""Multi-chip path on the virtual 8-device CPU mesh: DP training step with
sharded batch + retrieval with a row-sharded gallery (SURVEY.md §2.9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from art_sbir_tpu.parallel import (
    batch_sharding,
    data_mesh,
    gallery_sharding,
    replicated,
    shard_batch,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_places_dim0():
    mesh = data_mesh(8)
    x = np.zeros((16, 4), np.float32)
    out = shard_batch(mesh, {"a": x})
    shard_shapes = [s.data.shape for s in out["a"].addressable_shards]
    assert all(s == (2, 4) for s in shard_shapes)


def test_dp_train_step_matches_single_device(rng):
    """Gradient all-reduce over the mesh == single-device computation."""
    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.train.losses import TripletLossConfig
    from art_sbir_tpu.train.triplet import create_train_state, make_train_step

    import optax

    model = ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=16, heads=4, input_resolution=32, width=8
    )
    # SGD so the param delta IS the gradient (Adam's first step is sign-like
    # and amplifies fp-reassociation noise on near-zero grads to +-lr)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               tx=optax.sgd(1.0))
    # donate=False: the same initial state is run through two branches
    step = make_train_step(TripletLossConfig(), donate=False)

    mk = lambda: rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    host_batch = {"sketch": mk(), "positive": mk(), "negative": mk()}

    # single device
    s1, l1 = step(state, {k: jnp.asarray(v) for k, v in host_batch.items()})

    # 8-device data parallel
    mesh = data_mesh(8)
    state_r = jax.device_put(state, replicated(mesh))
    batch_s = shard_batch(mesh, host_batch)
    s8, l8 = step(state_r, batch_s)

    np.testing.assert_allclose(float(l1["loss"]), float(l8["loss"]), rtol=1e-5)
    # elementwise comparison is too strict: BN bias grads are heavily
    # cancelling sums whose fp reassociation differs across partitionings.
    # compare the whole gradient vector: relative L2 error + direction.
    g1 = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(s1.params)])
    g8 = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(s8.params)])
    rel_l2 = np.linalg.norm(g1 - g8) / np.linalg.norm(g1)
    cos = np.dot(g1, g8) / (np.linalg.norm(g1) * np.linalg.norm(g8))
    assert rel_l2 < 1e-2, rel_l2
    assert cos > 0.9999, cos


def test_sharded_gallery_retrieval_matches_replicated(rng):
    from art_sbir_tpu.ops.distance import retrieve

    mesh = data_mesh(8)
    gal = rng.standard_normal((64, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    pos = np.array([3, 10, 40, 63], np.int32)

    r0, v0, i0 = retrieve(jnp.asarray(q), jnp.asarray(gal), jnp.asarray(pos), k=5)

    gal_s = jax.device_put(jnp.asarray(gal), gallery_sharding(mesh))
    q_r = jax.device_put(jnp.asarray(q), replicated(mesh))
    p_r = jax.device_put(jnp.asarray(pos), replicated(mesh))
    rep = replicated(mesh)
    r1, v1, i1 = jax.jit(
        lambda qq, gg, pp: retrieve(qq, gg, pp, k=5), out_shardings=(rep, rep, rep)
    )(q_r, gal_s, p_r)

    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_embed_batched_under_mesh(rng):
    """Gallery embedding with the batch axis sharded over the mesh."""
    from art_sbir_tpu.retrieval.embed import embed_batched

    mesh = data_mesh(8)

    def apply_fn(x):
        return x.mean(axis=(1, 2))

    imgs = rng.standard_normal((40, 8, 8, 3)).astype(np.float32)
    feats = embed_batched(apply_fn, imgs, batch_size=32, mesh=mesh)
    assert feats.shape == (40, 3)
    np.testing.assert_allclose(feats, imgs.mean(axis=(1, 2)), rtol=1e-5)


def test_train_cli_dp_matches_single_device(tmp_path, monkeypatch):
    """VERDICT #6 done-criterion: the e2e train CLI over the 8-device CPU
    mesh produces the same losses and retrieval metrics as single-device.
    16 train triplets / batch 8 -> every batch shards evenly."""
    import json

    from art_sbir_tpu.data.synthetic import make_synthetic_sketchy

    root = make_synthetic_sketchy(tmp_path / "sketchy")
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.train import main

    def run(n_devices, tag):
        out = main([
            "-e", "1", "-b", "8", "-d", "SketchyV1",
            "--model_type", "ModifiedResNet",
            "--data_root", str(root), "--image_size", "64", "--inference",
            "--results_root", str(tmp_path / f"results_{tag}"),
            "--n_devices", str(n_devices), "--seed", "3",
        ])
        training = json.loads((out / "training.json").read_text())
        inference = json.loads((out / "inference.json").read_text())
        params = json.loads((out / "training_params.json").read_text())
        return training, inference, params

    t1, i1, p1 = run(1, "single")
    t8, i8, p8 = run(8, "dp")
    assert p1["n_devices"] == 1 and p8["n_devices"] == 8
    np.testing.assert_allclose(t1["train_losses"], t8["train_losses"],
                               rtol=2e-3)
    np.testing.assert_allclose(t1["test_losses"], t8["test_losses"],
                               rtol=2e-3)
    # retrieval metrics: ranks are integers -> exact; MRR to fp tolerance
    assert i1["topk_acc"] == i8["topk_acc"]
    np.testing.assert_allclose(i1["mean_reciprocal_rank"],
                               i8["mean_reciprocal_rank"], rtol=1e-6)


def test_multihost_helpers_single_process():
    """Multi-host helpers degrade to single-process semantics: initialize is
    a no-op, the global mesh spans all (virtual) devices, and global_batch
    equals shard_batch (process_count == 1)."""
    import jax
    import numpy as np

    from art_sbir_tpu.parallel import multihost, shard_batch

    multihost.initialize()  # no coordinator configured -> no-op
    assert jax.process_count() == 1

    mesh = multihost.global_data_mesh()
    assert mesh.devices.size == len(jax.devices())

    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1),
             "y": np.arange(16, dtype=np.int32)}
    sl = multihost.local_batch_slice(batch)
    np.testing.assert_array_equal(sl["x"], batch["x"])  # whole batch local

    g = multihost.global_batch(mesh, sl)
    ref = shard_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(g["x"]), np.asarray(ref["x"]))
    assert g["x"].sharding == ref["x"].sharding

    assert multihost.process_shard(8) == slice(0, 8)


def test_pix2pix_dp_matches_single_device(rng):
    """GAN data parallelism: a Pix2Pix train step over the 8-device mesh
    (states replicated, batch dim-0-sharded, GSPMD all-reduces both
    gradient sets AND the BatchNorm batch stats) produces the same losses
    and updated parameters as the single-device step."""
    from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig

    cfg = Pix2PixConfig(image_size=32, ngf=8, ndf=8)
    batch = {
        "A": rng.random((8, 32, 32, 3)).astype(np.float32),
        "B": rng.random((8, 32, 32, 1)).astype(np.float32),
    }

    single = Pix2Pix(cfg, jax.random.key(0))
    dp = Pix2Pix(cfg, jax.random.key(0), mesh=data_mesh(8))

    for step_key in (1, 2):
        l1 = single.train_step(batch, jax.random.key(step_key))
        l2 = dp.train_step(batch, jax.random.key(step_key))
        for k in l1:
            assert float(l2[k]) == pytest.approx(float(l1[k]), rel=1e-5,
                                                 abs=1e-6), k

    # params: sharded reductions (grad + BN batch-stat all-reduces) change
    # f32 accumulation order; Adam's per-param normalization turns ~1-ulp
    # gradient noise into up to ~2*lr of update drift. Bound by a few
    # Adam-step magnitudes (lr=1e-5, 2 steps).
    for a, b in zip(jax.tree_util.tree_leaves((single.g.params,
                                               single.d.params,
                                               single.g.batch_stats)),
                    jax.tree_util.tree_leaves((dp.g.params, dp.d.params,
                                               dp.g.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)

    # ragged batch (5 rows over 8 devices) falls back to replicated
    # placement — still exact
    ragged = {k: v[:5] for k, v in batch.items()}
    l1 = single.eval_losses(ragged)
    l2 = dp.eval_losses(ragged)
    for k in l1:
        assert float(l2[k]) == pytest.approx(float(l1[k]), rel=1e-5), k


def test_vae_dp_matches_single_device(rng):
    """VAE data parallelism: the Photo2Sketch train step over the 8-device
    mesh equals the single-device step (losses tight; reparameterization
    noise is generated for the LOGICAL batch shape, so sharding does not
    change the sample)."""
    from art_sbir_tpu.train.vae import VAEConfig, VAETrainer

    cfg = VAEConfig(z_size=8, dec_rnn_size=16, num_mixture=3, max_seq_len=10,
                    image_size=32)
    batch = {
        "photo": rng.random((8, 32, 32, 3)).astype(np.float32),
        "sketch_vector": rng.random((8, 10, 5)).astype(np.float32),
    }
    single = VAETrainer(cfg, jax.random.key(0))
    dp = VAETrainer(cfg, jax.random.key(0), mesh=data_mesh(8))
    for step_key in (1, 2):
        l1 = single.train_step(batch, jax.random.key(step_key))
        l2 = dp.train_step(batch, jax.random.key(step_key))
        for k in l1:
            assert float(l2[k]) == pytest.approx(float(l1[k]), rel=1e-5,
                                                 abs=1e-6), k
    # ragged eval batch -> replicated fallback, still exact
    ragged = {k: v[:5] for k, v in batch.items()}
    l1 = single.eval_step(ragged, jax.random.key(9))
    l2 = dp.eval_step(ragged, jax.random.key(9))
    for k in l1:
        assert float(l2[k]) == pytest.approx(float(l1[k]), rel=1e-5), k


# ------------------------------------------------------- tensor parallel

def test_tp_spec_trailing_dim_rule():
    """The uniform rule: shard the trailing dim iff divisible by the model
    axis; scalars and odd-sized leaves replicate."""
    from jax.sharding import PartitionSpec as P

    from art_sbir_tpu.parallel.tensor import tp_spec

    k = np.zeros((3, 3, 4, 8))  # conv kernel, cout=8
    assert tp_spec(k, 4) == P(None, None, None, "model")
    assert tp_spec(np.zeros((8,)), 4) == P("model")  # BN channel vector
    assert tp_spec(np.zeros((3, 3, 4, 6)), 4) == P()  # 6 % 4 != 0
    assert tp_spec(np.zeros(()), 4) == P()  # step / Adam count


def test_tp_encoder_matches_single_device(rng):
    """Channel-sharded (tensor-parallel) inference over a 2x4 (data, model)
    mesh is numerically the single-device forward; GSPMD inserts every
    collective from the weight NamedShardings alone."""
    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.parallel.tensor import mesh_2d, tp_place, tp_shard_tree
    from jax.sharding import PartitionSpec as P

    model = ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=16, heads=4, input_resolution=32, width=8
    )
    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.asarray(x), train=False
    )
    ref = np.asarray(
        jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
            variables, jnp.asarray(x)
        )
    )

    mesh = mesh_2d(2, 4)
    # every leaf of this model has a divisible channel dim -> all sharded
    specs = jax.tree_util.tree_leaves(tp_shard_tree(mesh, variables))
    assert all(s.spec != P() for s in specs)
    vs = tp_place(mesh, variables)
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4))
    out = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False),
        out_shardings=replicated(mesh),
    )(vs, xb)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_tp_train_step_matches_single_device(rng):
    """One DP x TP (2x4) triplet train step == the single-device step:
    params, Adam moments and BN batch_stats all channel-sharded, batch
    sharded on the data axis."""
    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.parallel.tensor import mesh_2d, tp_place
    from art_sbir_tpu.train.losses import TripletLossConfig
    from art_sbir_tpu.train.triplet import create_train_state, make_train_step

    import optax

    model = ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=16, heads=4, input_resolution=32, width=8
    )
    # SGD: the param delta IS the gradient (see the DP test above)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                               tx=optax.sgd(1.0))
    step = make_train_step(TripletLossConfig(), donate=False)

    mk = lambda: rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    host_batch = {"sketch": mk(), "positive": mk(), "negative": mk()}

    s1, l1 = step(state, {k: jnp.asarray(v) for k, v in host_batch.items()})

    mesh = mesh_2d(2, 4)
    state_tp = tp_place(mesh, state)
    batch_tp = {
        k: jax.device_put(jnp.asarray(v), batch_sharding(mesh, 4))
        for k, v in host_batch.items()
    }
    s2, l2 = step(state_tp, batch_tp)

    np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]), rtol=1e-5)
    g1 = np.concatenate([np.asarray(v).ravel()
                         for v in jax.tree_util.tree_leaves(s1.params)])
    g2 = np.concatenate([np.asarray(jax.device_get(v)).ravel()
                         for v in jax.tree_util.tree_leaves(s2.params)])
    rel_l2 = np.linalg.norm(g1 - g2) / np.linalg.norm(g1)
    cos = np.dot(g1, g2) / (np.linalg.norm(g1) * np.linalg.norm(g2))
    assert rel_l2 < 1e-2, rel_l2
    assert cos > 0.9999, cos
    # the updated state keeps its channel sharding (no silent re-replication)
    kern = s2.params["conv1"]["kernel"]
    assert "model" in (kern.sharding.spec[-1] or ""), kern.sharding


def test_train_cli_tp_matches_single_device(tmp_path, monkeypatch):
    """The e2e train CLI on a 2x4 DPxTP mesh (--n_devices 2 --tp_devices 4)
    matches single-device, run with --no-bf16: the CLI's bf16-compute
    default amplifies TP's resharding reassociation to bf16 numerics
    (~1e-2 relative embeddings -> ~10% loss spread on fresh-init
    near-tie triplets), while DP splits only the batch dim and stays
    near-exact even in bf16. f32 TP agrees to fp tolerance (verified at
    library level in test_tp_train_step_matches_single_device). Past step
    one, torch-parity Adam is sign-like (mhat/sqrt(vhat) -> ±lr on
    near-zero grads), so later-step and retrieval comparisons get modest
    slack even at f32."""
    import json

    from art_sbir_tpu.data.synthetic import make_synthetic_sketchy

    root = make_synthetic_sketchy(tmp_path / "sketchy")
    monkeypatch.chdir(tmp_path)
    from art_sbir_tpu.cli.train import main

    def run(extra, tag):
        out = main([
            "-e", "1", "-b", "16", "-d", "SketchyV1",
            "--model_type", "ModifiedResNet", "--no-bf16",
            "--data_root", str(root), "--image_size", "64", "--inference",
            "--results_root", str(tmp_path / f"results_{tag}"),
            "--seed", "3", *extra,
        ])
        training = json.loads((out / "training.json").read_text())
        inference = json.loads((out / "inference.json").read_text())
        params = json.loads((out / "training_params.json").read_text())
        return training, inference, params

    t1, i1, p1 = run([], "single")
    t8, i8, p8 = run(["--n_devices", "2", "--tp_devices", "4"], "tp")
    assert p1["n_devices"] == 1 and p8["n_devices"] == 8
    np.testing.assert_allclose(t1["train_losses"], t8["train_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(t1["test_losses"], t8["test_losses"],
                               rtol=1e-3)
    # retrieval ranks after one (sign-like, see above) Adam step: discrete
    # metrics on a tiny gallery tolerate at most one near-tie flip
    assert i1["topk_acc"][-1] == i8["topk_acc"][-1]
    np.testing.assert_allclose(i1["mean_reciprocal_rank"],
                               i8["mean_reciprocal_rank"], rtol=0.2)


def test_shard_or_replicate_uses_data_axis_on_2d_mesh(rng):
    """Raggedness is judged against the DATA-axis size (a 2-D TP mesh
    replicates batches over 'model'); scalar leaves never count ragged."""
    from art_sbir_tpu.parallel import shard_or_replicate
    from art_sbir_tpu.parallel.tensor import mesh_2d

    mesh = mesh_2d(2, 4)
    batch = {"x": rng.standard_normal((6, 3)).astype(np.float32),
             "w": np.float32(0.5)}  # 0-d leaf must not crash or force
    out = shard_or_replicate(mesh, batch)  # 6 % 2 == 0 -> sharded
    x = out["x"]
    assert {s.data.shape for s in x.addressable_shards} == {(3, 3)}

    ragged = {"x": rng.standard_normal((5, 3)).astype(np.float32)}
    out = shard_or_replicate(mesh, ragged)  # 5 % 2 != 0 -> replicated
    assert all(s.data.shape == (5, 3)
               for s in out["x"].addressable_shards)


def test_fused_sharded_routing_gates_on_data_axis(rng, monkeypatch):
    """evaluate_retrieval's fused-sharded gate uses the first mesh axis
    size: on a 2x4 TP mesh a gallery divisible by 2 (not 8) still routes
    through the per-shard sweep, exactly matching the no-mesh result."""
    import art_sbir_tpu.retrieval.rank as rank_mod
    from art_sbir_tpu.parallel.tensor import mesh_2d

    monkeypatch.setattr(rank_mod, "FUSED_GALLERY_THRESHOLD", 32)
    n, d = 132, 16  # 132 % 2 == 0 but 132 % 8 != 0
    gal = rng.standard_normal((n, d)).astype(np.float32)
    queries = gal[:6] + 0.01 * rng.standard_normal((6, d)).astype(np.float32)
    sketch_paths = [f"gallery/{i}-x.png" for i in range(6)]
    image_paths = [f"gallery/{i}.jpg" for i in range(n)]

    r0 = rank_mod.evaluate_retrieval(queries, gal, sketch_paths,
                                     image_paths, loss_type="euclidean")
    r1 = rank_mod.evaluate_retrieval(queries, gal, sketch_paths,
                                     image_paths, loss_type="euclidean",
                                     mesh=mesh_2d(2, 4))
    assert r0["topk_acc"] == r1["topk_acc"]
    np.testing.assert_allclose(r0["mean_reciprocal_rank"],
                               r1["mean_reciprocal_rank"], rtol=1e-6)


def test_pix2pix_tp_matches_single_device(rng):
    """GAN tensor parallelism: G/D params + Adam moments channel-sharded
    over the 'model' axis of a 2x4 mesh, batch sharded over 'data' —
    losses equal the single-device step (f32 compute throughout)."""
    from art_sbir_tpu.parallel.tensor import mesh_2d
    from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig

    cfg = Pix2PixConfig(image_size=32, ngf=8, ndf=8)
    batch = {
        "A": rng.random((8, 32, 32, 3)).astype(np.float32),
        "B": rng.random((8, 32, 32, 1)).astype(np.float32),
    }
    single = Pix2Pix(cfg, jax.random.key(0))
    tp = Pix2Pix(cfg, jax.random.key(0), mesh=mesh_2d(2, 4), tp=True)
    # the placement really is tensor-parallel, not replicated
    assert any("model" in str(l.sharding.spec)
               for l in jax.tree_util.tree_leaves(tp.g.params)
               if hasattr(l, "sharding"))

    for step_key in (1, 2):
        l1 = single.train_step(batch, jax.random.key(step_key))
        l2 = tp.train_step(batch, jax.random.key(step_key))
        for k in l1:
            assert float(l2[k]) == pytest.approx(float(l1[k]), rel=1e-4,
                                                 abs=1e-5), k


def test_vae_tp_matches_single_device(rng):
    """VAE tensor parallelism: LSTM gate matrices shard on their
    concatenated 4H trailing dim; losses equal single-device."""
    from art_sbir_tpu.parallel.tensor import mesh_2d
    from art_sbir_tpu.train.vae import VAEConfig, VAETrainer

    cfg = VAEConfig(z_size=8, dec_rnn_size=16, num_mixture=3, max_seq_len=10,
                    image_size=32)
    batch = {
        "photo": rng.random((8, 32, 32, 3)).astype(np.float32),
        "sketch_vector": rng.random((8, 10, 5)).astype(np.float32),
    }
    single = VAETrainer(cfg, jax.random.key(0))
    tp = VAETrainer(cfg, jax.random.key(0), mesh=mesh_2d(2, 4), tp=True)
    assert any("model" in str(l.sharding.spec)
               for l in jax.tree_util.tree_leaves(tp.state.params)
               if hasattr(l, "sharding"))
    for step_key in (1, 2):
        l1 = single.train_step(batch, jax.random.key(step_key))
        l2 = tp.train_step(batch, jax.random.key(step_key))
        for k in l1:
            assert float(l2[k]) == pytest.approx(float(l1[k]), rel=1e-4,
                                                 abs=1e-5), k


def test_mesh_from_args_semantics():
    """Shared CLI mesh construction: -1 = all devices (divided by the TP
    axis when present), 0/1 = single device, TP+multihost rejected."""
    from art_sbir_tpu.parallel.mesh import mesh_from_args

    assert mesh_from_args(1) == (None, False)
    assert mesh_from_args(0) == (None, False)

    mesh, tp = mesh_from_args(-1)
    assert not tp and mesh.devices.size == len(jax.devices())

    mesh, tp = mesh_from_args(2, 4)
    assert tp and dict(mesh.shape) == {"data": 2, "model": 4}

    mesh, tp = mesh_from_args(-1, 4)  # all 8 devices -> 2x4
    assert tp and dict(mesh.shape) == {"data": 2, "model": 4}

    with pytest.raises(SystemExit, match="single-host"):
        mesh_from_args(2, 4, multihost=True)
