"""Jitted triplet training step: loss decreases, stats update, Adam parity."""

import numpy as np
import jax
import jax.numpy as jnp

from art_sbir_tpu.models.resnet import ModifiedResNet, ModifiedResNetWithClassification
from art_sbir_tpu.train.losses import TripletLossConfig
from art_sbir_tpu.train import triplet as T

TINY = dict(layers=(1, 1, 1, 1), output_dim=16, heads=4, input_resolution=32, width=8)


def _batch(rng, b=4, s=32):
    mk = lambda: jnp.array(rng.standard_normal((b, s, s, 3)).astype(np.float32))
    return {"sketch": mk(), "positive": mk(), "negative": mk()}


def test_train_step_decreases_loss_on_fixed_batch(rng):
    model = ModifiedResNet(**TINY)
    state = T.create_train_state(
        model, jax.random.key(0), (1, 32, 32, 3), lr=1e-3, weight_decay=0.0
    )
    step = T.make_train_step(TripletLossConfig())
    batch = _batch(rng)
    state, first = step(state, batch)
    losses = [float(first["loss"])]
    for _ in range(6):
        state, out = step(state, batch)
        losses.append(float(out["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_train_step_with_classification(rng):
    model = ModifiedResNetWithClassification(num_classes=5, **TINY)
    state = T.create_train_state(model, jax.random.key(0), (1, 32, 32, 3), lr=1e-3)
    cfg = TripletLossConfig(classification_weight=0.5, num_heads=1)
    step = T.make_train_step(cfg)
    batch = _batch(rng)
    batch["label"] = jnp.array(rng.integers(0, 5, 4))
    state, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    assert "classification" in out


def test_eval_step_is_pure(rng):
    model = ModifiedResNet(**TINY)
    state = T.create_train_state(model, jax.random.key(0), (1, 32, 32, 3))
    ev = T.make_eval_step(TripletLossConfig())
    batch = _batch(rng)
    l1 = float(ev(state, batch)["loss"])
    l2 = float(ev(state, batch)["loss"])
    assert l1 == l2


def test_torch_adam_parity(rng):
    """optax chain == torch.optim.Adam(weight_decay) on a toy problem."""
    import torch

    w0 = rng.standard_normal(8).astype(np.float32)
    target = rng.standard_normal(8).astype(np.float32)

    # torch
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=0.1, weight_decay=0.01)
    for _ in range(5):
        opt.zero_grad()
        loss = ((wt - torch.from_numpy(target)) ** 2).sum()
        loss.backward()
        opt.step()

    # ours
    tx = T.torch_adam(0.1, weight_decay=0.01)
    wj = jnp.array(w0)
    opt_state = tx.init(wj)
    grad_fn = jax.grad(lambda w: jnp.sum((w - jnp.array(target)) ** 2))
    for _ in range(5):
        g = grad_fn(wj)
        updates, opt_state = tx.update(g, opt_state, wj)
        wj = wj + updates["params"] if isinstance(updates, dict) else wj + updates
    # 1-step agreement is ~7e-7; multi-step f32 rounding drifts to ~1e-4
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), rtol=1e-3, atol=2e-4)


def test_trainer_epoch_driver(rng):
    model = ModifiedResNet(**TINY)
    state = T.create_train_state(model, jax.random.key(0), (1, 32, 32, 3), lr=1e-3)
    trainer = T.TripletTrainer(TripletLossConfig(), batch_size=4, epochs=2)
    batches = [_batch(rng) for _ in range(3)]
    test = [_batch(rng)]
    state, td = trainer.run(state, lambda: iter(batches), lambda: iter(test),
                            log=lambda s: None)
    assert len(td["train_losses"]) == 2
    assert len(td["test_losses"]) == 2
    assert td["training_time"] > 0
