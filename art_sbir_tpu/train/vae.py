"""Photo2Sketch VAE training: jitted step with KL warmup, exponential LR
decay and global-norm gradient clipping.

Semantics of the reference loop (reference `semiSupervised_main.py:22-135`,
hyperparameters at `:187-216`): Adam(lr=1e-4, betas=(0.5, 0.999)); per-step
schedules

  lr(t)  = (lr - min_lr) * decay^t + min_lr           (decay 0.9999)
  kl_w(t) = kl_weight - (kl_weight - kl_start) * kl_decay^t  (0.99995)

loss = GMM-NLL (unmasked variant) + kl_w * max(KL, kl_tolerance),
grad-clip global norm 1.0. The schedules live *inside* the jitted step via
``optax.inject_hyperparams`` — no per-step python LR pokes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from art_sbir_tpu.models.photo2sketch import Photo2Sketch
from art_sbir_tpu.ops.gmm import (
    kl_divergence_to_standard_normal,
    sketch_reconstruction_loss,
)
from art_sbir_tpu.train.triplet import TrainState


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Reference hp defaults (`semiSupervised_main.py:187-216`)."""

    z_size: int = 128
    dec_rnn_size: int = 512
    num_mixture: int = 20
    max_seq_len: int = 100
    learning_rate: float = 1e-4
    min_learning_rate: float = 1e-5
    decay_rate: float = 0.9999
    kl_weight: float = 1.0
    kl_weight_start: float = 0.01
    kl_decay_rate: float = 0.99995
    kl_tolerance: float = 0.2
    grad_clip: float = 1.0
    use_mask: bool = False  # reference trains with the unmasked loss
    image_size: int = 256
    # opt-in: bfloat16 compute for the VGG image encoder (the train step's
    # FLOPs-dominant stage); the LSTM decoder, GMM heads, and losses stay
    # f32 (recurrent/logsumexp numerics). Params are f32 either way.
    bf16_encoder: bool = False


def _lr_schedule(cfg: VAEConfig):
    def lr(step):
        return (cfg.learning_rate - cfg.min_learning_rate) * (
            cfg.decay_rate**step
        ) + cfg.min_learning_rate

    return lr


def kl_weight_at(cfg: VAEConfig, step) -> jax.Array:
    return cfg.kl_weight - (cfg.kl_weight - cfg.kl_weight_start) * (
        cfg.kl_decay_rate**step
    )


class VAETrainer:
    """With a ``mesh`` (1-D data mesh), the parameter state replicates,
    batches shard on dim 0, and GSPMD all-reduces the gradients over ICI —
    same discipline as the triplet and GAN trainers
    (``tests/test_sharding.py::test_vae_dp_matches_single_device``)."""

    def __init__(self, cfg: VAEConfig, rng: jax.Array, mesh=None,
                 tp: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.model = Photo2Sketch(
            z_size=cfg.z_size, dec_rnn_size=cfg.dec_rnn_size,
            num_mixture=cfg.num_mixture, max_seq_len=cfg.max_seq_len,
            dtype=jnp.bfloat16 if cfg.bf16_encoder else jnp.float32,
        )
        s = cfg.image_size
        img = jnp.zeros((1, s, s, 3), jnp.float32)
        sketch = jnp.zeros((1, cfg.max_seq_len, 5), jnp.float32)
        variables = jax.jit(self.model.init)(rng, img, sketch, jax.random.key(0))
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(_lr_schedule(cfg), b1=0.5, b2=0.999),
        )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(variables["params"]),
            apply_fn=self.model.apply,
            tx=tx,
        )
        if mesh is not None:
            if tp:
                # channel-shard params + Adam moments over the 'model'
                # axis (LSTM gate matrices shard on their concatenated
                # 4H trailing dim; GSPMD resolves the gate slicing)
                from art_sbir_tpu.parallel import tp_place

                self.state = tp_place(mesh, self.state)
            else:
                from art_sbir_tpu.parallel import replicated

                self.state = jax.device_put(self.state, replicated(mesh))
        # donate the train state: params/Adam state update in place
        # (train_step always rebinds self.state from the output)
        self._train = jax.jit(self._train_step, donate_argnums=(0,))
        self._generate = None  # lazily jitted in generate()
        self._eval = jax.jit(self._eval_step)

    def _shard(self, batch: Dict) -> Dict:
        """Ragged-safe dim-0 sharding (replicated fallback, staying
        exact); no-op without a mesh."""
        from art_sbir_tpu.parallel import shard_or_replicate

        return shard_or_replicate(self.mesh, batch)

    def _losses(self, params, batch: Dict, rng: jax.Array, step) -> Tuple:
        cfg = self.cfg
        gmm_params, mu, log_var = self.state.apply_fn(
            {"params": params}, batch["photo"], batch["sketch_vector"], rng
        )
        # target = sketch + explicit end row (reference
        # semiSupervised_main.py:58-61)
        b = batch["sketch_vector"].shape[0]
        end = jnp.tile(jnp.asarray([0, 0, 0, 0, 1], jnp.float32), (b, 1, 1))
        target = jnp.concatenate([batch["sketch_vector"], end], axis=1)
        recon, _, _ = sketch_reconstruction_loss(gmm_params, target, cfg.use_mask)
        kl = kl_divergence_to_standard_normal(mu, log_var, cfg.kl_tolerance)
        klw = kl_weight_at(cfg, step)
        total = recon + klw * kl
        return total, {"reconstruction_loss": recon, "kl_loss": kl,
                       "total_loss": total}

    def _train_step(self, state: TrainState, batch: Dict, rng: jax.Array):
        (_, losses), grads = jax.value_and_grad(
            lambda p: self._losses(p, batch, rng, state.step), has_aux=True
        )(state.params)
        return state.apply_gradients(grads), losses

    def _eval_step(self, state: TrainState, batch: Dict, rng: jax.Array):
        _, losses = self._losses(state.params, batch, rng, state.step)
        return losses

    def train_step(self, batch: Dict, rng: jax.Array) -> Dict:
        self.state, losses = self._train(self.state, self._shard(batch), rng)
        return losses

    def eval_step(self, batch: Dict, rng: jax.Array) -> Dict:
        return self._eval(self.state, self._shard(batch), rng)

    def generate(self, photos: jax.Array, rng: jax.Array, num_steps: int = 101):
        """Greedy decode for sample sheets (reference
        `semiSupervised_main.py:138-182`). Jitted — the scan decoder is
        hundreds of tiny ops that eager dispatch serializes."""
        if self._generate is None:
            self._generate = jax.jit(
                lambda params, p, r, n: self.model.apply(
                    {"params": params}, p, r, n, method=self.model.generate),
                static_argnums=3,
            )
        return self._generate(self.state.params, photos, rng, num_steps)
