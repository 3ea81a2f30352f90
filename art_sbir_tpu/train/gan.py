"""pix2pix GAN training: conditional D + (GAN + λ·L1) G, one jitted step.

Semantics of the reference optimize path (reference
`pix2pix_model.py:279-346`, options at `pix2pix_main.py:147-180`):

* forward once: fake_B = G(A);
* D step on [A, stop_grad(fake_B)] vs [A, B], loss = (fake + real) / 2,
  Adam(lr=1e-5, betas=(0.5, 0.999));
* G step against the *updated* D: GAN(D([A, fake]), real=True) + λ·L1,
  λ=10 by default;
* ``decoder_only=True`` trains D only (the reference's warmup first epoch,
  `pix2pix_main.py:29-31`);
* ``calculate_loss`` computes eval losses without updates
  (`pix2pix_model.py:338-346`).

Both sub-steps live in one compiled program; under a data mesh the batch is
sharded and XLA all-reduces both gradient sets over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from art_sbir_tpu.models.pix2pix import GANLoss, define_d, define_g
from art_sbir_tpu.train.triplet import TrainState


@dataclasses.dataclass(frozen=True)
class Pix2PixConfig:
    """Mirrors the reference option dict (`pix2pix_main.py:147-180`)."""

    input_nc: int = 3
    output_nc: int = 1
    ngf: int = 64
    ndf: int = 64
    net_g: str = "resnet_9blocks"
    net_d: str = "basic"
    n_layers_d: int = 3
    norm: str = "batch"
    gan_mode: str = "vanilla"
    lambda_l1: float = 10.0
    lr: float = 1e-5
    beta1: float = 0.5
    use_dropout: bool = True  # no_dropout=False default
    image_size: int = 256
    # opt-in mixed precision: f32 master params/optimizer/running stats,
    # bfloat16 network compute (halved HBM traffic, faster MXU). The
    # reference trains f32-only; this is a TPU-native speed mode, OFF by
    # default so the golden trajectories stay bit-stable.
    bf16: bool = False


class Pix2Pix:
    """G + D states and the jitted train/eval steps.

    With a ``mesh`` (1-D data mesh from `parallel.data_mesh`), both
    parameter states are replicated, incoming batches are sharded on dim 0,
    and XLA inserts the gradient (and BatchNorm batch-stat) all-reduces
    over ICI under GSPMD — the DP result equals the single-device run
    (``tests/test_sharding.py::test_pix2pix_dp_matches_single_device``)."""

    def __init__(self, cfg: Pix2PixConfig, rng: jax.Array, mesh=None,
                 tp: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.criterion = GANLoss(cfg.gan_mode)
        dt = jnp.bfloat16 if cfg.bf16 else None
        self.net_g = define_g(cfg.net_g, cfg.output_nc, cfg.ngf, cfg.norm,
                              cfg.use_dropout, dtype=dt)
        self.net_d = define_d(cfg.net_d, cfg.ndf, cfg.n_layers_d, cfg.norm,
                              dtype=dt)

        kg, kd = jax.random.split(rng)
        s = cfg.image_size
        xa = jnp.zeros((1, s, s, cfg.input_nc), jnp.float32)
        xab = jnp.zeros((1, s, s, cfg.input_nc + cfg.output_nc), jnp.float32)
        tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=0.999)
        self.g = self._mk_state(self.net_g, kg, xa, tx)
        self.d = self._mk_state(self.net_d, kd, xab, tx)
        if mesh is not None:
            if tp:
                # channel-shard G/D params + Adam moments over the mesh's
                # 'model' axis (parallel/tensor.py trailing-dim rule);
                # batches still shard over 'data' via shard_or_replicate
                from art_sbir_tpu.parallel import tp_place

                self.g = tp_place(mesh, self.g)
                self.d = tp_place(mesh, self.d)
            else:
                from art_sbir_tpu.parallel import replicated

                self.g = jax.device_put(self.g, replicated(mesh))
                self.d = jax.device_put(self.d, replicated(mesh))
        # donate g/d so both towers' params + Adam state update in place
        # (the trainer always rebinds self.g/self.d from the outputs)
        self._train_step = jax.jit(self._step, static_argnames=("decoder_only",),
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._losses_only)
        self._gen_step = jax.jit(
            lambda g, x: self._apply(g, g.params, x, False)[0])

    def _shard(self, batch: Dict) -> Dict:
        """Ragged-safe dim-0 sharding; only the corpus tail is ever
        ragged (it goes replicated — bit-identical, just redundant)."""
        from art_sbir_tpu.parallel import shard_or_replicate

        return shard_or_replicate(self.mesh, batch)

    @staticmethod
    def _mk_state(model, rng, x, tx) -> TrainState:
        variables = jax.jit(model.init, static_argnames="train")(rng, x, train=False)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(params),
            apply_fn=model.apply,
            tx=tx,
        )

    # ---------------------------------------------------------------- core

    def _apply(self, state: TrainState, params, x, train, rngs=None):
        # With cfg.bf16 the modules themselves cast params/activations to
        # bfloat16 per layer (flax dtype attr; param_dtype stays f32, so
        # master weights, grads, optimizer state and BN running stats are
        # all full precision). Network outputs come back in the compute
        # dtype — cast to f32 so the GAN/L1 losses are computed at full
        # precision.
        variables = {"params": params, "batch_stats": state.batch_stats}
        if train:
            out, mut = state.apply_fn(variables, x, train=True,
                                      mutable=["batch_stats"], rngs=rngs)
            return out.astype(jnp.float32), mut["batch_stats"]
        out = state.apply_fn(variables, x, train=False)
        return out.astype(jnp.float32), state.batch_stats

    def _step(
        self, g: TrainState, d: TrainState, batch: Dict, rng: jax.Array,
        decoder_only: bool = False,
    ) -> Tuple[TrainState, TrainState, Dict]:
        cfg = self.cfg
        real_a, real_b = batch["A"], batch["B"]
        rng_g = rng

        # forward: fake once, with G's dropout active in train mode. The
        # reference computes fake_B ONCE and reuses it for both the D and G
        # losses (`pix2pix_model.py:294-322`); g_loss_fn below replays this
        # exact forward (same dropout key, same incoming batch_stats) so the
        # G gradient flows through the forward D was trained on, and G's BN
        # running stats advance exactly once per step.
        fake_b, g_stats = self._apply(g, g.params, real_a, True,
                                      rngs={"dropout": rng_g})

        # --- D update (fake detached) ---
        def d_loss_fn(dp):
            fake_ab = jnp.concatenate([real_a, jax.lax.stop_gradient(fake_b)], -1)
            real_ab = jnp.concatenate([real_a, real_b], -1)
            pred_fake, stats = self._apply(d, dp, fake_ab, True)
            pred_real, stats2 = self._apply(d.replace(batch_stats=stats), dp,
                                            real_ab, True)
            loss_fake = self.criterion(pred_fake, False)
            loss_real = self.criterion(pred_real, True)
            total = (loss_fake + loss_real) * 0.5
            return total, (loss_fake, loss_real, stats2)

        (d_total, (d_fake, d_real, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d.params)
        d = d.apply_gradients(d_grads).replace(batch_stats=d_stats)

        losses = {"D_fake": d_fake, "D_real": d_real, "D_total": d_total}

        if decoder_only:
            zero = jnp.zeros(())
            losses.update({"G_GAN": zero, "G_L1": zero, "G_total": zero})
            return g.replace(batch_stats=g_stats), d, losses

        # --- G update against the updated D: replay of the single forward ---
        def g_loss_fn(gp):
            fake, stats = self._apply(g, gp, real_a, True,
                                      rngs={"dropout": rng_g})
            fake_ab = jnp.concatenate([real_a, fake], -1)
            pred_fake, _ = self._apply(d, d.params, fake_ab, True)
            loss_gan = self.criterion(pred_fake, True)
            loss_l1 = jnp.mean(jnp.abs(fake - real_b)) * cfg.lambda_l1
            return loss_gan + loss_l1, (loss_gan, loss_l1, stats)

        (g_total, (g_gan, g_l1, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g.params)
        g = g.apply_gradients(g_grads).replace(batch_stats=g_stats)

        losses.update({"G_GAN": g_gan, "G_L1": g_l1, "G_total": g_total})
        return g, d, losses

    def _losses_only(self, g: TrainState, d: TrainState, batch: Dict) -> Dict:
        """Eval losses without updates (reference `calculate_loss`)."""
        real_a, real_b = batch["A"], batch["B"]
        fake_b, _ = self._apply(g, g.params, real_a, False)
        fake_ab = jnp.concatenate([real_a, fake_b], -1)
        pred_fake, _ = self._apply(d, d.params, fake_ab, False)
        g_gan = self.criterion(pred_fake, True)
        g_l1 = jnp.mean(jnp.abs(fake_b - real_b)) * self.cfg.lambda_l1
        return {"G_GAN": g_gan, "G_L1": g_l1, "G_total": g_gan + g_l1}

    # ----------------------------------------------------------------- API

    def train_step(self, batch: Dict, rng: jax.Array, decoder_only: bool = False
                   ) -> Dict:
        self.g, self.d, losses = self._train_step(
            self.g, self.d, self._shard(batch), rng, decoder_only=decoder_only
        )
        return losses

    def eval_losses(self, batch: Dict) -> Dict:
        return self._eval_step(self.g, self.d, self._shard(batch))

    def generate(self, real_a: jax.Array) -> jax.Array:
        return self._gen_step(self.g, self._shard({"A": real_a})["A"])
