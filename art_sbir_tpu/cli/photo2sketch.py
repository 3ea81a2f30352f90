"""Photo2Sketch VAE training CLI (reference `semiSupervised_main.py`).

Trains on VectorizedSketchy (or QuickDraw) with the reference's
hyperparameters; every ``save_rate`` epochs checkpoints and emits sample
sketches: greedy decode -> SVG (`build_svg`) + device-rasterized triplet
grids (reference `create_sample_sketches`, `semiSupervised_main.py:138-182`).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.core.checkpoint import load_pytree, save_pytree
    from art_sbir_tpu.core.metrics import LossTracker, Timer
    from art_sbir_tpu.core.results import ResultsWriter
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.data.loader import decode_paths
    from art_sbir_tpu.ops.rasterize import rasterize_strokes
    from art_sbir_tpu.ops.resize import IMAGENET_MEAN, IMAGENET_STD, normalize
    from art_sbir_tpu.ops.svg import build_svg
    from art_sbir_tpu.train.vae import VAEConfig, VAETrainer
    from art_sbir_tpu.viz.plots import loss_curves, triplet_grid

    p = argparse.ArgumentParser(description="Photo2Sketch")
    p.add_argument("--setup", type=str, default="Sketchy",
                   choices=["Sketchy", "Quickdraw"])
    p.add_argument("--batchsize", type=int, default=64)
    p.add_argument("--max_epoch", type=int, default=1)
    p.add_argument("--dec_rnn_size", type=int, default=512)
    p.add_argument("--z_size", type=int, default=128)
    p.add_argument("--num_mixture", type=int, default=20)
    p.add_argument("--kl_weight_start", type=float, default=0.01)
    p.add_argument("--kl_decay_rate", type=float, default=0.99995)
    p.add_argument("--kl_tolerance", type=float, default=0.2)
    p.add_argument("--kl_weight", type=float, default=1.0)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--decay_rate", type=float, default=0.9999)
    p.add_argument("--min_learning_rate", type=float, default=1e-5)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--save_rate", type=int, default=30)
    p.add_argument("--size", type=float, default=0.1)
    p.add_argument("--img_format", default="jpg", choices=["jpg", "svg"])
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--model", type=str, default=None, help="orbax warm start")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 VGG-encoder compute (measured 1.4x step "
                        "throughput; decoder/GMM/losses stay f32); OFF by "
                        "default = reference f32 semantics")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel devices over the ICI mesh (0 = "
                        "single device, -1 = all available)")
    p.add_argument("--tp_devices", type=int, default=1,
                   help="tensor-parallel (model-axis) devices on a 2-D "
                        "(data, model) mesh; combines with --n_devices")
    args = p.parse_args(argv)

    cfg = VAEConfig(
        z_size=args.z_size, dec_rnn_size=args.dec_rnn_size,
        num_mixture=args.num_mixture, learning_rate=args.learning_rate,
        min_learning_rate=args.min_learning_rate, decay_rate=args.decay_rate,
        kl_weight=args.kl_weight, kl_weight_start=args.kl_weight_start,
        kl_decay_rate=args.kl_decay_rate, kl_tolerance=args.kl_tolerance,
        grad_clip=args.grad_clip, image_size=args.image_size,
        bf16_encoder=args.bf16,
    )
    from art_sbir_tpu.parallel.mesh import mesh_from_args

    mesh, tp = mesh_from_args(args.n_devices, args.tp_devices)
    trainer = VAETrainer(cfg, jax.random.key(args.seed), mesh=mesh, tp=tp)
    if args.model:
        restored = load_pytree(args.model, {"params": trainer.state.params})
        trainer.state = trainer.state.replace(params=restored["params"])

    dataset = "VectorizedSketchyV1" if args.setup == "Sketchy" else "QuickdrawV1"
    train_cat, test_cat = get_datasets(
        dataset=dataset, size=args.size, img_format=args.img_format,
        max_erase_count=1, root=args.data_root,
    )

    raster_photo = jax.jit(
        lambda vec: normalize(
            1.0 - rasterize_strokes(vec)[..., None].repeat(3, -1) / 255.0,
            IMAGENET_MEAN, IMAGENET_STD,
        )
    )
    from art_sbir_tpu.ops.rasterize import rasterize_prepared

    raster_photo_prepared = jax.jit(
        lambda pts, segs: normalize(
            1.0 - rasterize_prepared(pts, segs)[..., None].repeat(3, -1) / 255.0,
            IMAGENET_MEAN, IMAGENET_STD,
        )
    )

    def batches(catalog, train: bool, rng):
        order = list(range(len(catalog)))
        if train:
            rng.shuffle(order)
        for s in range(0, len(order), args.batchsize):
            idx = order[s : s + args.batchsize]
            items = [catalog.item(i) for i in idx]
            vec = jnp.asarray(np.stack([it["sketch_vector"] for it in items]))
            if "photo_path" in items[0]:
                photos = decode_paths(
                    [it["photo_path"] for it in items], args.image_size
                ).astype(np.float32) / 255.0
                photo = normalize(jnp.asarray(photos), IMAGENET_MEAN, IMAGENET_STD)
            elif "raster_points" in items[0]:
                # exact integer points cached by the catalog (float64 host
                # scaling) -> device Bresenham; bit-exact vs the reference
                pts = jnp.asarray(np.stack([it["raster_points"] for it in items]))
                segs = jnp.asarray(np.stack([it["raster_segs"] for it in items]))
                photo = raster_photo_prepared(pts, segs)
            else:  # rasterize the vector sketch on device (img_format=='svg')
                photo = raster_photo(vec)
            yield {"photo": photo, "sketch_vector": vec,
                   "length": jnp.asarray([it["length"] for it in items])}

    rng = np.random.default_rng(args.seed)
    keys = ["total_loss", "kl_loss", "reconstruction_loss"]
    train_tracker, test_tracker = LossTracker(keys), LossTracker(keys)
    timer = Timer()
    writer = None

    for epoch in range(args.max_epoch):
        train_tracker.reset_sums()
        n = 0
        for batch in batches(train_cat, True, rng):
            losses = trainer.train_step(
                batch, jax.random.key(int(rng.integers(2**31)))
            )
            train_tracker.add(losses, args.batchsize)  # lazy, no per-step sync
            n += 1
        train_tracker.append(dict(train_tracker.sums), max(n, 1))
        print(
            f"Epoch:{epoch} ** Train ** "
            f"sup_p2s_loss:{train_tracker.series['reconstruction_loss'][-1]} "
            f"** kl:{train_tracker.series['kl_loss'][-1]} "
            f"** total:{train_tracker.series['total_loss'][-1]}",
            flush=True,
        )

        test_tracker.reset_sums()
        n = 0
        for batch in batches(test_cat, False, rng):
            losses = trainer.eval_step(batch, jax.random.key(0))
            test_tracker.add(losses, args.batchsize)  # lazy, no per-step sync
            n += 1
        test_tracker.append(dict(test_tracker.sums), max(n, 1))

        if (epoch + 1) % args.save_rate == 0 or epoch + 1 == args.max_epoch:
            writer = ResultsWriter("Photo2Sketch", train_cat.state_dict["dataset"])
            training_dict = {
                "train_losses": dict(train_tracker.series),
                "test_losses": dict(test_tracker.series),
                "training_time": timer.elapsed(),
            }
            writer.write_all(train_cat.state_dict, training_dict, vars(args), {})
            save_pytree(Path("models") / writer.run_name,
                        {"params": trainer.state.params})
            for k in keys:
                loss_curves(train_tracker.series[k], test_tracker.series[k],
                            writer.path / f"loss_{k}.png", title=k)
            # sample sheet: photo | generated raster | target raster
            for batch in batches(test_cat, False, rng):
                strokes, _ = trainer.generate(batch["photo"][:4], jax.random.key(1))
                gen_raster = np.asarray(rasterize_strokes(strokes))
                tgt_raster = np.asarray(rasterize_strokes(batch["sketch_vector"][:4]))
                trips = []
                for i in range(min(4, strokes.shape[0])):
                    photo01 = np.clip(
                        np.asarray(batch["photo"][i]) * np.asarray(IMAGENET_STD)
                        + np.asarray(IMAGENET_MEAN), 0, 1,
                    )
                    trips.append((photo01, 255 - gen_raster[i], 255 - tgt_raster[i]))
                    build_svg(np.asarray(strokes[i]), (256, 256),
                              writer.path / f"sample_{epoch + 1}_{i}.svg")
                    # stroke-5 JSON next to the SVG (reference
                    # semiSupervised_main.py:155-182 sample exports)
                    import json

                    (writer.path / f"sample_{epoch + 1}_{i}.json").write_text(
                        json.dumps({
                            "shape": [256, 256],
                            "image": np.asarray(strokes[i]).tolist(),
                        })
                    )
                triplet_grid(trips, writer.path / f"samples_{epoch + 1}.png",
                             titles=("photo", "generated", "target"))
                break

    print(f"Training done in {timer.elapsed():.1f}s", flush=True)


if __name__ == "__main__":
    main()
