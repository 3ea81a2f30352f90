"""pix2pix photo->sketch CLI (reference `pix2pix_main.py`).

Training: decoder-only (D) warmup first epoch (`pix2pix_main.py:29-31`),
then full G+D steps; per-epoch sample sheets and loss tracking. Generation:
writes G(photo) sketches for the whole corpus to
``data/kaggle/photo_sketch/<stem>.png`` (`pix2pix_main.py:95-119`).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def to_uint8(img01_signed: np.ndarray) -> np.ndarray:
    """[-1, 1] tanh output -> uint8 (reference `utils.py:105-111`)."""
    return ((np.clip(img01_signed, -1, 1) + 1.0) / 2.0 * 255.0).astype(np.uint8)


def main(argv=None) -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from art_sbir_tpu.core.metrics import LossTracker, Timer
    from art_sbir_tpu.core.results import ResultsWriter
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.data.loader import decode_image
    from art_sbir_tpu.train.gan import Pix2Pix, Pix2PixConfig
    from art_sbir_tpu.viz.plots import loss_curves, triplet_grid

    p = argparse.ArgumentParser(description="pix2pix photo->sketch")
    p.add_argument("--mode", choices=["train", "generate"], default="generate")
    p.add_argument("-e", "--epochs", type=int, default=1)
    p.add_argument("-b", "--batch_size", type=int, default=6)
    p.add_argument("-l", "--lr", type=float, default=1e-5)
    p.add_argument("--lambda_L1", type=float, default=10.0)
    p.add_argument("--netG", default="resnet_9blocks",
                   choices=["resnet_9blocks", "unet_256"])
    p.add_argument("--netD", default="basic", choices=["basic", "n_layers", "pixel"])
    p.add_argument("--norm", default="batch", choices=["batch", "instance", "none"])
    p.add_argument("--gan_mode", default="vanilla",
                   choices=["vanilla", "lsgan", "wgangp"])
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute (f32 master weights, "
                        "optimizer state, BN running stats and losses); "
                        "OFF by default = reference f32 semantics")
    p.add_argument("--dataset", default="SketchyPix2Pix",
                   choices=["SketchyPix2Pix", "KaggleDatasetImgOnlyV1"])
    p.add_argument("--img_type", default=None,
                   help="image folder (default: 'images' for Kaggle, "
                        "'photos' for Sketchy — reference pix2pix_main.py:188)")
    p.add_argument("-s", "--dsize", type=float, default=1.0)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--out_dir", type=str, default="data/kaggle/photo_sketch")
    p.add_argument("--model", type=str, default=None, help="orbax warm start")
    p.add_argument("--seed", type=int, default=0)
    # epoch-tagged checkpoint/resume (reference BaseModel save_networks /
    # load_networks with continue_train / load_iter,
    # pix2pix_model.py:90-101,150-205)
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="epoch-tagged resumable checkpoints (orbax)")
    p.add_argument("--checkpoint_every", type=int, default=1)
    p.add_argument("--continue_train", action="store_true",
                   help="resume from checkpoint_dir")
    p.add_argument("--load_iter", type=int, default=0,
                   help="epoch to resume from (0 = latest)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel devices over the ICI mesh (0 = single "
                        "device, -1 = all available): G+D states replicate, batches shard on dim "
                        "0, XLA all-reduces both gradient sets")
    p.add_argument("--tp_devices", type=int, default=1,
                   help="tensor-parallel (model-axis) devices: G/D params + "
                        "Adam moments channel-sharded on a 2-D (data, model) "
                        "mesh; combines with --n_devices")
    args = p.parse_args(argv)

    cfg = Pix2PixConfig(
        net_g=args.netG, net_d=args.netD, norm=args.norm, gan_mode=args.gan_mode,
        lambda_l1=args.lambda_L1, lr=args.lr, image_size=args.image_size,
        ngf=args.ngf, ndf=args.ndf, bf16=args.bf16,
    )
    from art_sbir_tpu.parallel.mesh import mesh_from_args

    mesh, tp = mesh_from_args(args.n_devices, args.tp_devices)
    model = Pix2Pix(cfg, jax.random.key(args.seed), mesh=mesh, tp=tp)
    if args.model:
        from art_sbir_tpu.core.checkpoint import load_pytree

        restored = load_pytree(
            args.model,
            {"g": {"params": model.g.params, "batch_stats": model.g.batch_stats},
             "d": {"params": model.d.params, "batch_stats": model.d.batch_stats}},
        )
        model.g = model.g.replace(**restored["g"])
        model.d = model.d.replace(**restored["d"])

    img_type = args.img_type or (
        "images" if "Kaggle" in args.dataset else "photos"
    )
    train_cat, test_cat = get_datasets(
        dataset=args.dataset, size=args.dsize, root=args.data_root,
        img_type=img_type,
    )

    def batches(catalog, train: bool, rng: np.random.Generator):
        order = list(range(len(catalog)))
        if train:
            rng.shuffle(order)
        for s in range(0, len(order), args.batch_size):
            idx = order[s : s + args.batch_size]
            items = [catalog.item(i) for i in idx]
            a = np.stack([
                decode_image(it.get("A", it.get("image")), args.image_size)
                for it in items
            ]).astype(np.float32) / 255.0
            # keep host arrays under a mesh: Pix2Pix._shard device_puts
            # them with the dim-0 sharding (jnp conversion here would pay a
            # device->host roundtrip per batch)
            to_dev = (lambda x: x) if mesh is not None else jnp.asarray
            batch = {"A": to_dev(a),
                     "paths": [str(it.get("A", it.get("image"))) for it in items]}
            if "B" in items[0]:
                b = np.stack([
                    decode_image(it["B"], args.image_size, grayscale=True)
                    for it in items
                ]).astype(np.float32) / 255.0
                batch["B"] = to_dev(b)
            yield batch

    rng = np.random.default_rng(args.seed)
    if args.mode == "train":
        keys = ["G_GAN", "G_L1", "D_real", "D_fake", "G_total", "D_total"]
        tracker = LossTracker(keys)
        timer = Timer()

        def gan_tree():
            return {
                "g": {"params": model.g.params,
                      "batch_stats": model.g.batch_stats,
                      "opt_state": model.g.opt_state, "step": model.g.step},
                "d": {"params": model.d.params,
                      "batch_stats": model.d.batch_stats,
                      "opt_state": model.d.opt_state, "step": model.d.step},
            }

        mgr = None
        start_epoch = 0
        if args.checkpoint_dir:
            from art_sbir_tpu.core.checkpoint import CheckpointManager

            mgr = CheckpointManager(args.checkpoint_dir)
            if args.continue_train:
                step = args.load_iter or None  # None = latest
                restored = mgr.restore(gan_tree(), step=step)
                model.g = model.g.replace(**restored["g"])
                model.d = model.d.replace(**restored["d"])
                start_epoch = int(step or mgr.latest_step())
                print(f"Resumed pix2pix from epoch {start_epoch}", flush=True)

        for epoch in range(start_epoch, args.epochs):
            tracker.reset_sums()
            n = 0
            for batch in batches(train_cat, True, rng):
                losses = model.train_step(
                    {"A": batch["A"], "B": batch["B"]},
                    jax.random.key(int(rng.integers(2**31))),
                    decoder_only=(epoch == 0),  # reference warmup epoch
                )
                tracker.add(losses)  # lazy: device scalars, no per-step sync
                n += 1
            tracker.append({k: v for k, v in tracker.sums.items()}, max(n, 1))
            print(f"Epoch {epoch + 1}: " + ", ".join(
                f"{k}={tracker.series[k][-1]:.4f}" for k in keys), flush=True)
            if mgr is not None and (epoch + 1) % args.checkpoint_every == 0:
                mgr.save(epoch + 1, gan_tree())

        writer = ResultsWriter("Pix2PixModel", train_cat.state_dict["dataset"])
        training_dict = {"train_losses": dict(tracker.series),
                         "training_time": timer.elapsed()}
        writer.write_all(train_cat.state_dict, training_dict,
                         {"lambda_L1": cfg.lambda_l1, "lr": cfg.lr,
                          "netG": cfg.net_g, "netD": cfg.net_d,
                          "gan_mode": cfg.gan_mode, "norm": cfg.norm,
                          "epochs": args.epochs, "batch_size": args.batch_size},
                         {})
        for key in keys:
            loss_curves(tracker.series[key], [], writer.path / f"loss_{key}.png",
                        title=key)
        from art_sbir_tpu.core.checkpoint import save_pytree

        save_pytree(
            Path("models") / writer.run_name,
            {"g": {"params": model.g.params, "batch_stats": model.g.batch_stats},
             "d": {"params": model.d.params, "batch_stats": model.d.batch_stats}},
        )
        # sample sheet: (A, fake, real) triplets from the test set
        for batch in batches(test_cat, False, rng):
            if "B" not in batch:
                break
            fake = np.asarray(model.generate(batch["A"]))
            trips = [
                (np.asarray(batch["A"][i]), to_uint8(fake[i]),
                 np.asarray(batch["B"][i]))
                for i in range(min(4, fake.shape[0]))
            ]
            triplet_grid(trips, writer.path / "samples.png",
                         titles=("photo", "fake sketch", "real sketch"))
            break
        print(f"Data saved in {writer.path}", flush=True)
    else:  # generate sketches for the whole corpus
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for catalog in (test_cat, train_cat):
            if catalog is None:
                continue
            for batch in batches(catalog, False, rng):
                fake = np.asarray(model.generate(batch["A"]))
                for img, path in zip(fake, batch["paths"]):
                    Image.fromarray(to_uint8(img)[..., 0], mode="L").save(
                        out_dir / f"{Path(path).stem}.png"
                    )
        print(f"Generated sketches written to {out_dir}", flush=True)


if __name__ == "__main__":
    main()
