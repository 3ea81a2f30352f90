"""Triplet-training CLI — flag surface of the reference `train.py:105-124`.

End-to-end: catalogs -> host loader (uint8) -> device finishing (normalize /
augment) -> jitted triplet step (3 forwards + backward + Adam in one XLA
program) -> retrieval evaluation -> orbax checkpoint + the 4-JSON results
contract + plots.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Starts training a model")
    p.add_argument("-e", "--epochs", type=int, default=1)
    p.add_argument("-b", "--batch_size", type=int, default=32)
    p.add_argument("-l", "--learning_rate", type=float, default=1e-5)
    p.add_argument("-m", "--model", type=str, default=None,
                   help="checkpoint dir to warm-start from (orbax)")
    p.add_argument("--model_type", type=str,
                   default="ModifiedResNet_with_classification",
                   choices=["ModifiedResNet", "ModifiedResNet_with_classification"])
    p.add_argument("-d", "--dataset", type=str, default="SketchyV1",
                   choices=["SketchyV1", "SketchyV2", "KaggleV1", "KaggleV2",
                            "AugmentedKaggleV1", "AugmentedKaggleV2",
                            "MixedDatasetV1", "MixedDatasetV2", "MixedDatasetV3",
                            "MixedDatasetV4", "CategorizedMixedDatasetV2"])
    p.add_argument("-s", "--dsize", type=float, default=1.0)
    p.add_argument("--inference", action="store_true")
    p.add_argument("--feature_folder", default=None)
    p.add_argument("--no_training", action="store_true")
    p.add_argument("-w", "--weight_decay", type=float, default=2e-3)
    p.add_argument("--img_type", type=str, default="photos",
                   choices=["photos", "anime_drawings", "contour_drawings",
                            "images", "artworks"])
    p.add_argument("--sketch_type", default="sketches_png",
                   choices=["sketches_png", "contour_drawings",
                            "opensketch_drawings", "photo_sketch",
                            "adain_sketches", "combination",
                            "dilated_opensketch_drawings"])
    p.add_argument("--sketch_format", default="png", choices=["png", "jpg"])
    p.add_argument("--loss_type", default="euclidean",
                   choices=["euclidean", "cosine"])
    p.add_argument("--loss_margin", type=float, default=0.2)
    p.add_argument("--resize_mode", default="auto",
                   choices=["auto", "square", "shortest_crop"],
                   help="host decode geometry; 'auto' = the dataset family's "
                        "reference-parity default (shortest-side resize + "
                        "center crop for Sketchy/Kaggle, square for "
                        "Augmented/Mixed)")
    # TPU-framework additions
    p.add_argument("--split_ratio", type=float, default=0.1,
                   help="test fraction of the seeded train/test split "
                        "(reference data_preparation.py:50)")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_classes", type=int, default=125)
    p.add_argument("--num_classes2", type=int, default=0)
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--width", type=int, default=64,
                   help="encoder stem width (64 = reference CLIP RN50; "
                        "smaller values give CPU-sized test encoders)")
    p.add_argument("--layers", type=int, nargs=4, default=[3, 4, 6, 3],
                   help="bottleneck blocks per stage (3 4 6 3 = RN50)")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bf16 compute / f32 params (the TPU-native "
                        "default); --no-bf16 runs full-f32 compute, e.g. "
                        "for strict cross-sharding equality checks")
    p.add_argument("--bn_recalibrate", default="off",
                   choices=["off", "mixed", "per_modality"],
                   help="post-training BatchNorm recalibration over a "
                        "train-split sketch+photo sweep (from-scratch "
                        "bimodal training; PERF.md 'BN recalibration'): "
                        "'mixed' replaces the running stats with balanced "
                        "population stats; 'per_modality' additionally "
                        "embeds queries with sketch-population stats and "
                        "the gallery with photo-population stats")
    p.add_argument("--bn_sweep_batches", type=int, default=64,
                   help="max recalibration batches per modality")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="epoch-tagged resumable checkpoints (orbax)")
    p.add_argument("--checkpoint_every", type=int, default=1)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in checkpoint_dir")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of training")
    p.add_argument("--eval_every_epoch", action="store_true",
                   help="run the full retrieval evaluation (embed gallery + "
                        "queries, rank) after EVERY epoch and record "
                        "MRR/recall@K per epoch in training.json "
                        "(epoch_metrics) — the learning-curve goldens use "
                        "this to lock 'training improves retrieval' as a "
                        "regression contract")
    p.add_argument("--n_devices", type=int, default=1,
                   help="data-parallel devices over the ICI mesh "
                        "(1 = single device, -1 = all available); batches "
                        "are sharded on dim 0 and XLA all-reduces gradients")
    p.add_argument("--tp_devices", type=int, default=1,
                   help="tensor-parallel (model-axis) devices: params, Adam "
                        "moments and BN stats channel-sharded over a 2-D "
                        "(data, model) mesh (parallel/tensor.py); combines "
                        "with --n_devices data shards; single-host only")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host (TPU pod) runtime before building "
                        "the mesh; run the same command on every host via "
                        "scripts/launch_pod.sh (see parallel/multihost.py)")
    return p


def main(argv=None) -> Path:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from art_sbir_tpu.core.checkpoint import load_pytree, save_pytree
    from art_sbir_tpu.core.results import ResultsWriter
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.data.loader import TripletLoader
    from art_sbir_tpu.models.resnet import create_encoder
    from art_sbir_tpu.retrieval.engine import run_inference
    from art_sbir_tpu.train.losses import TripletLossConfig
    from art_sbir_tpu.train.prepare import finish_gallery_batch, finish_triplet_batch
    from art_sbir_tpu.train.triplet import TripletTrainer, create_train_state, torch_adam
    from art_sbir_tpu.viz.plots import visualize

    args = build_parser().parse_args(argv)

    if args.multihost:
        from art_sbir_tpu.parallel import multihost

        multihost.initialize()
        print(f"multihost: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} global devices",
              flush=True)

    sketch_type = args.sketch_type
    if sketch_type == "combination":  # reference train.py:126
        sketch_type = ["contour_drawings", "opensketch_drawings",
                       "dilated_opensketch_drawings"]

    img_format = "png" if "drawings" in args.img_type else "jpg"

    with_classification = "with_classification" in args.model_type
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    num_classes2 = args.num_classes2
    if with_classification and "Kaggle" in args.dataset and num_classes2 == 0:
        num_classes2 = 32  # styles+genres heads (reference utils.py:180)
    model = create_encoder(
        with_classification=with_classification,
        num_classes=args.num_classes,
        num_classes2=num_classes2,
        dtype=dtype,
        input_resolution=args.image_size,
        width=args.width,
        layers=tuple(args.layers),
    )

    train_cat, test_cat = get_datasets(
        dataset=args.dataset, size=args.dsize, sketch_type=sketch_type,
        sketch_format=args.sketch_format, img_type=args.img_type,
        img_format=img_format, root=args.data_root,
        split_ratio=args.split_ratio,
    )

    with_cls_loss = with_classification and "V2" in train_cat.state_dict["dataset"]
    loss_cfg = TripletLossConfig.for_dataset(
        train_cat.state_dict["dataset"], args.loss_type, with_cls_loss,
        margin=args.loss_margin,
    )

    state = create_train_state(
        model, jax.random.key(args.seed), (1, args.image_size, args.image_size, 3),
        tx=torch_adam(args.learning_rate, args.weight_decay),
    )
    if args.model:
        restored = load_pytree(args.model, {"params": state.params,
                                            "batch_stats": state.batch_stats})
        state = state.replace(**restored)
        print(f"Model {args.model} loaded", flush=True)

    from art_sbir_tpu.parallel.mesh import mesh_from_args

    mesh, tp = mesh_from_args(args.n_devices, args.tp_devices,
                              multihost=args.multihost)
    place_state = lambda st: st  # re-place after checkpoint restores
    if mesh is not None:
        if tp:
            from art_sbir_tpu.parallel import tp_place

            place_state = lambda st: tp_place(mesh, st)
        else:
            from art_sbir_tpu.parallel import replicated

            place_state = lambda st: jax.device_put(st, replicated(mesh))
        state = place_state(state)

    augment_version = getattr(train_cat, "augment_sketches", 0)
    flip = augment_version > 0
    rng = np.random.default_rng(args.seed)

    resize_mode = None if args.resize_mode == "auto" else args.resize_mode

    def device_batches(catalog, train: bool):
        loader = TripletLoader(catalog, args.batch_size, args.image_size,
                               resize_mode=resize_mode)

        def gen():
            for batch in loader:
                if mesh is not None:
                    import math

                    from art_sbir_tpu.parallel import shard_batch

                    b = len(next(iter(batch.values())))
                    # batches shard over the DATA axis only (a 2-D TP mesh
                    # replicates them over 'model')
                    n = int(mesh.shape["data"])
                    if b % n:
                        # ragged tail: tile every row to lcm(b, n) so the
                        # batch shards evenly. Tiling preserves the batch
                        # mean, the population variance (hence BatchNorm),
                        # and the mean-loss gradient EXACTLY, so DP results
                        # equal the single-device run bit-for-semantics.
                        reps = math.lcm(b, n) // b
                        batch = {
                            k: np.tile(v, (reps,) + (1,) * (v.ndim - 1))
                            for k, v in batch.items()
                        }
                    if args.multihost and jax.process_count() > 1:
                        # every host iterates the same seeded order; slice
                        # this host's rows and assemble the global array
                        from art_sbir_tpu.parallel import multihost

                        batch = multihost.global_batch(
                            mesh, multihost.local_batch_slice(batch))
                    else:
                        batch = shard_batch(mesh, batch)
                else:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                key = jax.random.key(int(rng.integers(2**31)))
                yield finish_triplet_batch(
                    batch, key,
                    augment_version=augment_version if train else 0,
                    flip=flip if train else False, train=train,
                )

        return gen

    param_dict = {
        "model": args.model or "fresh-init", "dataset": args.dataset,
        "epochs": args.epochs, "batch_size": args.batch_size,
        "learning_rate": args.learning_rate, "weight_decay": args.weight_decay,
        "optimizer": "Adam", "loss_fn": "TripletMarginLoss",
        "loss_margin": args.loss_margin, "loss_type": args.loss_type,
        "loss_weights": [loss_cfg.classification_weight,
                         loss_cfg.classification_weight2],
        "model_type": args.model_type, "num_classes": args.num_classes,
        "num_classes2": num_classes2, "image_size": args.image_size,
        "width": args.width, "layers": list(args.layers),
        "resize_mode": resize_mode
        or getattr(train_cat, "resize_mode", "square"),
        "n_devices": 1 if mesh is None else int(mesh.devices.size),
        # mesh layout, so a 2x4 DPxTP run is distinguishable from pure
        # 8-way DP when reproducing from this contract
        "tp_devices": int(args.tp_devices),
    }
    data_dict = train_cat.state_dict
    print(param_dict, flush=True)
    print(data_dict, flush=True)

    training_dict = {}
    if not args.no_training:
        mgr = None
        start_epoch = 0
        if args.checkpoint_dir:
            from art_sbir_tpu.core.checkpoint import CheckpointManager

            mgr = CheckpointManager(args.checkpoint_dir)
            if args.resume and mgr.latest_step() is not None:
                restored = mgr.restore(
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state, "step": state.step}
                )
                state = state.replace(**restored)
                if mesh is not None:
                    state = place_state(state)
                start_epoch = int(mgr.latest_step())
                print(f"Resumed from epoch {start_epoch}", flush=True)
        from art_sbir_tpu.core.metrics import maybe_profile

        epoch_hook = None
        if args.eval_every_epoch:
            # jitted ONCE with params as arguments: a per-epoch closure
            # would bake that epoch's params into the HLO as constants and
            # recompile the eval encoder every epoch (~40 s each on this
            # host)
            @jax.jit
            def _embed_eval(params, batch_stats, images_uint8):
                x = finish_gallery_batch(images_uint8)
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, train=False,
                )
                return out[0] if isinstance(out, tuple) else out

            def epoch_hook(epoch: int, st) -> dict:
                fwd = lambda u8: _embed_eval(st.params, st.batch_stats, u8)
                d = run_inference(
                    fwd, test_cat, None, args.loss_type,
                    image_size=args.image_size, resize_mode=resize_mode,
                    model_name=type(model).__name__, mesh=mesh,
                    save_features=False,  # transient per-epoch eval
                    jit_forward=False,  # fwd already wraps a jitted call
                )
                stats = d.get("drawing_stats", d)
                return {
                    "mrr": float(stats["mean_reciprocal_rank"]),
                    "top1": float(stats["topk_acc"][0]),
                    "top10": float(stats["topk_acc"][9]),
                    "rank_mean": float(stats["mean"]),
                }

        trainer = TripletTrainer(
            loss_cfg, args.batch_size, args.epochs,
            checkpoint_manager=mgr, checkpoint_every_epochs=args.checkpoint_every,
            epoch_hook=epoch_hook,
        )
        with maybe_profile(args.trace_dir):
            state, training_dict = trainer.run(
                state, device_batches(train_cat, True),
                device_batches(test_cat, False), start_epoch=start_epoch,
            )

    bn_sketch_stats = None
    if args.bn_recalibrate != "off":
        from art_sbir_tpu.train.bn import recalibrate_from_catalog

        out = recalibrate_from_catalog(
            model.apply, state.params, state.batch_stats, train_cat,
            mode=args.bn_recalibrate, image_size=args.image_size,
            resize_mode=resize_mode
            or getattr(train_cat, "resize_mode", "square"),
            batch_size=args.batch_size, max_batches=args.bn_sweep_batches,
        )
        if args.bn_recalibrate == "mixed":
            state = state.replace(batch_stats=out)
        else:  # per_modality: gallery default = photo-population stats
            bn_sketch_stats, photo_stats = out
            state = state.replace(batch_stats=photo_stats)
        training_dict["bn_recalibrate"] = args.bn_recalibrate
        print(f"BN running stats recalibrated ({args.bn_recalibrate})",
              flush=True)

    inference_dict = {}
    if args.inference:
        def forward(images_uint8):
            x = finish_gallery_batch(images_uint8)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False,
            )
            return out[0] if isinstance(out, tuple) else out

        query_forward = None
        if bn_sketch_stats is not None:
            def query_forward(images_uint8):
                x = finish_gallery_batch(images_uint8)
                out = model.apply(
                    {"params": state.params,
                     "batch_stats": bn_sketch_stats}, x, train=False,
                )
                return out[0] if isinstance(out, tuple) else out

        kq = None
        name = test_cat.state_dict["dataset"]
        if "Kaggle" in name or "Mixed" in name:
            try:
                _, kq = get_datasets("KaggleInferenceV1", sketch_type="sketches",
                                     root=args.data_root)
            except FileNotFoundError:
                kq = None
        inference_dict = run_inference(
            forward, test_cat, args.feature_folder, args.loss_type,
            image_size=args.image_size, resize_mode=resize_mode,
            model_name=type(model).__name__, kaggle_queries=kq, mesh=mesh,
            query_forward_fn=query_forward,
        )

    writer = ResultsWriter(type(model).__name__, data_dict["dataset"],
                           root=args.results_root)
    if training_dict:
        save_pytree(Path("models") / writer.run_name,
                    {"params": state.params, "batch_stats": state.batch_stats})
        if bn_sketch_stats is not None:
            # per-modality: main export carries photo-population stats
            # (gallery default, load-compatible); the sketch set rides in
            # a sibling export for query-side embedding
            save_pytree(Path("models") / f"{writer.run_name}_bn_sketch",
                        {"batch_stats": bn_sketch_stats})
        print(f"Model saved as {writer.run_name}", flush=True)
    writer.write_all(data_dict, training_dict, param_dict, inference_dict)
    visualize(writer.path, training_dict, inference_dict)
    print(f"Data saved in {writer.path}", flush=True)
    return writer.path


if __name__ == "__main__":
    main()
