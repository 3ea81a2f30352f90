"""Retrieval-evaluation CLI — recomputes inference for saved result folders
(reference `inference.py:167-244`): loads the run's JSONs, restores the
checkpoint, rebuilds the test catalog, re-runs the batched evaluation, and
writes ``inference_updated.json`` + refreshed plots.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax


def rerun_folder(folder: str, results_root: Path, models_root: Path,
                 data_root=None, n_devices: int = 1,
                 bn_recalibrate: str = "off") -> None:
    import jax.numpy as jnp

    from art_sbir_tpu.core.checkpoint import load_pytree
    from art_sbir_tpu.core.results import load_results
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.models.resnet import create_encoder
    from art_sbir_tpu.retrieval.engine import run_inference
    from art_sbir_tpu.train.prepare import finish_gallery_batch
    from art_sbir_tpu.train.triplet import create_train_state
    from art_sbir_tpu.viz.plots import visualize

    run_dir = results_root / folder
    results = load_results(run_dir)
    if "data_params" not in results:
        print(f"Results {folder} are not available", flush=True)
        return
    data_dict = results["data_params"]
    param_dict = results.get("training_params", {})

    dataset = data_dict["dataset"]
    if "Mixed" in dataset and "version" in data_dict:
        dataset = dataset + data_dict["version"]
    loss_type = param_dict.get("loss_type", "euclidean")
    model_type = param_dict.get("model_type") or folder.split("_")[0]
    with_classification = "with_classification" in model_type or (
        "WithClassification" in folder
    )
    image_size = int(param_dict.get("image_size", 224))

    model = create_encoder(
        with_classification=with_classification,
        num_classes=int(param_dict.get("num_classes", 125)),
        num_classes2=int(param_dict.get("num_classes2", 0)),
        dtype=jnp.bfloat16,
        input_resolution=image_size,
    )
    state = create_train_state(model, jax.random.key(0),
                               (1, image_size, image_size, 3))
    ckpt = models_root / folder
    if ckpt.exists():
        restored = load_pytree(ckpt, {"params": state.params,
                                      "batch_stats": state.batch_stats})
        state = state.replace(**restored)
    else:
        print(f"Model {folder} is not available — evaluating fresh init",
              flush=True)

    train_cat, test_cat = get_datasets(
        dataset=dataset, size=data_dict.get("size", 1.0),
        sketch_type=data_dict.get("sketch_type", "contour_drawings"),
        img_type=data_dict.get("img_type", "photos"),
        img_format=data_dict.get("img_format", "jpg"),
        root=data_root,
    )

    bn_sketch_stats = None
    if bn_recalibrate != "off":
        from art_sbir_tpu.train.bn import recalibrate_from_catalog

        out = recalibrate_from_catalog(
            model.apply, state.params, state.batch_stats, train_cat,
            mode=bn_recalibrate, image_size=image_size,
            resize_mode=(param_dict.get("resize_mode")
                         or getattr(train_cat, "resize_mode", "square")),
            batch_size=int(param_dict.get("batch_size", 32)),
        )
        if bn_recalibrate == "mixed":
            state = state.replace(batch_stats=out)
        else:
            bn_sketch_stats, photo_stats = out
            state = state.replace(batch_stats=photo_stats)
        print(f"BN running stats recalibrated ({bn_recalibrate})",
              flush=True)

    def forward(images_uint8):
        x = finish_gallery_batch(images_uint8)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x,
            train=False,
        )
        return out[0] if isinstance(out, tuple) else out

    query_forward = None
    if bn_sketch_stats is not None:
        def query_forward(images_uint8):
            x = finish_gallery_batch(images_uint8)
            out = model.apply(
                {"params": state.params, "batch_stats": bn_sketch_stats},
                x, train=False,
            )
            return out[0] if isinstance(out, tuple) else out

    mesh = None
    if n_devices != 1:
        from art_sbir_tpu.parallel import data_mesh, replicated

        mesh = data_mesh(None if n_devices < 0 else n_devices)
        state = jax.device_put(state, replicated(mesh))
        print(f"data mesh: {mesh.devices.size} devices", flush=True)

    # honor the geometry the run recorded; None -> family default
    resize_mode = param_dict.get("resize_mode") or data_dict.get("resize_mode")
    inference_dict = run_inference(forward, test_cat, None, loss_type,
                                   image_size=image_size,
                                   resize_mode=resize_mode,
                                   model_name=type(model).__name__, mesh=mesh,
                                   query_forward_fn=query_forward)
    (run_dir / "inference_updated.json").write_text(
        json.dumps(inference_dict, indent=4, default=float)
    )
    visualize(run_dir, results.get("training", {}), inference_dict)
    print(f"RUN INFERENCE AND VISUALIZATION FOR {folder}", flush=True)


def main(argv=None) -> None:
    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="recomputes Inference for given folder")
    p.add_argument("--folder", default=None)
    p.add_argument("-a", "--all", action="store_true")
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--models_root", type=str, default="models")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--n_devices", type=int, default=1,
                   help="data-parallel devices for the embedding sweep "
                        "(1 = single device, -1 = all available)")
    p.add_argument("--bn_recalibrate", default="off",
                   choices=["off", "mixed", "per_modality"],
                   help="recalibrate BatchNorm running stats over the "
                        "run's TRAIN split before evaluating (train.bn; "
                        "PERF.md 'BN recalibration')")
    args = p.parse_args(argv)

    results_root = Path(args.results_root)
    folders = [] if not args.folder else [args.folder]
    if args.all:
        folders = [d.name for d in results_root.glob("ModifiedResNet*") if d.is_dir()]
    print(folders, flush=True)
    for folder in folders:
        rerun_folder(folder, results_root, Path(args.models_root),
                     args.data_root, n_devices=args.n_devices,
                     bn_recalibrate=args.bn_recalibrate)


if __name__ == "__main__":
    main()
