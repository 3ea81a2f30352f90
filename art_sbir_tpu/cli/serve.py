"""Retrieval serving CLI: a long-lived HTTP service over a trained run.

The deployment-side entry point the reference lacks (its `inference.py`
only re-evaluates saved result folders offline). This serves the same
restored checkpoint + gallery as ``cli/inference.py``, but as a persistent
process that owns the chip: the gallery embedding matrix stays resident in
HBM, queries are micro-batched into single device dispatches
(:mod:`art_sbir_tpu.retrieval.server`), and the HTTP layer is stdlib
(``ThreadingHTTPServer``) so there is nothing to install.

Endpoints
---------
* ``GET /healthz`` -> ``{"status": "ok", "gallery_size": N, ...}``
* ``GET /stats``  -> request/batch counters (mean coalesced batch size)
* ``POST /search`` with JSON ``{"image_b64": <base64 PNG/JPEG>, "k": 10}``
  -> ``{"paths": [...], "distances": [...]}`` (ascending)
* ``POST /search_batch`` with ``{"images_b64": [...], "k": 10}`` -> one
  device dispatch for the whole batch, ``{"results": [...]}``
* ``POST /add`` with ``{"image_b64": ..., "path": "name.jpg"}`` -> online
  index update (requires ``--capacity``; static shapes, never recompiles)
* ``POST /remove`` with ``{"paths": [...]}`` -> tombstone those slots
  (reused by later adds); ``POST /save`` -> persist live rows as a
  standard feature cache

Gallery sources (mutually exclusive):
* ``--folder <run>``: restore the run's checkpoint (like cli/inference.py)
  and embed its test gallery at startup;
* ``--features <cache>``: reuse a saved gallery-embedding cache from
  ``data/image_features/`` and restore only the query encoder.
"""

from __future__ import annotations

import argparse
import base64
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax


def build_engine(args):
    import jax.numpy as jnp

    from art_sbir_tpu.core.checkpoint import load_pytree
    from art_sbir_tpu.core.results import load_results
    from art_sbir_tpu.models.resnet import create_encoder
    from art_sbir_tpu.retrieval.server import (
        MicroBatcher,
        RetrievalEngine,
        engine_from_feature_cache,
    )
    from art_sbir_tpu.train.prepare import finish_gallery_batch
    from art_sbir_tpu.train.triplet import create_train_state

    run_dir = Path(args.results_root) / args.folder
    results = load_results(run_dir)
    data_dict = results.get("data_params", {})
    param_dict = results.get("training_params", {})
    if not args.features and "dataset" not in data_dict:
        raise SystemExit(
            f"results folder {run_dir} has no data_params.json — pass a "
            "trained run folder, or serve a saved gallery with --features")

    loss_type = args.metric or param_dict.get("loss_type", "euclidean")
    model_type = param_dict.get("model_type") or args.folder.split("_")[0]
    with_classification = "with_classification" in model_type or (
        "WithClassification" in args.folder)
    image_size = int(param_dict.get("image_size", 224))

    model = create_encoder(
        with_classification=with_classification,
        num_classes=int(param_dict.get("num_classes", 125)),
        num_classes2=int(param_dict.get("num_classes2", 0)),
        dtype=jnp.bfloat16,
        input_resolution=image_size,
        # runs trained with non-default tower geometry record it in
        # training_params.json; ignoring it would shape-mismatch at restore
        width=int(param_dict.get("width", 64)),
        layers=tuple(param_dict.get("layers", (3, 4, 6, 3))),
    )
    state = create_train_state(model, jax.random.key(0),
                               (1, image_size, image_size, 3))
    ckpt = Path(args.models_root) / args.folder
    if ckpt.exists():
        restored = load_pytree(ckpt, {"params": state.params,
                                      "batch_stats": state.batch_stats})
        state = state.replace(**restored)
    else:
        print(f"Model {args.folder} not found — serving fresh init",
              flush=True)

    params, batch_stats = state.params, state.batch_stats
    resize_mode = param_dict.get("resize_mode")  # else catalog default

    def make_forward(stats):
        # one body, parameterized by the BN running-stats set — the
        # per-modality split below is exactly this one degree of freedom
        def forward(images_uint8):
            x = finish_gallery_batch(images_uint8)
            out = model.apply({"params": params, "batch_stats": stats},
                              x, train=False)
            return out[0] if isinstance(out, tuple) else out
        return forward

    forward = make_forward(batch_stats)

    # Per-modality BN (train/bn.py): a run trained with --bn_recalibrate
    # per_modality exports sketch-population running stats as the
    # `<run>_bn_sketch` sibling; HTTP queries are sketches, so serve them
    # with those stats while the resident gallery keeps the main export's
    # photo-population stats. Without this, a from-scratch bimodal model
    # served over HTTP re-opens the measured MRR 0.078-vs-0.858 gap the
    # offline CLIs already close (PERF.md "BN recalibration").
    query_forward = None
    bn_arg = getattr(args, "bn_stats", "auto") or "auto"
    if bn_arg != "off":
        sib = (Path(args.models_root) / f"{args.folder}_bn_sketch"
               if bn_arg == "auto" else Path(bn_arg))
        if sib.exists():
            query_forward = make_forward(load_pytree(
                sib, {"batch_stats": state.batch_stats})["batch_stats"])
            print(f"query encoder: sketch-population BN stats ({sib})",
                  flush=True)
        elif bn_arg != "auto":
            raise SystemExit(f"--bn_stats {bn_arg}: no export at {sib}")

    # getattr defaults: programmatic callers (tests, embedding apps) may
    # build a partial Namespace; new flags must not break them
    mesh = None
    if getattr(args, "n_devices", 1) > 1:
        from art_sbir_tpu.parallel import data_mesh

        mesh = data_mesh(args.n_devices)
        print(f"serving mesh: {mesh.devices.size} devices "
              "(row-sharded gallery)", flush=True)

    def kw():
        return dict(metric=loss_type, image_size=image_size,
                    resize_mode=resize_mode or "square",
                    k_max=getattr(args, "k_max", 10),
                    max_batch=getattr(args, "max_batch", 32),
                    capacity=getattr(args, "capacity", None),
                    mesh=mesh, quantize=getattr(args, "quantize", False),
                    rerank_factor=getattr(args, "rerank_factor", 4),
                    rerank_dtype=getattr(args, "rerank_dtype", "float32"),
                    ivf_nlist=getattr(args, "ivf_nlist", None),
                    ivf_nprobe=getattr(args, "ivf_nprobe", 0),
                    pq_m=getattr(args, "pq_m", None),
                    pq_rerank=getattr(args, "pq_rerank", "bfloat16"),
                    pq_rerank_factor=getattr(args, "pq_rerank_factor", 64),
                    pq_opq_iters=getattr(args, "pq_opq_iters", 0),
                    index_cache=getattr(args, "index_cache", None),
                    query_forward_fn=query_forward)

    if args.features:
        engine = engine_from_feature_cache(
            forward, args.features, root=args.feature_root, **kw())
    else:
        from art_sbir_tpu.data import get_datasets
        from art_sbir_tpu.data.loader import GalleryLoader
        from art_sbir_tpu.retrieval.embed import embed_batched
        from art_sbir_tpu.retrieval.engine import InferenceCatalog

        dataset = data_dict["dataset"]
        if "Mixed" in dataset and "version" in data_dict:
            dataset = dataset + data_dict["version"]
        _, test_cat = get_datasets(
            dataset=dataset, size=data_dict.get("size", 1.0),
            sketch_type=data_dict.get("sketch_type", "contour_drawings"),
            img_type=data_dict.get("img_type", "photos"),
            img_format=data_dict.get("img_format", "jpg"),
            root=args.data_root,
        )
        # same dedup/ordering as offline eval (engine.run_inference)
        image_paths = InferenceCatalog(test_cat.photo_paths).image_paths
        resize_mode = resize_mode or getattr(test_cat, "resize_mode",
                                             "square")
        loader = GalleryLoader(image_paths, image_size, resize_mode)
        feats = embed_batched(forward, loader, len(loader),
                              args.embed_batch, return_device=True)
        engine = RetrievalEngine(forward, feats, image_paths, **kw())

    return engine, MicroBatcher(engine, window_ms=args.window_ms)


def warmup(engine) -> None:
    """Compile every program a request could hit before binding the
    port: the search program per batch bucket, and — for capacity
    (online) engines — the standalone gallery-embed program ``/add``
    uses, which the search warmup does not necessarily compile (the
    plain capacity route embeds inside the fused search program, and
    per-modality-BN runs embed adds through a separate photo-stats
    jit). Without this the first request of each cold kind pays an XLA
    encoder compile — tens of seconds on a 1-core host."""
    import io

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    s = engine.image_size
    for b in engine.buckets:
        engine.search_arrays(np.zeros((b, s, s, 3), np.uint8))
        if engine.capacity is not None:
            engine._embed_gallery(jnp.zeros((b, s, s, 3), jnp.uint8))
    if engine.capacity is not None and engine.n_valid < engine.capacity:
        # one real add+remove also compiles the row-write programs and
        # (online IVF) the cluster-assignment matmul the HTTP /add path
        # hits; the tombstoned slot is reused by the first real add
        buf = io.BytesIO()
        Image.fromarray(np.zeros((s, s, 3), np.uint8)).save(buf, "PNG")
        name = "__warmup__.png"
        while name in engine.image_paths:  # remove() frees FIRST match
            name = "_" + name
        engine.add_images([(buf.getvalue(), name)])
        engine.remove([name])


def make_handler(engine, batcher):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                # one locked engine snapshot: a lock-free _ivf.stats()
                # racing add_images could cache a stale cluster view
                # into the search path (ADVICE r3)
                self._json(200, engine.health_stats())
            elif self.path == "/stats":
                self._json(200, batcher.stats.snapshot())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/search", "/search_batch", "/add",
                                 "/remove", "/save"):
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n)) if n else {}
                if self.path == "/save":
                    self._json(200, {"folder": engine.save(
                        dataset_name=req.get("dataset_name", "online"))})
                    return
                if self.path == "/remove":
                    freed = engine.remove(req["paths"])
                    self._json(200, {"removed": freed,
                                     "gallery_size": int(engine.n_valid)})
                    return
                if self.path == "/search_batch":
                    # bulk client: the whole batch is ONE device dispatch
                    # (bypasses the micro-batcher; it is already a batch)
                    import numpy as np

                    imgs = np.stack([
                        engine.decode(base64.b64decode(b))
                        for b in req["images_b64"]])
                    vals, idx = engine.search_arrays(imgs)
                    self._json(200, {"results": [
                        engine._result(vals[i], idx[i], req.get("k"))
                        for i in range(len(imgs))]})
                    return
                data = base64.b64decode(req["image_b64"])
                if self.path == "/add":
                    idx = engine.add_images([(data, req["path"])])
                    self._json(200, {"indices": idx,
                                     "gallery_size": int(engine.n_valid)})
                else:
                    out = batcher.search(data, k=req.get("k"))
                    self._json(200, out)
            except TimeoutError as e:  # server-side stall, not a bad request
                self._json(503, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # malformed request or decode failure
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):  # quiet; /stats has the counters
            pass

    return Handler


def main(argv=None):
    from art_sbir_tpu.core.cache import enable_compilation_cache

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-f", "--folder", required=True,
                   help="results run folder (checkpoint + data params)")
    p.add_argument("--features", default=None,
                   help="serve a saved gallery cache from feature_root "
                        "instead of re-embedding the test gallery")
    p.add_argument("--results_root", default="results")
    p.add_argument("--models_root", default="models")
    p.add_argument("--feature_root", default="data/image_features")
    p.add_argument("--data_root", default=None)
    p.add_argument("--metric", default=None,
                   choices=("euclidean", "cosine"),
                   help="override the run's loss_type")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8081)
    p.add_argument("--k_max", type=int, default=10)
    p.add_argument("--capacity", type=int, default=None,
                   help="fixed index capacity; enables online POST /add")
    p.add_argument("--n_devices", type=int, default=1,
                   help="row-shard the resident gallery over this many "
                        "devices (first mesh axis); rows (or capacity) "
                        "must be divisible by it")
    p.add_argument("--quantize", action="store_true",
                   help="int8 candidate scan + exact rerank (ops/quant.py; "
                        "immutable indexes; composes with --n_devices)")
    p.add_argument("--rerank_factor", type=int, default=4,
                   help="quantized candidate count = factor * k_max")
    p.add_argument("--rerank_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 keeps the rerank gallery resident in "
                        "bf16 (0.75 B/elem total vs 1.25 f32) at ~1e-2 "
                        "relative value rounding; quantized mode only")
    p.add_argument("--ivf_nlist", type=int, default=None,
                   help="build an IVF clustered index (ops/ivf.py) and "
                        "probe --ivf_nprobe clusters per query instead of "
                        "a full scan (0 = auto ~2*sqrt(N) clusters); "
                        "approximate — recall set by nprobe, scored "
                        "distances exact; composes with --capacity "
                        "(online IVF: adds assign to the nearest "
                        "centroid, removals tombstone) and with "
                        "--n_devices (sharded IVF: one local index per "
                        "gallery shard, O(B*k) ICI merge; with both, "
                        "centroids are shared and each shard keeps "
                        "mutable local tables)")
    p.add_argument("--ivf_nprobe", type=int, default=0,
                   help="clusters probed per query in --ivf_nlist mode; "
                        "0 (default) = auto-tune at startup (smallest "
                        "power of two reaching 95%% recall@k_max on "
                        "perturbed gallery rows, then DOUBLED: the "
                        "proxy measured one power of two optimistic vs "
                        "real cross-modal queries at 50k/1k-query scale "
                        "— goldens/ann_learned_tpu.json, round 5). The "
                        "fixed nprobe=8 default was retired in round 4 "
                        "(0.84 recall@10 on trained embeddings). Pass a "
                        "measured nprobe when held-out queries exist")
    p.add_argument("--pq_m", type=int, default=None,
                   help="IVF-PQ (ops/pq.py; requires --ivf_nlist): "
                        "product-quantize the gallery to this many uint8 "
                        "codes/row (64 = 64x smaller than f32) and score "
                        "probed candidates via the gather-free ADC scan; "
                        "composes with --n_devices (codes row-sharded, "
                        "per-shard ADC + local rerank)")
    p.add_argument("--pq_rerank", default="bfloat16",
                   choices=["none", "float32", "bfloat16"],
                   help="residency of the exact rows reranking the top "
                        "pq_rerank_factor*k ADC candidates; 'none' DROPS "
                        "the rows (extreme capacity, approximate values)")
    p.add_argument("--pq_rerank_factor", type=int, default=64,
                   help="PQ exact-rerank candidate budget = factor * "
                        "k_max (measured: recall@10 0.44/0.77/0.98 at "
                        "4/16/64 on a 600k adversarial gallery; the "
                        "re-score is cheap O(Q*r*D))")
    p.add_argument("--pq_opq_iters", type=int, default=0,
                   help="train an OPQ rotation for the PQ codes with this "
                        "many alternating iterations (0 = plain residual "
                        "PQ; quality at fixed bytes/row)")
    p.add_argument("--index_cache", default=None,
                   help="directory persisting the built IVF (+PQ) index "
                        "(.npz) — restarts skip the k-means/encode build; "
                        "immutable --ivf_nlist indexes only (single-device "
                        "or sharded via --n_devices)")
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--window_ms", type=float, default=2.0)
    p.add_argument("--embed_batch", type=int, default=256)
    p.add_argument("--bn_stats", default="auto",
                   help="query-side BatchNorm stats for per-modality-"
                        "recalibrated runs (train/bn.py): 'auto' "
                        "(default) loads <models_root>/<folder>_bn_sketch "
                        "when it exists and embeds HTTP queries with "
                        "sketch-population stats; 'off' disables; or an "
                        "explicit export path")
    p.add_argument("--warmup", action="store_true",
                   help="compile every batch-bucket program before "
                        "listening (first requests otherwise pay compiles)")
    args = p.parse_args(argv)

    enable_compilation_cache()
    engine, batcher = build_engine(args)
    if args.warmup:
        warmup(engine)

    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(engine, batcher))
    cap = "" if engine.capacity is None else f" (capacity {engine.capacity})"
    print(f"serving {engine.n_valid}-image gallery{cap} on "
          f"http://{args.host}:{httpd.server_address[1]} "
          f"(metric={engine.metric}, k_max={engine.k_max}, "
          f"max_batch={engine.max_batch})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        httpd.server_close()


if __name__ == "__main__":
    main()
