"""ANN tiers validated on TRAINED-encoder embeddings (VERDICT r3 item 2).

Round 3's serving-tier quality numbers (int8 overlap, IVF nprobe sweeps,
IVF-PQ rerank budgets, ``tune_nprobe``'s perturbed-gallery proxy) were all
measured on synthetic geometry (separated blobs / flat gaussians). This
probe measures the same contracts on the embedding distribution an ACTUAL
trained model emits, at >=50k gallery scale:

1. train the flagship recipe (ModifiedResNet_with_classification, triplet
   loss, reference `train.py:39-98` semantics) on the LEARNABLE corpus via
   the stock ``cli/train.py`` path — the same recipe as
   ``goldens/learn_tpu.json``;
2. embed a >=50k-photo gallery with the trained encoder: the corpus' test
   photos (known sketch pairings) + 50k learnable-generator photos from
   250 UNSEEN shape-composition classes rendered in-memory (distractors —
   gallery scale without >4h of extra training wall-clock);
3. queries = the corpus' test SKETCHES through the same encoder — the
   true cross-modal serving workload, which no synthetic-geometry test
   ever exercised;
4. measure, against the exact scan over the same embeddings:
   int8 top-k overlap (rerank budgets), IVF recall@10 nprobe sweep,
   residual IVF-PQ pure + rerank-budget sweep, and whether the serving
   engine's auto-nprobe proxy (256 perturbed gallery rows + 0.05*std
   noise, ``retrieval/server.py``) predicts the nprobe that real sketch
   queries need.

Writes ``goldens/ann_learned_tpu.json``. Run on the real chip:
``python scripts/probe_ann_learned.py`` (~20 min: ~10 train, ~5 render+
embed, ~3 ANN builds/sweeps). ``--skip_train`` reuses the newest
``models/`` export with matching config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

CORPUS = dict(n_classes=10, photos_per_class=100, sketches_per_photo=2,
              gen_size=128, learnable=True)
IMAGE_SIZE = 128
EPOCHS = 10
N_DISTRACTOR_CLASSES = 250
PHOTOS_PER_DISTRACTOR = 200  # 250 x 200 = 50,000 distractor photos
DISTRACTOR_CLASS_BASE = 1000  # disjoint from the 10 training class ids


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_corpus(root: Path) -> Path:
    from art_sbir_tpu.data.synthetic import make_synthetic_sketchy

    sk = root / "sketchy"
    marker = sk / ".ann_learned_corpus.json"
    if marker.is_file() and json.loads(marker.read_text()) == CORPUS:
        return sk
    make_synthetic_sketchy(
        sk, n_classes=CORPUS["n_classes"],
        photos_per_class=CORPUS["photos_per_class"],
        sketches_per_photo=CORPUS["sketches_per_photo"],
        size=CORPUS["gen_size"], learnable=True)
    marker.write_text(json.dumps(CORPUS))
    return sk


def train(root: Path, results_root: Path, seed: int) -> str:
    """Run the stock train CLI; return the saved model export name."""
    from art_sbir_tpu.cli import train as train_cli

    out_path = train_cli.main([
        "-e", str(EPOCHS), "-b", "32", "-d", "SketchyV2",
        "--model_type", "ModifiedResNet_with_classification",
        "--num_classes", str(CORPUS["n_classes"]),
        "--data_root", str(root), "--image_size", str(IMAGE_SIZE),
        "--split_ratio", "0.5", "-l", "1e-4",
        "--results_root", str(results_root), "--seed", str(seed),
    ])
    return out_path.name  # ResultsWriter.run_name == models/ export name


def load_forward(run_name: str):
    """Rebuild the flagship encoder, load the export, return a jitted
    uint8 (B, S, S, 3) -> (B, D) forward (params passed as arguments —
    CLAUDE.md: never close over large arrays in a jit)."""
    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.core.checkpoint import load_pytree
    from art_sbir_tpu.models.resnet import create_encoder
    from art_sbir_tpu.train.prepare import finish_gallery_batch
    from art_sbir_tpu.train.triplet import create_train_state

    model = create_encoder(
        with_classification=True, num_classes=CORPUS["n_classes"],
        num_classes2=0, dtype=jnp.bfloat16, input_resolution=IMAGE_SIZE)
    state = create_train_state(model, jax.random.key(0),
                               (1, IMAGE_SIZE, IMAGE_SIZE, 3))
    restored = load_pytree(Path("models") / run_name,
                           {"params": state.params,
                            "batch_stats": state.batch_stats})

    @jax.jit
    def _fwd(params, batch_stats, u8):
        x = finish_gallery_batch(u8)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False)
        return out[0] if isinstance(out, tuple) else out

    p, bs = restored["params"], restored["batch_stats"]
    return lambda u8: _fwd(p, bs, u8)


def distractor_loader(start: int, count: int) -> np.ndarray:
    """Render learnable-generator photos for unseen class ids on the fly
    (in-memory: the embedding distribution is what matters here, and
    skipping 50k JPEG encode/decode round-trips keeps the sweep
    host-feasible on this 1-core machine)."""
    from art_sbir_tpu.data.synthetic import _learnable_photo

    out = np.empty((count, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)
    for j in range(count):
        i = start + j
        cls = DISTRACTOR_CLASS_BASE + i // PHOTOS_PER_DISTRACTOR
        out[j] = np.asarray(
            _learnable_photo(cls, i % PHOTOS_PER_DISTRACTOR, IMAGE_SIZE))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/ann_learned")
    ap.add_argument("--results_root", default="results_ann")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_train", default=None,
                    help="reuse this models/ export instead of training")
    ap.add_argument("--out", default="goldens/ann_learned_tpu.json")
    args = ap.parse_args()

    # Unattended ~20-min chip run: probe init + one dispatch first so a
    # wedged relay fails fast instead of blocking the serialized tunnel
    # (ADVICE r4; CLAUDE.md rule for unattended TPU jobs).
    from bench import tpu_reachable

    if not tpu_reachable():
        log("TPU backend unreachable — aborting before the probe")
        sys.exit(2)

    from art_sbir_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    root = ensure_corpus(Path(args.root))
    log(f"corpus at {root}")

    t0 = time.perf_counter()
    if args.skip_train:
        run_name = args.skip_train
    else:
        run_name = train(root, Path(args.results_root), args.seed)
    t_train = time.perf_counter() - t0
    log(f"model export: {run_name} ({t_train:.0f}s)")

    # ---- gallery: test photos (paired) + 50k unseen-class distractors
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.data.catalog import InferenceCatalog
    from art_sbir_tpu.data.loader import GalleryLoader
    from art_sbir_tpu.retrieval.embed import embed_batched

    # size=1.0: the factory's reference-parity default is a 0.1 subsample
    _, test_cat = get_datasets(dataset="SketchyV2", size=1.0,
                               root=str(root), split_ratio=0.5)
    cat = InferenceCatalog(test_cat.photo_paths)
    paired_paths = cat.image_paths
    n_dis = N_DISTRACTOR_CLASSES * PHOTOS_PER_DISTRACTOR
    cache = root.parent / f"embeds_{run_name}.npz"
    gallery = queries = None
    if cache.is_file():
        z = np.load(cache)
        gallery, queries = z["gallery"], z["queries"]
        if gallery.shape[0] != len(paired_paths) + n_dis:
            # Stale cache from a different eval-catalog size (the round-4
            # truncated run cached 77 paired rows) — re-embed, don't crash.
            log(f"embed cache {cache} is for a different catalog "
                f"({gallery.shape[0]:,} rows vs expected "
                f"{len(paired_paths) + n_dis:,}) — re-embedding")
            gallery = queries = None
        else:
            log(f"embeddings loaded from {cache}: gallery "
                f"{gallery.shape[0]:,}, queries {queries.shape[0]:,}")
    if gallery is None:
        forward = load_forward(run_name)
        loader = GalleryLoader(paired_paths, IMAGE_SIZE,
                               getattr(test_cat, "resize_mode", "square"))
        t0 = time.perf_counter()
        g_paired = embed_batched(forward, loader, len(loader), 256,
                                 jit_apply=False)
        g_dis = embed_batched(forward, distractor_loader, n_dis, 256,
                              jit_apply=False)
        gallery = np.concatenate([g_paired, g_dis]).astype(np.float32)
        log(f"gallery embedded: {gallery.shape[0]:,} rows "
            f"({len(paired_paths)} paired + {n_dis:,} distractors, "
            f"{time.perf_counter() - t0:.0f}s)")

        qloader = GalleryLoader(test_cat.sketch_paths, IMAGE_SIZE,
                                getattr(test_cat, "resize_mode", "square"))
        queries = np.asarray(
            embed_batched(forward, qloader, len(qloader), 256,
                          jit_apply=False), np.float32)
        log(f"queries embedded: {queries.shape[0]:,} sketches")
        np.savez(cache, gallery=gallery, queries=queries)
        log(f"embeddings cached to {cache} (flapping-chip retries skip "
            f"the embed sweep)")

    # ---- trained-ness: MRR of each sketch's paired photo in the FULL
    # 50.5k gallery (rank = 1 + #(closer rows)), vs the chance yardstick
    pos_of = {Path(p).stem: i for i, p in enumerate(paired_paths)}
    pos = np.array([pos_of[Path(s).stem.rsplit("-", 1)[0]]
                    for s in test_cat.sketch_paths], np.int32)
    g_dev = jnp.asarray(gallery)
    q_dev = jnp.asarray(queries)

    @jax.jit
    def _ranks(q, g, p):
        # ||q-g||^2 via the Gram form — the naive broadcasted difference
        # would materialize a (B, N, D) tensor (26 GB at this scale)
        d = ((q * q).sum(-1, keepdims=True)
             - 2.0 * q @ g.T + (g * g).sum(-1)[None, :])
        dp = jnp.take_along_axis(d, p[:, None], axis=1)
        return 1 + (d < dp).sum(1)

    ranks = np.concatenate([
        np.asarray(_ranks(q_dev[i:i + 128], g_dev,
                          jnp.asarray(pos[i:i + 128])))
        for i in range(0, len(pos), 128)])
    mrr = float(np.mean(1.0 / ranks))
    n = gallery.shape[0]
    chance = (np.log(n) + 0.5772156649) / n
    log(f"trained-encoder MRR over {n:,} gallery: {mrr:.4f} "
        f"(chance {chance:.2e}, {mrr / chance:.0f}x) | "
        f"recall@1 {float(np.mean(ranks == 1)):.3f} "
        f"recall@10 {float(np.mean(ranks <= 10)):.3f}")

    # ---- exact top-10 over the learned embeddings = ANN ground truth
    from art_sbir_tpu.ops.distance import retrieve_chunked

    _, _, exact = retrieve_chunked(
        q_dev, g_dev, jnp.zeros(queries.shape[0], jnp.int32), k=10,
        chunk=256)
    exact = np.asarray(exact)

    from art_sbir_tpu.ops.quant import (quantize_gallery,
                                        retrieve_quantized_chunked,
                                        topk_overlap)

    results = {
        "run_name": run_name, "corpus": CORPUS,
        "image_size": IMAGE_SIZE, "epochs": EPOCHS,
        "n_gallery": int(n), "n_paired": len(paired_paths),
        "n_distractors": int(n_dis), "n_queries": int(queries.shape[0]),
        "mrr": mrr, "chance_mrr": float(chance),
        "recall_at_1": float(np.mean(ranks == 1)),
        "recall_at_10": float(np.mean(ranks <= 10)),
    }
    if not args.skip_train:
        # With --skip_train, t_train is the wall time of an argparse
        # lookup — preserve the recorded value instead (ADVICE r4).
        results["train_wall_s"] = round(t_train, 1)

    # ---- int8 tier: overlap vs exact at the serving rerank budgets
    qg = quantize_gallery(g_dev)
    results["int8_overlap"] = {}
    for rf in (4, 8):
        _, ids = retrieve_quantized_chunked(q_dev, qg, g_dev, k=10,
                                            rerank_factor=rf)
        ov = topk_overlap(ids, exact)
        results["int8_overlap"][f"r{rf * 10}"] = round(float(ov), 4)
        log(f"int8 top-10 overlap (rerank r={rf * 10}): {ov:.4f}")

    # ---- IVF tier: nprobe sweep with REAL sketch queries
    from art_sbir_tpu.ops.ivf import build_ivf, ivf_search, tune_nprobe

    t0 = time.perf_counter()
    index = build_ivf(g_dev, None)
    log(f"IVF built: nlist={index.nlist} ({time.perf_counter() - t0:.0f}s)")
    results["ivf_nlist"] = int(index.nlist)
    results["ivf_recall"] = {}
    for nprobe in (1, 2, 4, 8, 16, 32):
        _, ids = ivf_search(q_dev, index, g_dev, nprobe=nprobe, k=10)
        rec = topk_overlap(ids, exact)
        results["ivf_recall"][str(nprobe)] = round(float(rec), 4)
        log(f"IVF recall@10 nprobe={nprobe:>2}: {rec:.4f}")

    # ---- does the serving engine's proxy predict the real-query nprobe?
    # exact recipe from retrieval/server.py: 256 sampled gallery rows +
    # 0.05*std gaussian noise, target 0.95
    prng = np.random.default_rng(0)
    sel = prng.integers(0, n, 256)
    rows = gallery[sel]
    proxy = rows + 0.05 * rows.std() * prng.standard_normal(
        rows.shape).astype(np.float32)
    from art_sbir_tpu.ops.ivf import apply_nprobe_margin

    np_proxy = tune_nprobe(index, g_dev, jnp.asarray(proxy), k=10)
    np_real = tune_nprobe(index, g_dev, q_dev, k=10)
    # what the serving engine actually deploys: the SHARED margin
    # application (tune_nprobe calls the same helper with the same
    # default, so the golden's operating point cannot drift from the
    # server's — neither the factor nor the formula)
    np_serving = apply_nprobe_margin(np_proxy, index.nlist)
    _, ids = ivf_search(q_dev, index, g_dev, nprobe=np_proxy, k=10)
    real_at_proxy = float(topk_overlap(ids, exact))
    _, ids = ivf_search(q_dev, index, g_dev, nprobe=np_serving, k=10)
    real_at_serving = float(topk_overlap(ids, exact))
    results["tune_nprobe"] = {
        "proxy_choice": int(np_proxy), "real_query_choice": int(np_real),
        "real_recall_at_proxy_choice": round(real_at_proxy, 4),
        "serving_choice": int(np_serving),
        "real_recall_at_serving_choice": round(real_at_serving, 4),
    }
    log(f"tune_nprobe: proxy picks {np_proxy}, real sketch queries need "
        f"{np_real}; real recall at the proxy's pick: {real_at_proxy:.4f};"
        f" served (margin=2) nprobe={np_serving}: {real_at_serving:.4f}")

    # ---- residual IVF-PQ tier: pure + rerank-budget sweep. Swept at
    # nprobe=8 AND the proxy-tuned nprobe: at nprobe=8 the PQ recall is
    # CAPPED by the IVF probe recall above (a true neighbor outside the
    # probed clusters can never be reranked back), so separating probe
    # misses from ADC misses needs the higher-nprobe column.
    from art_sbir_tpu.ops.pq import build_ivf_pq, ivf_pq_search

    t0 = time.perf_counter()
    cb, codes = build_ivf_pq(g_dev, index, 64)
    log(f"residual IVF-PQ built (m=64, {time.perf_counter() - t0:.0f}s)")
    g_bf16 = g_dev.astype(jnp.bfloat16)
    results["ivf_pq_recall"] = {}
    for nprobe in sorted({8, int(np_proxy), int(np_serving)}):
        _, ids = ivf_pq_search(q_dev, index, codes, cb, nprobe=nprobe,
                               k=10)
        rec = topk_overlap(ids, exact)
        results["ivf_pq_recall"][f"np{nprobe}_pure"] = round(float(rec), 4)
        log(f"IVF-PQ recall@10 pure (nprobe={nprobe}): {rec:.4f}")
        for rf in (4, 16, 64):
            _, ids = ivf_pq_search(q_dev, index, codes, cb, nprobe=nprobe,
                                   k=10, rows=g_bf16, rerank_factor=rf)
            rec = topk_overlap(ids, exact)
            results["ivf_pq_recall"][f"np{nprobe}_r{rf * 10}"] = round(
                float(rec), 4)
            log(f"IVF-PQ recall@10 rerank r={rf * 10:>4} "
                f"(nprobe={nprobe}): {rec:.4f}")

    # ---- OPQ on LEARNED residuals: round 3 measured OPQ neutral on
    # isotropic synthetic residuals and predicted value on correlated
    # real embeddings — this is the first correlated corpus to test it
    t0 = time.perf_counter()
    cb_o, codes_o = build_ivf_pq(g_dev, index, 64, opq_iters=8)
    log(f"OPQ residual IVF-PQ built (m=64, opq_iters=8, "
        f"{time.perf_counter() - t0:.0f}s)")
    for rf, tag in ((0, "pure"), (64, "r640")):
        kw = {} if rf == 0 else {"rows": g_bf16, "rerank_factor": rf}
        _, ids = ivf_pq_search(q_dev, index, codes_o, cb_o,
                               nprobe=int(np_serving), k=10, **kw)
        rec = topk_overlap(ids, exact)
        results["ivf_pq_recall"][f"opq_np{int(np_serving)}_{tag}"] = round(
            float(rec), 4)
        log(f"OPQ IVF-PQ recall@10 {tag} (nprobe={int(np_serving)}): "
            f"{rec:.4f}")

    results["backend"] = jax.default_backend()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    # MERGE into an existing golden (top level, plus one level deep for
    # the sweep dicts) so a partial/interrupted rerun can't silently drop
    # recorded fields (ADVICE r4). A same-run_name rerun overwrites the
    # keys it measured and keeps the rest; a new run_name starts fresh.
    if out.is_file():
        prior = json.loads(out.read_text())
        if prior.get("run_name") == results["run_name"]:
            for k, v in results.items():
                if isinstance(v, dict) and isinstance(prior.get(k), dict):
                    prior[k].update(v)
                    results[k] = prior[k]
            merged = dict(prior)
            merged.update(results)
            results = merged
    out.write_text(json.dumps(results, indent=2, sort_keys=True))
    print(json.dumps({k: results[k] for k in
                      ("n_gallery", "mrr", "int8_overlap", "tune_nprobe")}))
    log(f"golden written to {out}")


if __name__ == "__main__":
    main()
