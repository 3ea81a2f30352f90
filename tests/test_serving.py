"""Serving engine + HTTP CLI: resident gallery, micro-batched queries.

The reference has no serving path (its `inference.py` is an offline eval
loop); these tests lock the deployment engine's contracts: self-retrieval
through real image bytes, bucket-padding exactness, request coalescing,
and the stdlib HTTP front-end end-to-end over a real trained run folder.
"""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from art_sbir_tpu.data.synthetic import make_synthetic_sketchy


def _png_bytes(arr_u8: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tiny_engine():
    """Mean-pool 'encoder' over 16 distinct solid-color images: top-1 of a
    query made from image i's own bytes must be i."""
    import jax.numpy as jnp

    from art_sbir_tpu.retrieval.server import RetrievalEngine

    rng = np.random.default_rng(0)
    size = 16
    imgs = rng.integers(0, 255, size=(16, size, size, 3)).astype(np.uint8)

    def forward(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return x.reshape(x.shape[0], -1)

    feats = np.asarray(forward(jnp.asarray(imgs)))
    paths = [f"gallery/img_{i}.png" for i in range(16)]
    eng = RetrievalEngine(forward, feats, paths, metric="euclidean",
                          image_size=size, k_max=5, max_batch=8)
    return eng, imgs


def test_engine_self_retrieval_through_bytes(tiny_engine):
    eng, imgs = tiny_engine
    for i in (0, 7, 15):
        out = eng.search(_png_bytes(imgs[i]))
        assert out["paths"][0] == f"gallery/img_{i}.png"
        assert out["distances"][0] == pytest.approx(0.0, abs=1e-3)
        assert out["distances"] == sorted(out["distances"])
        assert len(out["paths"]) == 5


def test_engine_bucket_padding_exact(tiny_engine):
    """A 3-query batch (padded to bucket 4) must equal three 1-query
    calls; pad rows never leak into real rows' results."""
    eng, imgs = tiny_engine
    vals3, idx3 = eng.search_arrays(imgs[[2, 9, 4]])
    assert vals3.shape == (3, 5)
    for row, i in enumerate((2, 9, 4)):
        v1, i1 = eng.search_arrays(imgs[i][None])
        np.testing.assert_array_equal(idx3[row], i1[0])
        # different batch shapes contract differently in XLA; near-zero
        # self-distances are sqrt(cancellation noise), so abs tolerance is
        # sqrt(ulp(||q||^2)) ~ 1e-2 — the index agreement above is the
        # strong (exact) part of this contract
        np.testing.assert_allclose(vals3[row], v1[0], rtol=1e-5, atol=2e-2)
        assert idx3[row, 0] == i


def test_engine_k_clamped_to_gallery(tiny_engine):
    eng, imgs = tiny_engine
    out = eng.search(_png_bytes(imgs[0]), k=100)  # > k_max -> clamped
    assert len(out["paths"]) == eng.k_max


def test_microbatcher_coalesces_concurrent_queries(tiny_engine):
    from art_sbir_tpu.retrieval.server import MicroBatcher

    eng, imgs = tiny_engine
    batcher = MicroBatcher(eng, window_ms=30.0)
    try:
        results = {}

        def worker(i):
            results[i] = batcher.search(_png_bytes(imgs[i]), k=1)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i in range(8):
            assert results[i]["paths"] == [f"gallery/img_{i}.png"]
        s = batcher.stats.snapshot()
        assert s["requests"] == 8
        # 8 concurrent requests within a 30 ms window must share dispatches
        assert s["batches"] < 8, s
        assert s["mean_batch"] > 1.0
    finally:
        batcher.close()


def test_microbatcher_surfaces_decode_errors(tiny_engine):
    from art_sbir_tpu.retrieval.server import MicroBatcher

    eng, _ = tiny_engine
    batcher = MicroBatcher(eng, window_ms=0.0)
    try:
        with pytest.raises(Exception):
            batcher.search(b"not an image")
    finally:
        batcher.close()


def test_engine_rejects_mismatched_paths():
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    with pytest.raises(ValueError, match="paths"):
        RetrievalEngine(lambda x: x, np.zeros((4, 2), np.float32),
                        ["a", "b"], image_size=8)


# ------------------------------------------------------------ HTTP e2e


@pytest.fixture(scope="module")
def served_run(tmp_path_factory):
    """Train one epoch on synthetic Sketchy (the cli/train e2e recipe),
    then build the serve CLI's engine over the produced run folder."""
    import argparse
    import os

    from art_sbir_tpu.cli.serve import build_engine, make_handler
    from art_sbir_tpu.cli.train import main as train_main

    root = tmp_path_factory.mktemp("serve_e2e")
    sketchy = make_synthetic_sketchy(root / "sketchy")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        out = train_main([
            "-e", "1", "-b", "4", "-d", "SketchyV1",
            "--model_type", "ModifiedResNet",
            "--data_root", str(sketchy), "--image_size", "64",
            "--inference",  # writes inference.json — the offline-quality
            "--results_root", str(root / "results"),  # yardstick below
        ])
        args = argparse.Namespace(
            folder=out.name, features=None,
            results_root=str(root / "results"), models_root="models",
            feature_root="data/image_features", data_root=str(sketchy),
            metric=None, k_max=5, max_batch=4, window_ms=1.0,
            embed_batch=32, capacity=None, n_devices=1, quantize=False)
        engine, batcher = build_engine(args)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    make_handler(engine, batcher))
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        port = httpd.server_address[1]
        yield engine, port, sketchy
        httpd.shutdown()
        batcher.close()
    finally:
        os.chdir(cwd)


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_cli_http_end_to_end(served_run):
    engine, port, sketchy = served_run

    code, health = _get(port, "/healthz")
    assert code == 200 and health["status"] == "ok"
    assert health["gallery_size"] == engine.gallery.shape[0] > 0

    sketch = next((Path(sketchy) / "sketches_png").rglob("*.png"))
    code, out = _post(port, "/search",
                      {"image_b64": base64.b64encode(
                          sketch.read_bytes()).decode(), "k": 3})
    assert code == 200, out
    # k clamps to the (tiny synthetic) test gallery size
    assert len(out["paths"]) == min(3, health["gallery_size"])
    assert out["distances"] == sorted(out["distances"])
    gallery_set = set(engine.image_paths)
    assert all(p in gallery_set for p in out["paths"])

    code, stats = _get(port, "/stats")
    assert code == 200 and stats["requests"] >= 1

    code, err = _post(port, "/search", {"image_b64": "!!notbase64"})
    assert code == 400 and "error" in err

    code, _ = _get(port, "/nope")
    assert code == 404


def test_engine_fused_route_matches_xla(tiny_engine, monkeypatch):
    """Above the crossover the engine streams through the Pallas kernel
    (O(B) state) — force the route by shrinking the threshold and check
    indices and (sqrt-folded) distances match the XLA-route engine."""
    import art_sbir_tpu.retrieval.rank as rank_mod
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    monkeypatch.setattr(rank_mod, "FUSED_GALLERY_THRESHOLD", 1)
    fused = RetrievalEngine(
        eng._forward, np.asarray(eng.gallery), eng.image_paths,
        metric="euclidean", image_size=eng.image_size, k_max=5, max_batch=8)
    assert fused.use_fused and not eng.use_fused

    vals_f, idx_f = fused.search_arrays(imgs[[3, 11]])
    vals_x, idx_x = eng.search_arrays(imgs[[3, 11]])
    np.testing.assert_array_equal(idx_f, idx_x)
    np.testing.assert_allclose(vals_f, vals_x, rtol=1e-4, atol=2e-2)
    assert idx_f[0, 0] == 3 and idx_f[1, 0] == 11


def test_engine_from_feature_cache_roundtrip(tmp_path, tiny_engine):
    """The --features serving mode: a saved gallery cache (npy + paths CSV,
    reference utils.py:265-284 layout) rebuilds an equivalent engine."""
    import jax.numpy as jnp

    from art_sbir_tpu.retrieval.embed import save_image_features
    from art_sbir_tpu.retrieval.server import engine_from_feature_cache

    eng, imgs = tiny_engine
    folder = save_image_features(
        "TinyModel", "TinySet", eng.image_paths, np.asarray(eng.gallery),
        root=tmp_path)
    eng2 = engine_from_feature_cache(
        eng._forward, folder, root=tmp_path, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8)
    out = eng2.search(_png_bytes(imgs[5]))
    assert out["paths"][0] == "gallery/img_5.png"
    assert eng2.image_paths == eng.image_paths


def test_engine_rejects_empty_gallery():
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    with pytest.raises(ValueError, match="empty"):
        RetrievalEngine(lambda x: x, np.zeros((0, 4), np.float32), [],
                        image_size=8)


# ------------------------------------------------------- online index

def _mk_capacity_engine(imgs, n0, capacity, **kw):
    import jax.numpy as jnp

    from art_sbir_tpu.retrieval.server import RetrievalEngine

    def forward(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return x.reshape(x.shape[0], -1)

    s = imgs.shape[1] if imgs.ndim == 4 else 16
    if n0:
        feats = np.asarray(forward(jnp.asarray(imgs[:n0])))
    else:
        feats = np.zeros((0, s * s * 3), np.float32)
    return RetrievalEngine(
        forward, feats, [f"gallery/img_{i}.png" for i in range(n0)],
        metric="euclidean", image_size=s, k_max=10,
        max_batch=8, capacity=capacity, **kw), forward


def test_engine_online_add(tiny_engine):
    """capacity mode: adds are visible to subsequent searches, empty
    slots never appear in results, and results clamp to n_valid."""
    _, imgs = tiny_engine
    eng, _ = _mk_capacity_engine(imgs, n0=2, capacity=8)

    out = eng.search(_png_bytes(imgs[1]))
    assert out["paths"][0] == "gallery/img_1.png"
    assert len(out["paths"]) == 2  # only 2 live rows despite k_max=8

    idx = eng.add_images([(_png_bytes(imgs[i]), f"added/img_{i}.png")
                          for i in (5, 6, 7)])
    assert idx == [2, 3, 4]

    out = eng.search(_png_bytes(imgs[6]))
    assert out["paths"][0] == "added/img_6.png"
    assert len(out["paths"]) == 5  # 2 initial + 3 added, never the pads
    assert all(np.isfinite(out["distances"]))


def test_engine_add_overflow_and_immutable(tiny_engine):
    _, imgs = tiny_engine
    eng, _ = _mk_capacity_engine(imgs, n0=2, capacity=3)
    eng.add_images([(_png_bytes(imgs[9]), "a.png")])
    with pytest.raises(ValueError, match="full"):
        eng.add_images([(_png_bytes(imgs[10]), "b.png")])

    immutable, _ = tiny_engine
    with pytest.raises(ValueError, match="immutable"):
        immutable.add_images([(_png_bytes(imgs[0]), "c.png")])


def test_engine_capacity_empty_start(tiny_engine):
    """An online index can start empty: searches return nothing until
    the first add."""
    _, imgs = tiny_engine
    eng, _ = _mk_capacity_engine(imgs[:0], n0=0, capacity=4)
    out = eng.search(_png_bytes(imgs[0]))
    assert out["paths"] == [] and out["distances"] == []
    eng.add_images([(_png_bytes(imgs[0]), "first.png")])
    out = eng.search(_png_bytes(imgs[0]))
    assert out["paths"] == ["first.png"]


def test_http_add_endpoint(tiny_engine):
    """POST /add over HTTP against a capacity-mode engine; searches see
    the new row; an immutable engine answers 400."""
    from art_sbir_tpu.cli.serve import make_handler
    from art_sbir_tpu.retrieval.server import MicroBatcher

    _, imgs = tiny_engine
    eng, _ = _mk_capacity_engine(imgs, n0=2, capacity=8)
    batcher = MicroBatcher(eng, window_ms=0.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(eng, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        b64 = base64.b64encode(_png_bytes(imgs[12])).decode()
        code, out = _post(port, "/add", {"image_b64": b64,
                                         "path": "new/img_12.png"})
        assert code == 200 and out["indices"] == [2]
        assert out["gallery_size"] == 3

        code, res = _post(port, "/search", {"image_b64": b64, "k": 1})
        assert code == 200 and res["paths"] == ["new/img_12.png"]

        code, health = _get(port, "/healthz")
        assert health["gallery_size"] == 3 and health["capacity"] == 8
    finally:
        httpd.shutdown()
        batcher.close()


def test_engine_save_reload_roundtrip(tmp_path, tiny_engine):
    """An online index persists as a standard feature cache and reloads
    into an equivalent immutable engine."""
    from art_sbir_tpu.retrieval.server import engine_from_feature_cache

    _, imgs = tiny_engine
    eng, forward = _mk_capacity_engine(imgs, n0=2, capacity=8)
    eng.add_images([(_png_bytes(imgs[4]), "added/img_4.png")])
    folder = eng.save(root=tmp_path)

    eng2 = engine_from_feature_cache(
        forward, folder, root=tmp_path, metric="euclidean",
        image_size=16, k_max=3, max_batch=4)
    assert eng2.n_valid == 3
    out = eng2.search(_png_bytes(imgs[4]))
    assert out["paths"][0] == "added/img_4.png"


def test_microbatcher_bad_k_fails_only_its_request(tiny_engine):
    """A malformed per-request k (non-int JSON number) must fail only that
    request — batchmates coalesced into the same dispatch still succeed."""
    from art_sbir_tpu.retrieval.server import MicroBatcher

    eng, imgs = tiny_engine
    batcher = MicroBatcher(eng, window_ms=30.0)
    try:
        results = {}

        def good(i):
            results[i] = batcher.search(_png_bytes(imgs[i]), k=1)

        def bad():
            try:
                batcher.search(_png_bytes(imgs[0]), k="three")
                results["bad"] = "no error"
            except Exception as e:
                results["bad"] = e

        threads = [threading.Thread(target=good, args=(i,))
                   for i in (1, 2)] + [threading.Thread(target=bad)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert isinstance(results["bad"], Exception), results["bad"]
        for i in (1, 2):
            assert results[i]["paths"] == [f"gallery/img_{i}.png"]
    finally:
        batcher.close()


# ------------------------------------------------------- sharded serving

def test_engine_row_sharded_matches_unsharded(tiny_engine):
    """A mesh-served engine (row-sharded resident gallery, XLA all-gathers
    the (B, k) partials) returns exactly the unsharded engine's results."""
    import jax.numpy as jnp

    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    sharded = RetrievalEngine(
        eng._forward, np.asarray(eng.gallery), eng.image_paths,
        metric="euclidean", image_size=eng.image_size, k_max=5,
        max_batch=8, mesh=data_mesh(8))
    v0, i0 = eng.search_arrays(imgs[[3, 11, 7]])
    v1, i1 = sharded.search_arrays(imgs[[3, 11, 7]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=2e-2)


def test_engine_sharded_online_adds(tiny_engine):
    """capacity + mesh: online adds write into the row-sharded buffer
    under GSPMD and are immediately searchable."""
    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    _, imgs = tiny_engine
    eng8, _ = _mk_capacity_engine(imgs, n0=2, capacity=8)
    # rebuild the same index sharded
    import jax.numpy as jnp

    sharded = RetrievalEngine(
        eng8._forward, np.asarray(eng8.gallery[:2]), eng8.image_paths[:2],
        metric="euclidean", image_size=16, k_max=10, max_batch=8,
        capacity=8, mesh=data_mesh(8))
    idx = sharded.add_images([(_png_bytes(imgs[i]), f"added/img_{i}.png")
                              for i in (5, 6, 7)])
    assert idx == [2, 3, 4]
    out = sharded.search(_png_bytes(imgs[6]))
    assert out["paths"][0] == "added/img_6.png"
    assert len(out["paths"]) == 5  # live rows only


def test_engine_sharded_requires_divisible_rows(tiny_engine):
    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, _ = tiny_engine
    with pytest.raises(ValueError, match="divisible"):
        RetrievalEngine(eng._forward, np.asarray(eng.gallery[:6]),
                        eng.image_paths[:6], image_size=16,
                        mesh=data_mesh(8))


def test_engine_fused_sharded_route(tiny_engine, monkeypatch):
    """mesh + past-crossover gallery: the engine streams each shard
    through the Pallas sweep (interpret on CPU) and merges the (B, k)
    partials — results match the plain XLA engine."""
    import jax.numpy as jnp

    import art_sbir_tpu.retrieval.rank as rank_mod
    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    _, imgs = tiny_engine

    def forward(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return x.reshape(x.shape[0], -1)

    rng = np.random.default_rng(5)
    gal = rng.standard_normal((1024, 16 * 16 * 3)).astype(np.float32)
    paths = [f"g/{i}.jpg" for i in range(1024)]
    plain = RetrievalEngine(forward, gal, paths, image_size=16, k_max=5,
                            max_batch=8)
    monkeypatch.setattr(rank_mod, "FUSED_GALLERY_THRESHOLD", 512)
    fused = RetrievalEngine(forward, gal, paths, image_size=16, k_max=5,
                            max_batch=8, mesh=data_mesh(8))
    assert fused.use_fused
    v0, i0 = plain.search_arrays(imgs[[0, 9]])
    v1, i1 = fused.search_arrays(imgs[[0, 9]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-4, atol=2e-2)


def test_engine_remove_and_slot_reuse(tiny_engine):
    """Removals tombstone immediately (no recompiles) and later adds
    reuse the freed slot; save persists only live rows."""
    _, imgs = tiny_engine
    eng, forward = _mk_capacity_engine(imgs, n0=3, capacity=4)

    out = eng.search(_png_bytes(imgs[1]))
    assert out["paths"][0] == "gallery/img_1.png"

    freed = eng.remove(["gallery/img_1.png"])
    assert freed == [1] and eng.n_valid == 2
    out = eng.search(_png_bytes(imgs[1]))
    assert "gallery/img_1.png" not in out["paths"]
    assert len(out["paths"]) == 2

    # the freed slot is reused before untouched capacity
    idx = eng.add_images([(_png_bytes(imgs[9]), "reused.png")])
    assert idx == [1] and eng.n_valid == 3
    out = eng.search(_png_bytes(imgs[9]))
    assert out["paths"][0] == "reused.png"

    with pytest.raises(KeyError, match="not in index"):
        eng.remove(["gallery/img_1.png"])  # already tombstoned


def test_engine_save_excludes_removed(tmp_path, tiny_engine):
    from art_sbir_tpu.retrieval.server import engine_from_feature_cache

    _, imgs = tiny_engine
    eng, forward = _mk_capacity_engine(imgs, n0=3, capacity=8)
    eng.remove(["gallery/img_0.png"])
    folder = eng.save(root=tmp_path)
    eng2 = engine_from_feature_cache(
        forward, folder, root=tmp_path, metric="euclidean",
        image_size=16, k_max=3, max_batch=4)
    assert eng2.n_valid == 2
    assert "gallery/img_0.png" not in eng2.image_paths


def test_http_remove_endpoint(tiny_engine):
    from art_sbir_tpu.cli.serve import make_handler
    from art_sbir_tpu.retrieval.server import MicroBatcher

    _, imgs = tiny_engine
    eng, _ = _mk_capacity_engine(imgs, n0=3, capacity=8)
    batcher = MicroBatcher(eng, window_ms=0.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(eng, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        code, out = _post(port, "/remove",
                          {"paths": ["gallery/img_2.png"]})
        assert code == 200 and out == {"removed": [2], "gallery_size": 2}
        code, out = _post(port, "/remove", {"paths": ["nope.png"]})
        assert code == 400
    finally:
        httpd.shutdown()
        batcher.close()


def test_serve_cli_features_mode(served_run, tmp_path):
    """build_engine's --features branch: restore only the query encoder
    and serve a saved gallery cache instead of re-embedding."""
    import argparse

    from art_sbir_tpu.cli.serve import build_engine

    engine, port, sketchy = served_run
    folder = engine.save(root=tmp_path)

    args = argparse.Namespace(
        folder=Path(engine._run_folder).name if hasattr(
            engine, "_run_folder") else None,
        features=folder, results_root="results", models_root="models",
        feature_root=str(tmp_path), data_root=str(sketchy),
        metric=None, k_max=5, max_batch=4, window_ms=1.0,
        embed_batch=32, capacity=None, n_devices=1, quantize=False)
    # reuse the fixture's run folder name (cwd is restored outside the
    # fixture, so resolve the run folder from its results_root)
    runs = sorted(Path(sketchy).parent.glob("results/*"))
    args.folder = runs[0].name
    args.results_root = str(Path(sketchy).parent / "results")
    import os

    cwd = os.getcwd()
    os.chdir(Path(sketchy).parent)  # models/ + caches live there
    try:
        eng2, batcher2 = build_engine(args)
        assert eng2.n_valid == engine.n_valid
        assert eng2.image_paths == engine.image_paths
        q = next((Path(sketchy) / "sketches_png").rglob("*.png"))
        out = eng2.search(q.read_bytes())
        assert len(out["paths"]) >= 1
        batcher2.close()
    finally:
        os.chdir(cwd)


def test_http_search_batch(tiny_engine):
    """Bulk endpoint: one dispatch for a client-supplied batch; per-query
    results in order."""
    from art_sbir_tpu.cli.serve import make_handler
    from art_sbir_tpu.retrieval.server import MicroBatcher

    eng, imgs = tiny_engine
    batcher = MicroBatcher(eng, window_ms=0.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(eng, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        b64 = lambda i: base64.b64encode(_png_bytes(imgs[i])).decode()
        code, out = _post(port, "/search_batch",
                          {"images_b64": [b64(4), b64(12), b64(0)], "k": 1})
        assert code == 200
        tops = [r["paths"][0] for r in out["results"]]
        assert tops == ["gallery/img_4.png", "gallery/img_12.png",
                        "gallery/img_0.png"]
    finally:
        httpd.shutdown()
        batcher.close()


def test_engine_quantized_route_matches_xla(tiny_engine):
    """quantize=True (int8 candidate scan + exact rerank) reproduces the
    exact engine's indices on self-retrieval queries."""
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    q8 = RetrievalEngine(
        eng._forward, np.asarray(eng.gallery), eng.image_paths,
        metric="euclidean", image_size=eng.image_size, k_max=5,
        max_batch=8, quantize=True)
    v0, i0 = eng.search_arrays(imgs[[2, 13]])
    v1, i1 = q8.search_arrays(imgs[[2, 13]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-4, atol=2e-2)

    with pytest.raises(ValueError, match="immutable"):
        RetrievalEngine(eng._forward, np.asarray(eng.gallery),
                        eng.image_paths, image_size=16, capacity=32,
                        quantize=True)


def test_engine_quantized_fused_route(tiny_engine, monkeypatch):
    """Above the crossover the quantized engine streams candidates
    through the int8 Pallas kernel (retrieve_quantized_fused) instead of
    materializing the (B, N) approx-score matrix; results must match the
    XLA-scan quantized engine exactly (same candidates by construction)."""
    import art_sbir_tpu.retrieval.rank as rank_mod
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    q_xla = RetrievalEngine(
        eng._forward, np.asarray(eng.gallery), eng.image_paths,
        metric="euclidean", image_size=eng.image_size, k_max=5,
        max_batch=8, quantize=True)
    assert not q_xla._quant_fused

    monkeypatch.setattr(rank_mod, "QUANT_FUSED_GALLERY_THRESHOLD", 1)
    q_str = RetrievalEngine(
        eng._forward, np.asarray(eng.gallery), eng.image_paths,
        metric="euclidean", image_size=eng.image_size, k_max=5,
        max_batch=8, quantize=True)
    assert q_str._quant_fused

    v0, i0 = q_xla.search_arrays(imgs[[2, 13, 7]])
    v1, i1 = q_str.search_arrays(imgs[[2, 13, 7]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-6)


def test_engine_quantized_sharded_route(tiny_engine):
    """quantize=True composes with mesh=: the int8 gallery row-shards and
    each chip scans + reranks its own rows; results must match the
    single-device quantized engine on self-retrieval queries."""
    import jax

    from art_sbir_tpu.parallel.mesh import MeshSpec
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    mesh = MeshSpec(data=len(jax.devices())).build()
    gal = np.asarray(eng.gallery)
    q_one = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=2, max_batch=8, quantize=True)
    q_mesh = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=2, max_batch=8, mesh=mesh,
        quantize=True)
    v0, i0 = q_one.search_arrays(imgs[[1, 9, 13]])
    v1, i1 = q_mesh.search_arrays(imgs[[1, 9, 13]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="per-shard gallery size"):
        # 16 rows over 8 shards = 2/shard < k_max=5
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, k_max=5, max_batch=8,
                        mesh=mesh, quantize=True)


def test_engine_quantized_bf16_rerank(tiny_engine):
    """rerank_dtype='bfloat16' keeps the rerank gallery resident in bf16
    (capacity mode: 0.75 B/elem total); candidate selection is unchanged
    and top-k indices must match the f32-rerank engine on self-retrieval,
    values within bf16 row rounding."""
    import jax.numpy as jnp

    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    q_f32 = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8, quantize=True)
    q_bf16 = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8, quantize=True,
        rerank_dtype="bfloat16")
    assert q_bf16.gallery.dtype == jnp.bfloat16
    v0, i0 = q_f32.search_arrays(imgs[[3, 8]])
    v1, i1 = q_bf16.search_arrays(imgs[[3, 8]])
    np.testing.assert_array_equal(i0, i1)
    # bf16 row rounding puts an ABSOLUTE floor on near-zero distances:
    # the self-match is ~0 in f32 but ~||x - bf16(x)||_2 ~ 0.004*||x||
    # with bf16 rows (~0.02-0.05 here), so atol must cover that floor.
    np.testing.assert_allclose(v0, v1, rtol=2e-2, atol=8e-2)

    with pytest.raises(ValueError, match="rerank_dtype"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, quantize=True,
                        rerank_dtype="int8")
    with pytest.raises(ValueError, match="quantize=True"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size,
                        rerank_dtype="bfloat16")


def test_engine_ivf_route(tiny_engine):
    """ivf_nlist= serves through the clustered probe (ops/ivf.py): with
    nprobe == nlist results match the exact engine; self-retrieval stays
    exact at nprobe=1 on this tiny gallery; invalid compositions raise."""
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    full = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8,
        ivf_nlist=4, ivf_nprobe=4)
    assert full._ivf is not None and not full.use_fused
    assert full._ivf.stats()["nlist"] == 4
    v0, i0 = eng.search_arrays(imgs[[2, 13, 7]])
    v1, i1 = full.search_arrays(imgs[[2, 13, 7]])
    np.testing.assert_array_equal(i0, i1)
    # near-zero self-match distances: the engine's (B, N) program uses the
    # expanded matmul form whose f32 cancellation floor is ~1e-2 absolute;
    # the IVF scorer's row-wise form is exact there (2.8e-5 = the eps
    # floor) — so compare with the cancellation-floor tolerance
    np.testing.assert_allclose(v0, v1, rtol=1e-4, atol=2e-2)

    # nprobe=1: the self-match lives in the probed (nearest) cluster, so
    # top-1 self-retrieval survives the approximation
    one = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8,
        ivf_nlist=4, ivf_nprobe=1)
    out = one.search(_png_bytes(imgs[9]))
    assert out["paths"][0] == "gallery/img_9.png"
    # fewer candidates than k is legal: +inf pad rows are filtered
    assert 1 <= len(out["paths"]) <= 5

    with pytest.raises(ValueError, match="non-empty"):
        RetrievalEngine(eng._forward, gal[:0], [],
                        image_size=eng.image_size, capacity=32,
                        ivf_nlist=4)
    with pytest.raises(ValueError, match="compose"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, quantize=True,
                        ivf_nlist=4)


def test_engine_ivf_auto_nlist(tiny_engine):
    """ivf_nlist=0 auto-sizes (~2*sqrt(N)) and still serves correctly."""
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    auto = RetrievalEngine(
        eng._forward, np.asarray(eng.gallery), eng.image_paths,
        metric="euclidean", image_size=eng.image_size, k_max=5,
        max_batch=8, ivf_nlist=0, ivf_nprobe=8)
    assert auto._ivf.nlist == 8  # 2*sqrt(16)
    out = auto.search(_png_bytes(imgs[4]))
    assert out["paths"][0] == "gallery/img_4.png"


def test_engine_ivf_auto_nprobe(tiny_engine):
    """ivf_nprobe=0 auto-tunes at startup (ops/ivf.py::tune_nprobe on a
    perturbed-gallery proxy): resolves to a concrete nprobe in
    [1, nlist], and the tuned engine still self-retrieves. Covers both
    the immutable and the online (capacity) IVF branches."""
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    auto = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8,
        ivf_nlist=4, ivf_nprobe=0)
    assert 1 <= auto._ivf_nprobe <= auto._ivf.nlist
    out = auto.search(_png_bytes(imgs[11]))
    assert out["paths"][0] == "gallery/img_11.png"

    online = RetrievalEngine(
        eng._forward, gal, list(eng.image_paths), metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8, capacity=24,
        ivf_nlist=4, ivf_nprobe=0)
    assert 1 <= online._ivf_nprobe <= online._ivf.nlist
    out = online.search(_png_bytes(imgs[6]))
    assert out["paths"][0] == "gallery/img_6.png"


def test_engine_sharded_ivf_route(tiny_engine):
    """mesh + ivf_nlist: one local index per gallery shard
    (ops/ivf.py::ShardedIVF); full probe matches the exact engine,
    auto-nprobe composes, invalid compositions raise."""
    from art_sbir_tpu.ops.ivf import ShardedIVF
    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    sharded = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=2, max_batch=8, mesh=data_mesh(8),
        ivf_nlist=2, ivf_nprobe=2)  # 2 rows/shard on the 8-device mesh
    assert isinstance(sharded._ivf, ShardedIVF)
    assert sharded._ivf.n_shards == 8
    # full probe (nprobe == nlist) == exact engine
    v0, i0 = eng.search_arrays(imgs[[3, 11, 7]])
    v1, i1 = sharded.search_arrays(imgs[[3, 11, 7]])
    np.testing.assert_array_equal(i0[:, :2], i1)
    np.testing.assert_allclose(v0[:, :2], v1, rtol=1e-4, atol=2e-2)
    out = sharded.search(_png_bytes(imgs[13]))
    assert out["paths"][0] == "gallery/img_13.png"

    # /healthz reports the sharded index stats (ShardedIVF.stats())
    from art_sbir_tpu.cli.serve import make_handler
    from art_sbir_tpu.retrieval.server import MicroBatcher

    batcher = MicroBatcher(sharded, window_ms=0.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(sharded, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        code, health = _get(httpd.server_address[1], "/healthz")
        assert code == 200
        assert health["ivf"]["n_shards"] == 8
        assert health["ivf"]["rows_per_shard"] == 2
        assert health["ivf"]["nprobe"] == 2
    finally:
        httpd.shutdown()
        batcher.close()

    # auto-nprobe through the sharded probe
    auto = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=2, max_batch=8, mesh=data_mesh(8),
        ivf_nlist=2, ivf_nprobe=0)
    assert 1 <= auto._ivf_nprobe <= 2
    out = auto.search(_png_bytes(imgs[5]))
    assert out["paths"][0] == "gallery/img_5.png"

    with pytest.raises(ValueError, match="exceeds the per-shard"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, k_max=5,
                        mesh=data_mesh(8), ivf_nlist=2)


def test_engine_ivf_pq_routes(tiny_engine):
    """pq_m + ivf_nlist (IVF-PQ): full probe + rerank covering the whole
    candidate set matches the exact engine; pq_rerank='none' drops the
    rows (extreme capacity) yet still self-retrieves, and save()
    refuses; invalid compositions raise."""
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    pq = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8,
        ivf_nlist=4, ivf_nprobe=4, pq_m=4, pq_rerank_factor=1000,
        pq_rerank="float32")
    v0, i0 = eng.search_arrays(imgs[[2, 13, 7]])
    v1, i1 = pq.search_arrays(imgs[[2, 13, 7]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-4, atol=2e-2)

    pure = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8,
        ivf_nlist=4, ivf_nprobe=4, pq_m=4, pq_rerank="none")
    assert pure.gallery is None  # codes + cluster table are the index
    out = pure.search(_png_bytes(imgs[9]))
    assert out["paths"][0] == "gallery/img_9.png"
    with pytest.raises(ValueError, match="dropped"):
        pure.save()

    opq = RetrievalEngine(  # OPQ variant: rotation threads through
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=5, max_batch=8,
        ivf_nlist=4, ivf_nprobe=4, pq_m=4, pq_rerank_factor=1000,
        pq_rerank="float32", pq_opq_iters=2)
    assert opq._pq[0].rotation is not None
    v2, i2 = opq.search_arrays(imgs[[2, 13, 7]])
    np.testing.assert_array_equal(i0, i2)

    with pytest.raises(ValueError, match="requires ivf_nlist"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, pq_m=4)
    with pytest.raises(ValueError, match="immutable"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, ivf_nlist=4, pq_m=4,
                        capacity=32)
    with pytest.raises(ValueError, match="pq_rerank"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, ivf_nlist=4, pq_m=4,
                        pq_rerank="int8")


def test_engine_index_cache_roundtrip(tiny_engine, tmp_path, monkeypatch):
    """index_cache= persists the built IVF+PQ index: a second engine
    with identical parameters loads it (the k-means/encode build never
    runs — asserted by poisoning the builders), serves identically, and
    a parameter mismatch falls back to a rebuild."""
    import art_sbir_tpu.ops.ivf as ivf_mod
    import art_sbir_tpu.ops.pq as pq_mod
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    kw = dict(metric="euclidean", image_size=eng.image_size, k_max=5,
              max_batch=8, ivf_nlist=4, ivf_nprobe=4, pq_m=4,
              pq_rerank_factor=1000, pq_rerank="float32",
              index_cache=tmp_path / "idx")
    first = RetrievalEngine(eng._forward, gal, eng.image_paths, **kw)
    assert (tmp_path / "idx" / "ivf.npz").exists()
    assert (tmp_path / "idx" / "pq.npz").exists()
    v0, i0 = first.search_arrays(imgs[[3, 11]])

    def boom(*a, **k):
        raise AssertionError("build ran despite a valid cache")

    monkeypatch.setattr(ivf_mod, "build_ivf", boom)
    monkeypatch.setattr(pq_mod, "build_ivf_pq", boom)
    second = RetrievalEngine(eng._forward, gal, eng.image_paths, **kw)
    v1, i1 = second.search_arrays(imgs[[3, 11]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6, atol=1e-6)
    monkeypatch.undo()

    # parameter mismatch (different m) -> cache rejected, rebuild works
    third = RetrievalEngine(eng._forward, gal, eng.image_paths,
                            **{**kw, "pq_m": 2})
    out = third.search(_png_bytes(imgs[6]))
    assert out["paths"][0] == "gallery/img_6.png"

    with pytest.raises(ValueError, match="index_cache"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size,
                        index_cache=tmp_path / "x")
    with pytest.raises(ValueError, match="index_cache"):
        RetrievalEngine(eng._forward, gal, eng.image_paths,
                        image_size=eng.image_size, ivf_nlist=4,
                        capacity=32, index_cache=tmp_path / "x")


def test_engine_online_ivf_churn(tiny_engine):
    """capacity + ivf_nlist (ONLINE IVF): stays result-identical to the
    full-scan online engine through adds, removals, and freed-slot reuse
    (full probe, so any divergence is a routing/bookkeeping bug)."""
    from art_sbir_tpu.ops.ivf import OnlineIVF

    _, imgs = tiny_engine
    ref, _ = _mk_capacity_engine(imgs, n0=6, capacity=16)
    ivf, _ = _mk_capacity_engine(imgs, n0=6, capacity=16,
                                 ivf_nlist=3, ivf_nprobe=3)
    assert isinstance(ivf._ivf, OnlineIVF) and not ivf.use_fused

    def check(queries):
        for i in queries:
            a = ref.search(_png_bytes(imgs[i]))
            b = ivf.search(_png_bytes(imgs[i]))
            assert a["paths"] == b["paths"]
            np.testing.assert_allclose(a["distances"], b["distances"],
                                       rtol=1e-4, atol=2e-2)

    check((0, 5))
    for eng in (ref, ivf):
        slots = eng.add_images([(_png_bytes(imgs[i]), f"added/{i}.png")
                                for i in (8, 9, 10)])
        assert slots == [6, 7, 8]
    check((1, 8, 10))
    for eng in (ref, ivf):
        eng.remove(["gallery/img_2.png", "added/9.png"])
    check((2, 9, 4))
    for eng in (ref, ivf):  # freed slots reused, cluster slots recycled
        eng.add_images([(_png_bytes(imgs[12]), "added/12.png")])
    check((12, 0, 9))
    st = ivf._ivf.stats()
    assert st["live_rows"] == 6 + 3 - 2 + 1 == ivf.n_valid
    assert st["spill_used"] == 0


def test_engine_sharded_online_ivf_churn(tiny_engine):
    """mesh + capacity + ivf_nlist (sharded ONLINE IVF,
    ops/ivf.py::ShardedOnlineIVF): stays result-identical to the
    full-scan online engine through adds, removals, and freed-slot
    reuse (full probe), with adds landing in shards that started empty."""
    from art_sbir_tpu.ops.ivf import ShardedOnlineIVF
    from art_sbir_tpu.parallel import data_mesh

    _, imgs = tiny_engine
    ref, _ = _mk_capacity_engine(imgs, n0=6, capacity=80)
    ivf, _ = _mk_capacity_engine(imgs, n0=6, capacity=80,
                                 mesh=data_mesh(8), ivf_nlist=3,
                                 ivf_nprobe=3)  # 10 slots/shard
    assert isinstance(ivf._ivf, ShardedOnlineIVF)
    assert ivf._ivf.n_shards == 8 and ivf._ivf.cap_local == 10

    def check(queries):
        for i in queries:
            a = ref.search(_png_bytes(imgs[i]))
            b = ivf.search(_png_bytes(imgs[i]))
            assert a["paths"] == b["paths"]
            np.testing.assert_allclose(a["distances"], b["distances"],
                                       rtol=1e-4, atol=2e-2)

    check((0, 5))
    for eng in (ref, ivf):  # slots 6..12 span shards 0 and 1
        slots = eng.add_images([(_png_bytes(imgs[i]), f"added/{i}.png")
                                for i in (8, 9, 10, 11, 12, 13, 14)])
        assert slots == list(range(6, 13))
    check((1, 8, 12))
    for eng in (ref, ivf):
        eng.remove(["gallery/img_2.png", "added/9.png", "added/12.png"])
    check((2, 9, 4))
    for eng in (ref, ivf):  # freed slots reused, cluster slots recycled
        eng.add_images([(_png_bytes(imgs[12]), "re/12.png")])
    check((12, 0, 9))
    st = ivf._ivf.stats()
    assert st["live_rows"] == 6 + 7 - 3 + 1 == ivf.n_valid
    assert st["n_shards"] == 8 and st["rows_per_shard"] == 10

    # auto-nprobe composes with the sharded online probe
    auto, _ = _mk_capacity_engine(imgs, n0=6, capacity=80,
                                  mesh=data_mesh(8), ivf_nlist=3,
                                  ivf_nprobe=0)
    assert 1 <= auto._ivf_nprobe <= 3
    out = auto.search(_png_bytes(imgs[4]))
    assert out["paths"][0] == "gallery/img_4.png"


def test_engine_sharded_index_cache_roundtrip(tiny_engine, tmp_path,
                                              monkeypatch):
    """index_cache persists the sharded IVF: a second engine with the
    same mesh/params loads it (the per-shard k-means never runs), serves
    identically; a different mesh size rejects the cache and rebuilds."""
    import art_sbir_tpu.ops.ivf as ivf_mod
    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    kw = dict(metric="euclidean", image_size=eng.image_size, k_max=2,
              max_batch=8, ivf_nlist=2, ivf_nprobe=2,
              index_cache=tmp_path / "sidx")
    first = RetrievalEngine(eng._forward, gal, eng.image_paths,
                            mesh=data_mesh(8), **kw)
    assert (tmp_path / "sidx" / "ivf_sharded.npz").exists()
    v0, i0 = first.search_arrays(imgs[[3, 11]])

    def boom(*a, **k):
        raise AssertionError("sharded build ran despite a valid cache")

    monkeypatch.setattr(ivf_mod, "build_ivf", boom)
    second = RetrievalEngine(eng._forward, gal, eng.image_paths,
                             mesh=data_mesh(8), **kw)
    v1, i1 = second.search_arrays(imgs[[3, 11]])
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6, atol=1e-6)
    monkeypatch.undo()

    # mesh-size mismatch (n_shards/n_local guards) -> rebuild, not reuse
    other = RetrievalEngine(eng._forward, gal, eng.image_paths,
                            mesh=data_mesh(4), **kw)
    out = other.search(_png_bytes(imgs[6]))
    assert out["paths"][0] == "gallery/img_6.png"


def test_engine_sharded_pq_route(tiny_engine, tmp_path, monkeypatch):
    """pq_m composes with mesh (sharded IVF-PQ): full probe + a rerank
    budget covering every candidate equals the exact engine; rows-dropped
    pure mode still self-retrieves; index_cache persists BOTH the sharded
    IVF and the PQ codes (second engine skips both builds)."""
    import art_sbir_tpu.ops.ivf as ivf_mod
    import art_sbir_tpu.ops.pq as pq_mod
    from art_sbir_tpu.parallel import data_mesh
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    gal = np.asarray(eng.gallery)
    kw = dict(metric="euclidean", image_size=eng.image_size, k_max=2,
              max_batch=8, ivf_nlist=2, ivf_nprobe=2, pq_m=4,
              pq_rerank_factor=1000, pq_rerank="float32",
              index_cache=tmp_path / "spq")
    spq = RetrievalEngine(eng._forward, gal, eng.image_paths,
                          mesh=data_mesh(8), **kw)
    assert (tmp_path / "spq" / "ivf_sharded.npz").exists()
    assert (tmp_path / "spq" / "pq_sharded.npz").exists()
    v0, i0 = eng.search_arrays(imgs[[2, 13, 7]])
    v1, i1 = spq.search_arrays(imgs[[2, 13, 7]])
    np.testing.assert_array_equal(i0[:, :2], i1)
    np.testing.assert_allclose(v0[:, :2], v1, rtol=1e-4, atol=2e-2)

    def boom(*a, **k):
        raise AssertionError("build ran despite a valid cache")

    monkeypatch.setattr(ivf_mod, "build_ivf", boom)
    monkeypatch.setattr(pq_mod, "build_ivf_pq_sharded", boom)
    second = RetrievalEngine(eng._forward, gal, eng.image_paths,
                             mesh=data_mesh(8), **kw)
    v2, i2 = second.search_arrays(imgs[[2, 13, 7]])
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-6)
    monkeypatch.undo()

    pure = RetrievalEngine(
        eng._forward, gal, eng.image_paths, metric="euclidean",
        image_size=eng.image_size, k_max=2, max_batch=8, ivf_nlist=2,
        ivf_nprobe=2, pq_m=4, pq_rerank="none", mesh=data_mesh(8))
    assert pure.gallery is None
    out = pure.search(_png_bytes(imgs[9]))
    assert out["paths"][0] == "gallery/img_9.png"


def test_served_quality_equals_offline(served_run):
    """The HTTP path's retrieval quality equals run_inference's on the
    same trained run (VERDICT r4 item 7): every test-catalog sketch is
    queried through the serving engine at full-gallery k and the MRR
    computed from the served rankings must equal inference.json's (same
    gallery, same queries, same positive-rank definition 1 + #closer)."""
    import argparse
    import os

    from art_sbir_tpu.cli.serve import build_engine
    from art_sbir_tpu.data import get_datasets
    from art_sbir_tpu.retrieval.rank import positive_indices

    engine, port, sketchy = served_run
    root = Path(sketchy).parent
    run = sorted((root / "results").glob("*"))[0]
    offline = json.loads((run / "inference.json").read_text())
    data_params = json.loads((run / "data_params.json").read_text())

    args = argparse.Namespace(
        folder=run.name, features=None,
        results_root=str(root / "results"), models_root="models",
        feature_root="data/image_features", data_root=str(sketchy),
        metric=None, k_max=10_000, max_batch=4, window_ms=1.0,
        embed_batch=32, capacity=None, n_devices=1, quantize=False)
    cwd = os.getcwd()
    os.chdir(root)  # models/ lives under the fixture root
    try:
        eng, batcher = build_engine(args)
        batcher.close()
        _, test_cat = get_datasets(
            dataset=data_params["dataset"],
            size=data_params.get("size", 1.0), root=str(sketchy))
        imgs = np.stack([eng.decode(Path(p).read_bytes())
                         for p in test_cat.sketch_paths])
        vals, idx = eng.search_arrays(imgs)  # full-gallery ranking
        pos = positive_indices(test_cat.sketch_paths, eng.image_paths)
        assert (pos >= 0).all()
        ranks = []
        for j, p in enumerate(pos):
            d_pos = vals[j][idx[j] == p][0]
            ranks.append(1 + int((vals[j] < d_pos).sum()))
        mrr_served = float(np.mean(1.0 / np.asarray(ranks)))
        assert abs(mrr_served - offline["mean_reciprocal_rank"]) < 1e-6, (
            mrr_served, offline["mean_reciprocal_rank"])
    finally:
        os.chdir(cwd)


def test_serve_cli_bn_stats(tmp_path, monkeypatch):
    """Per-modality BN reaches the serving path (VERDICT r4 item 2): a
    run trained with --bn_recalibrate per_modality exports sketch-
    population stats as `<run>_bn_sketch`; build_engine auto-detects the
    sibling and embeds HTTP queries with it while the gallery keeps
    photo-population stats. Locked: (a) the served results equal an
    engine given the sibling's stats EXPLICITLY via query_forward_fn —
    same compiled program, so bit-equality proves auto-detection loads
    exactly the recalibrated stats (the serving path then inherits the
    offline MRR recovery test_bn_recalibrate locks), (b) --bn_stats off
    serves shared stats and measurably diverges, (c) a bad explicit
    path fails fast."""
    import argparse

    import jax
    import jax.numpy as jnp

    from art_sbir_tpu.cli.serve import build_engine
    from art_sbir_tpu.cli.train import main as train_main
    from art_sbir_tpu.core.checkpoint import load_pytree
    from art_sbir_tpu.models.resnet import create_encoder
    from art_sbir_tpu.train.prepare import finish_gallery_batch
    from art_sbir_tpu.train.triplet import create_train_state

    monkeypatch.chdir(tmp_path)
    sketchy = make_synthetic_sketchy(tmp_path / "sketchy")
    out = train_main([
        "-e", "1", "-b", "4", "-d", "SketchyV1",
        "--model_type", "ModifiedResNet", "--width", "8",
        "--layers", "1", "1", "1", "1",
        "--data_root", str(sketchy), "--image_size", "64",
        "--bn_recalibrate", "per_modality",
        "--results_root", str(tmp_path / "results"),
    ])

    def mk_args(**over):
        base = dict(
            folder=out.name, features=None,
            results_root=str(tmp_path / "results"), models_root="models",
            feature_root="data/image_features", data_root=str(sketchy),
            metric=None, k_max=8, max_batch=4, window_ms=1.0,
            embed_batch=32, capacity=None, n_devices=1, quantize=False)
        base.update(over)
        return argparse.Namespace(**base)

    eng, batcher = build_engine(mk_args())  # bn_stats defaults to auto
    batcher.close()
    assert eng.per_modality_bn is True
    assert eng.health_stats()["per_modality_bn"] is True

    sketch = next((Path(sketchy) / "sketches_png").rglob("*.png"))
    img = eng.decode(sketch.read_bytes())[None]
    vals, idx = eng.search_arrays(img)

    # oracle: the same engine program, but with the sibling's stats
    # loaded by hand and injected through the public query_forward_fn
    # seam — identical HLO + identical inputs => bit-equal results iff
    # build_engine auto-loaded exactly these stats
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    model = create_encoder(dtype=jnp.bfloat16, input_resolution=64,
                           width=8, layers=(1, 1, 1, 1))
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3))
    restored = load_pytree(Path("models") / out.name,
                           {"params": state.params,
                            "batch_stats": state.batch_stats})
    sk_stats = load_pytree(
        Path("models") / f"{out.name}_bn_sketch",
        {"batch_stats": state.batch_stats})["batch_stats"]

    def fwd_with(stats):
        def fwd(images_uint8):
            o = model.apply(
                {"params": restored["params"], "batch_stats": stats},
                finish_gallery_batch(images_uint8), train=False)
            return o[0] if isinstance(o, tuple) else o
        return fwd

    oracle = RetrievalEngine(
        fwd_with(restored["batch_stats"]), np.asarray(eng.gallery),
        eng.image_paths, metric=eng.metric, image_size=64,
        k_max=eng.k_max, max_batch=4,
        query_forward_fn=fwd_with(sk_stats))
    ov, oi = oracle.search_arrays(img)
    np.testing.assert_array_equal(idx[0], oi[0])
    np.testing.assert_allclose(vals[0], ov[0], rtol=0, atol=0)

    # --bn_stats off: shared running stats, a genuinely different query
    # embedding (the modality gap the sibling exists to close)
    eng_off, b_off = build_engine(mk_args(bn_stats="off"))
    b_off.close()
    assert eng_off.per_modality_bn is False
    vals_off, _ = eng_off.search_arrays(img)
    assert not np.allclose(vals[0], vals_off[0], rtol=1e-5, atol=1e-5)
    # the resident gallery itself is shared (photo stats both ways)
    np.testing.assert_allclose(np.asarray(eng.gallery),
                               np.asarray(eng_off.gallery))

    with pytest.raises(SystemExit):
        build_engine(mk_args(bn_stats=str(tmp_path / "nope")))

    # --features mode auto-detects the sibling too (the bn block keys
    # off args.folder, which names the query encoder in both modes):
    # served results must equal the folder-mode engine's bit-for-bit
    cache_folder = eng.save(root=tmp_path / "feats")
    eng_f, b_f = build_engine(mk_args(
        features=cache_folder, feature_root=str(tmp_path / "feats")))
    b_f.close()
    assert eng_f.per_modality_bn is True
    fv, fi = eng_f.search_arrays(img)
    np.testing.assert_array_equal(idx[0], fi[0])
    np.testing.assert_allclose(vals[0], fv[0], rtol=0, atol=0)


def test_warmup_compiles_gallery_embed(tiny_engine):
    """cli/serve.py::warmup must pre-compile the STANDALONE gallery-
    embed program for capacity (online) engines — the search warmup
    alone leaves it cold on the plain capacity route (the fused search
    program embeds inline), so the first /add would pay an encoder
    compile despite --warmup (round-5 review finding)."""
    import jax.numpy as jnp

    from art_sbir_tpu.cli.serve import warmup
    from art_sbir_tpu.retrieval.server import RetrievalEngine

    eng, imgs = tiny_engine
    feats = np.asarray(eng.gallery, np.float32)

    def forward(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return x.reshape(x.shape[0], -1)

    cap = RetrievalEngine(forward, feats, list(eng.image_paths),
                          metric="euclidean", image_size=eng.image_size,
                          k_max=5, max_batch=8, capacity=32)
    n0 = int(cap.n_valid)
    warmup(cap)
    # every /add bucket shape is already in the gallery-embed jit cache
    traced = cap._embed_gallery._cache_size()
    assert traced >= len(cap.buckets), (traced, cap.buckets)
    # the real add+remove warm cycle leaves the index unchanged (the
    # tombstoned slot is reused) and the row-write programs compiled
    assert int(cap.n_valid) == n0
    assert cap._set_row._cache_size() >= 1
    slot = cap.add_images([(_png_bytes(np.zeros(
        (cap.image_size, cap.image_size, 3), np.uint8)), "real.png")])
    assert slot == [n0]  # the warmup slot was freed for reuse
    # and an immutable engine warms without touching the add path
    imm = RetrievalEngine(forward, feats, list(eng.image_paths),
                          metric="euclidean", image_size=eng.image_size,
                          k_max=5, max_batch=8)
    warmup(imm)
    out = imm.search(_png_bytes(imgs[3]))
    assert out["paths"][0] == "gallery/img_3.png"
