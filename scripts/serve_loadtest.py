"""Load-test the HTTP serving stack end-to-end (in-process server).

Builds the flagship serving setup — bf16 ModifiedResNet50 query encoder
with the PRODUCTION preprocessing (`train.prepare.finish_gallery_batch`,
the same forward `cli/serve.py` builds) + a random (N, 1024) resident
gallery — starts `cli/serve`'s HTTP handler on an ephemeral localhost
port IN THIS PROCESS (one process owns the chip; see CLAUDE.md on the
tunnel serializing clients), then hammers it with concurrent client
threads posting base64 PNG queries.

Reports per-request latency percentiles (client-observed, full stack:
HTTP + base64 + PIL decode + micro-batch window + device dispatch + one
host drain) and the achieved qps, plus the server's coalescing counters
and any failed requests (a failure count != 0 means the numbers are not
clean).

Usage: python scripts/serve_loadtest.py [--clients 8] [--seconds 20]
       [--gallery 10000] [--window_ms 2] [--image_size 224] [--cpu]
       [--churn] [--quantize] [--ivf_nlist N [--pq_m M]] [--n_devices S]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EMBED_DIM = 1024  # ModifiedResNet50 output_dim — the gallery must match
REQUEST_TIMEOUT_S = 600  # covers a cold compile behind a stalled request


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--gallery", type=int, default=10_000)
    p.add_argument("--window_ms", type=float, default=2.0)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke mode)")
    p.add_argument("--quantize", action="store_true",
                   help="serve the int8 quantized index (candidate scan + "
                        "exact rerank); mutually exclusive with --churn")
    p.add_argument("--rerank_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bf16-resident rerank gallery (quantize only)")
    p.add_argument("--churn", action="store_true",
                   help="run the gallery as an online index and mutate it "
                        "(add/remove via HTTP) from one extra thread while "
                        "the search clients hammer it")
    p.add_argument("--ivf_nlist", type=int, default=None,
                   help="serve through an IVF clustered index (ops/ivf.py; "
                        "0 = auto nlist); composes with --churn (online "
                        "IVF) but not --quantize")
    p.add_argument("--ivf_nprobe", type=int, default=0,
                   help="0 = auto-tune at startup — matches the shipped "
                        "cli/serve.py / RetrievalEngine default (ADVICE "
                        "r4: loadtests must measure the configuration "
                        "that actually ships)")
    p.add_argument("--pq_m", type=int, default=None,
                   help="IVF-PQ codes/row (requires --ivf_nlist; "
                        "ops/pq.py)")
    p.add_argument("--pq_rerank", default="bfloat16",
                   choices=["none", "float32", "bfloat16"])
    p.add_argument("--pq_rerank_factor", type=int, default=64)
    p.add_argument("--pq_opq_iters", type=int, default=0)
    p.add_argument("--index_cache", default=None,
                   help="directory persisting the IVF/PQ index across "
                        "restarts (immutable --ivf_nlist only)")
    p.add_argument("--n_devices", type=int, default=1,
                   help="row-shard the resident gallery over a 1-D mesh "
                        "of this many devices (sharded exact/int8/IVF/"
                        "IVF-PQ serving routes; on CPU use "
                        "--xla_force_host_platform_device_count)")
    p.add_argument("--report_window_s", type=float, default=0.0,
                   help="also report p50/p95/p99 per time window of this "
                        "many seconds (soak mode: latency drift over the "
                        "run, VERDICT r3 item 8)")
    p.add_argument("--soak_out", default=None,
                   help="write the windowed soak artifact (JSON) here")
    p.add_argument("--clustered", action="store_true",
                   help="blob-structured synthetic gallery (realistic "
                        "image-embedding geometry — the regime IVF's "
                        "recall contract is written for) instead of the "
                        "flat gaussian")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from art_sbir_tpu.cli.serve import make_handler
    from art_sbir_tpu.core.cache import enable_compilation_cache
    from art_sbir_tpu.models.resnet import ModifiedResNet
    from art_sbir_tpu.retrieval.server import MicroBatcher, RetrievalEngine
    from art_sbir_tpu.train.prepare import finish_gallery_batch

    enable_compilation_cache()
    s = args.image_size
    model = ModifiedResNet(dtype=jnp.bfloat16, input_resolution=s)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((8, s, s, 3), jnp.float32), train=False)

    def forward(im_u8):
        # the exact serving forward (cli/serve.py::build_engine)
        return model.apply(variables, finish_gallery_batch(im_u8),
                           train=False)

    rng = np.random.default_rng(0)
    if args.clustered:
        nb = max(4, int(np.sqrt(args.gallery)))
        centers = 4.0 * rng.standard_normal((nb, EMBED_DIM))
        gallery = (centers[rng.integers(0, nb, args.gallery)]
                   + 0.5 * rng.standard_normal((args.gallery, EMBED_DIM))
                   ).astype(np.float32)
    else:
        gallery = rng.standard_normal(
            (args.gallery, EMBED_DIM)).astype(np.float32)
    if args.quantize and args.churn:
        raise SystemExit("--quantize serves immutable indexes; drop --churn")
    mesh = None
    if args.n_devices > 1:
        from art_sbir_tpu.parallel import data_mesh

        # the engine shards the RESIDENT row count: capacity (gallery+64)
        # under --churn, the raw gallery otherwise
        rows = args.gallery + 64 if args.churn else args.gallery
        if rows % args.n_devices:
            raise SystemExit(
                f"resident rows {rows} ({'--gallery + 64 churn capacity' if args.churn else '--gallery'}) "
                f"must be divisible by --n_devices {args.n_devices}")
        mesh = data_mesh(args.n_devices)
    engine = RetrievalEngine(
        forward, gallery, [f"img_{i}" for i in range(args.gallery)],
        image_size=s, k_max=10, max_batch=args.max_batch,
        capacity=args.gallery + 64 if args.churn else None,
        quantize=args.quantize, rerank_dtype=args.rerank_dtype,
        ivf_nlist=args.ivf_nlist, ivf_nprobe=args.ivf_nprobe,
        pq_m=args.pq_m, pq_rerank=args.pq_rerank,
        pq_rerank_factor=args.pq_rerank_factor,
        pq_opq_iters=args.pq_opq_iters,
        index_cache=args.index_cache, mesh=mesh)
    if engine._ivf is not None:
        log(f"IVF index: {engine._ivf.stats()} | serving nprobe="
            f"{engine._ivf_nprobe}"
            + (" (auto-tuned)" if args.ivf_nprobe == 0 else ""))
    if engine._pq is not None:
        cb = engine._pq[0]
        log(f"PQ: m={cb.m} k={cb.k_codes} ({cb.m} B/row); rows "
            f"{'dropped' if engine.gallery is None else engine.gallery.dtype}")
    batcher = MicroBatcher(engine, window_ms=args.window_ms)

    log(f"warming compile for all batch buckets {engine.buckets}...")
    for b in engine.buckets:
        engine.search_arrays(np.zeros((b, s, s, 3), np.uint8))
    if args.churn:  # the add path uses the standalone embed program
        engine.add_images([(png_bytes(rng, s, Image), "warm_add.png")])
        engine.remove(["warm_add.png"])

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(engine, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    log(f"serving on :{port}; {args.clients} clients x {args.seconds}s")

    # distinct query images, pre-encoded to base64 PNG on the client side
    payloads = []
    for i in range(args.clients):
        payloads.append(json.dumps({
            "image_b64": base64.b64encode(png_bytes(rng, s, Image)).decode(),
            "k": 10}).encode())

    latencies: list = []
    failures = [0]
    lock = threading.Lock()
    stop = threading.Event()

    def post(url: str, data: bytes) -> None:
        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=REQUEST_TIMEOUT_S) as r:
            json.loads(r.read())

    def client(i: int) -> None:
        url = f"http://127.0.0.1:{port}/search"
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                post(url, payloads[i])
            except Exception as e:  # count, keep hammering
                with lock:
                    failures[0] += 1
                log(f"client {i} request failed: {type(e).__name__}: {e}")
                continue
            t1 = time.perf_counter()
            with lock:
                latencies.append((t1, t1 - t0))

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    mutations = [0]
    if args.churn:
        def churner():
            url = f"http://127.0.0.1:{port}"
            b64 = base64.b64encode(png_bytes(rng, s, Image)).decode()
            i = 0
            while not stop.is_set():
                name = f"churn_{i}.png"
                try:
                    post(f"{url}/add", json.dumps(
                        {"image_b64": b64, "path": name}).encode())
                    post(f"{url}/remove",
                         json.dumps({"paths": [name]}).encode())
                    mutations[0] += 2
                except Exception as e:
                    with lock:
                        failures[0] += 1
                    log(f"churner failed: {type(e).__name__}: {e}")
                i += 1
                time.sleep(0.05)

        threads.append(threading.Thread(target=churner, daemon=True))
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:  # daemon threads: a stuck request can't hang exit
        t.join(timeout=60)
    elapsed = time.perf_counter() - t_start

    with lock:
        rows_lat = np.asarray(latencies, np.float64).reshape(-1, 2)
        n_fail = failures[0]
    lat = np.sort(rows_lat[:, 1])
    stats = batcher.stats.snapshot()
    if not len(lat):
        log(f"NO successful requests ({n_fail} failures) — no numbers")
        print(json.dumps({"metric": "serving_http_qps", "value": 0.0,
                          "unit": "requests/sec", "failures": n_fail}))
        return
    qps = len(lat) / elapsed

    def pct(q: float) -> float:  # nearest-rank percentile
        import math

        return float(lat[max(math.ceil(q * len(lat)) - 1, 0)]) * 1e3

    churn_msg = (f" | {mutations[0]} index mutations interleaved"
                 if args.churn else "")
    log(f"requests {len(lat)} ok / {n_fail} failed in {elapsed:.1f}s | "
        f"p50 {pct(0.50):.2f} ms  p95 {pct(0.95):.2f} ms  "
        f"p99 {pct(0.99):.2f} ms | mean coalesced batch "
        f"{stats['mean_batch']:.2f} ({stats['batches']} dispatches)"
        f"{churn_msg}")

    windows = []
    if args.report_window_s > 0:
        # completion-time buckets relative to the load start: latency
        # drift over the soak is the signal (a leaking index or a
        # growing spill shows up as rising per-window p99)
        rel = rows_lat[:, 0] - t_start
        for w0 in np.arange(0.0, elapsed, args.report_window_s):
            sel = np.sort(rows_lat[(rel >= w0)
                                   & (rel < w0 + args.report_window_s), 1])
            if not len(sel):
                continue
            import math

            def wp(q):
                return float(sel[max(math.ceil(q * len(sel)) - 1, 0)]) * 1e3

            win = {"t0_s": round(float(w0), 1), "n": int(len(sel)),
                   "p50_ms": round(wp(0.50), 2),
                   "p95_ms": round(wp(0.95), 2),
                   "p99_ms": round(wp(0.99), 2)}
            windows.append(win)
            log(f"  window {win['t0_s']:>6.1f}s: n={win['n']:>5} "
                f"p50 {win['p50_ms']:7.2f}  p95 {win['p95_ms']:7.2f}  "
                f"p99 {win['p99_ms']:7.2f} ms")
    index_stats = None
    if engine._ivf is not None:
        index_stats = {k: v for k, v in engine._ivf.stats().items()
                       if isinstance(v, (int, float, str))}
        log(f"index counters after soak: {index_stats}")
    result = {
        "metric": "serving_http_qps",
        "value": round(qps, 1),
        "unit": "requests/sec",
        "clients": args.clients,
        "p50_ms": round(pct(0.50), 2),
        "p95_ms": round(pct(0.95), 2),
        "p99_ms": round(pct(0.99), 2),
        "mean_batch": round(stats["mean_batch"], 2),
        "failures": n_fail,
    }
    if args.churn:
        result["mutations"] = mutations[0]
    print(json.dumps(result))
    if args.soak_out:
        artifact = dict(result, windows=windows, index_stats=index_stats,
                        seconds=args.seconds, gallery=args.gallery,
                        churn=bool(args.churn),
                        ivf_nlist=args.ivf_nlist,
                        ivf_nprobe=args.ivf_nprobe,
                        image_size=args.image_size)
        Path(args.soak_out).write_text(json.dumps(artifact, indent=2))
        log(f"soak artifact written to {args.soak_out}")
    httpd.shutdown()
    batcher.close()


def png_bytes(rng, size: int, Image) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, (size, size, 3)).astype("uint8")
    ).save(buf, format="PNG")
    return buf.getvalue()


if __name__ == "__main__":
    main()
