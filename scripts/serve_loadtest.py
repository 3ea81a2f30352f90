"""Load-test the HTTP serving stack end-to-end (in-process server).

Builds the flagship serving setup — bf16 ModifiedResNet50 query encoder +
a random (N, 1024) resident gallery — starts `cli/serve`'s HTTP handler on
an ephemeral localhost port IN THIS PROCESS (one process owns the chip;
see CLAUDE.md on the tunnel serializing clients), then hammers it with
concurrent client threads posting base64 PNG queries.

Reports per-request latency percentiles (client-observed, full stack:
HTTP + base64 + PIL decode + micro-batch window + device dispatch + one
host drain) and the achieved qps, plus the server's coalescing counters.

Usage: python scripts/serve_loadtest.py [--clients 8] [--seconds 20]
       [--gallery 10000] [--window_ms 2] [--image_size 224] [--cpu]
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


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--gallery", type=int, default=10_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--window_ms", type=float, default=2.0)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke mode)")
    p.add_argument("--churn", action="store_true",
                   help="run the gallery as an online index and mutate it "
                        "(add/remove via HTTP) from one extra thread while "
                        "the search clients hammer it")
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
    from art_sbir_tpu.ops.resize import CLIP_MEAN, CLIP_STD, normalize
    from art_sbir_tpu.retrieval.server import MicroBatcher, RetrievalEngine

    enable_compilation_cache()
    s = args.image_size
    model = ModifiedResNet(dtype=jnp.bfloat16, input_resolution=s)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((8, s, s, 3), jnp.float32), train=False)

    def forward(im_u8):
        f = normalize(im_u8.astype(jnp.bfloat16) / 255.0, CLIP_MEAN, CLIP_STD)
        return model.apply(variables, f, train=False)

    rng = np.random.default_rng(0)
    gallery = rng.standard_normal((args.gallery, args.dim)).astype(np.float32)
    engine = RetrievalEngine(
        forward, gallery, [f"img_{i}" for i in range(args.gallery)],
        image_size=s, k_max=10, max_batch=args.max_batch,
        capacity=args.gallery + 64 if args.churn else None)
    batcher = MicroBatcher(engine, window_ms=args.window_ms)

    log(f"warming compile for all batch buckets {engine.buckets}...")
    for b in engine.buckets:
        engine.search_arrays(np.zeros((b, s, s, 3), np.uint8))

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(engine, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    log(f"serving on :{port}; {args.clients} clients x {args.seconds}s")

    # distinct query images, pre-encoded to base64 PNG on the client side
    payloads = []
    for i in range(args.clients):
        img = rng.integers(0, 256, (s, s, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        payloads.append(json.dumps({
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "k": 10}).encode())

    latencies: list = []
    lock = threading.Lock()
    stop = threading.Event()

    def client(i: int) -> None:
        url = f"http://127.0.0.1:{port}/search"
        mine = []
        while not stop.is_set():
            t0 = time.perf_counter()
            req = urllib.request.Request(
                url, data=payloads[i],
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                json.loads(r.read())
            mine.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    mutations = [0]
    if args.churn:
        def churner():
            url = f"http://127.0.0.1:{port}"
            img = rng.integers(0, 256, (s, s, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            i = 0
            while not stop.is_set():
                name = f"churn_{i}.png"
                for path, payload in (("/add", {"image_b64": b64,
                                                "path": name}),
                                      ("/remove", {"paths": [name]})):
                    req = urllib.request.Request(
                        f"{url}{path}", data=json.dumps(payload).encode(),
                        headers={"Content-Type": "application/json"})
                    with urllib.request.urlopen(req) as r:
                        json.loads(r.read())
                    mutations[0] += 1
                i += 1
                time.sleep(0.05)

        threads.append(threading.Thread(target=churner))
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    elapsed = time.perf_counter() - t_start

    lat = np.sort(np.asarray(latencies))
    qps = len(lat) / elapsed
    pct = lambda q: float(lat[min(int(q * len(lat)), len(lat) - 1)]) * 1e3
    stats = batcher.stats.snapshot()
    churn_msg = (f" | {mutations[0]} index mutations interleaved"
                 if args.churn else "")
    log(f"requests {len(lat)} in {elapsed:.1f}s | "
        f"p50 {pct(0.50):.2f} ms  p95 {pct(0.95):.2f} ms  "
        f"p99 {pct(0.99):.2f} ms | mean coalesced batch "
        f"{stats['mean_batch']:.2f} ({stats['batches']} dispatches)"
        f"{churn_msg}")
    print(json.dumps({
        "metric": "serving_http_qps",
        "value": round(qps, 1),
        "unit": "requests/sec",
        "clients": args.clients,
        "p50_ms": round(pct(0.50), 2),
        "p95_ms": round(pct(0.95), 2),
        "p99_ms": round(pct(0.99), 2),
        "mean_batch": round(stats["mean_batch"], 2),
    }))
    httpd.shutdown()
    batcher.close()


if __name__ == "__main__":
    main()
