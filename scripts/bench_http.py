"""HTTP serving bench: single-request latency + batched throughput.

Starts the RecommendService in-process on an ephemeral port against a
trained checkpoint and measures end-to-end (featurize + jit scoring +
JSON) over real HTTP on localhost.

Usage: python scripts/bench_http.py --model_dir /tmp/verify_run2 \
    --dataset Clothing_Shoes_and_Jewelry [--platform cpu]
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--dataset", default="Clothing_Shoes_and_Jewelry")
    p.add_argument("--data_dir", default="/root/reference/Data")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--reqs", type=int, default=2000)
    p.add_argument("--platform", default=None, choices=["cpu", "default"])
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tlsan_tpu.data import load_category
    from tlsan_tpu.serve.http import RecommendService, serve
    from tlsan_tpu.serve.recommender import Recommender

    _, _, cate_list, _ = load_category(
        os.path.join(args.data_dir, f"{args.dataset}.pkl"))
    rec = Recommender.from_model_dir(args.model_dir, cate_list, k=args.k,
                                     batch_size=args.batch)
    service = RecommendService(rec, rec.cfg.model, rec.cfg, cate_list)
    httpd = serve(service, port=0, host="127.0.0.1")
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/recommend"
    # device executor must run on THIS (JAX-owning) thread on the axon TPU
    # backend — so the CLIENT runs in a thread and main runs the worker
    stop = threading.Event()

    rng = np.random.default_rng(0)
    items = len(cate_list)

    def mk_req():
        n = int(rng.integers(3, 12))
        days = np.sort(rng.integers(1, 2000, n))
        return {"user": int(rng.integers(0, 100)),
                "events": [[int(rng.integers(0, items)), int(d)]
                           for d in days]}

    def post(payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def client():
        try:
            post({"requests": [mk_req() for _ in range(args.batch)]})  # warm

            lat = []
            for _ in range(30):
                t0 = time.perf_counter()
                post(mk_req())
                lat.append(time.perf_counter() - t0)
            lat_ms = sorted(lat)[len(lat) // 2] * 1e3

            n_batches = max(1, args.reqs // args.batch)
            batches = [{"requests": [mk_req() for _ in range(args.batch)]}
                       for _ in range(n_batches)]
            t0 = time.perf_counter()
            for b in batches:
                post(b)
            dt = time.perf_counter() - t0
            rps = n_batches * args.batch / dt

            print(json.dumps({
                "metric": "serve_http_requests_per_sec",
                "value": round(rps, 1), "unit": "requests/s",
                "p50_single_request_ms": round(lat_ms, 2),
                "batch": args.batch, "k": args.k,
                "catalog": items, "backend": jax.default_backend(),
            }), flush=True)
        finally:
            stop.set()
            httpd.shutdown()

    threading.Thread(target=client, daemon=True).start()
    service.run_worker(stop)  # device executor on the main (JAX) thread


if __name__ == "__main__":
    main()
