"""Concurrent load test of the serving endpoint (micro-batcher on).

Starts the real HTTP server in-process with the promoted weights, warms
every micro-batch shape, then fires concurrent /cv_algo/ requests with a
real test image and reports req/s + latency percentiles as one JSON line.

Usage: python scripts/loadtest_server.py [--requests 96] [--concurrency 16]
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--requests", type=int, default=96)
    parser.add_argument("--concurrency", type=int, default=16)
    parser.add_argument(
        "--prod",
        action="store_true",
        help="production mode: local=False — uploads persisted (async) and the "
        "serve program also ships the extracted board",
    )
    args = parser.parse_args()

    from chessvision_tpu import constants
    from chessvision_tpu.serve.server import serve

    img_path = sorted((Path(constants.DATA_ROOT) / "test" / "initial" / "raw").glob("*.JPG"))[0]
    payload = json.dumps(
        {"image": base64.b64encode(img_path.read_bytes()).decode(), "flip": False}
    ).encode()

    server = serve(
        port=0, local=not args.prod, upload_root="/tmp/loadtest_uploads", warmup=True
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    url = f"http://127.0.0.1:{port}/cv_algo/"

    def post() -> float:
        t0 = time.perf_counter()
        req = urllib.request.Request(url, data=payload, headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert resp["success"], resp
        return time.perf_counter() - t0

    post()  # connection warm

    latencies: list[float] = []
    lock = threading.Lock()
    sem = threading.Semaphore(args.concurrency)

    def worker() -> None:
        with sem:
            dt = post()
        with lock:
            latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(args.requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat = np.asarray(sorted(latencies))
    out = {
        "mode": "prod" if args.prod else "local",
        "requests": args.requests,
        "concurrency": args.concurrency,
        "req_per_sec": round(args.requests / wall, 2),
        "p50_ms": round(float(lat[len(lat) // 2]) * 1000, 1),
        "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1000, 1),
        "wall_s": round(wall, 2),
    }
    print(json.dumps(out))
    server.shutdown()


if __name__ == "__main__":
    main()
