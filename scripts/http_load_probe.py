"""HTTP serving latency under concurrency (VERDICT r4 item 2 tail).

Starts the RecognitionHTTPServer (MGP-STR recognize route over the
ContinuousBatcher) in-process and hammers /v1/recognize with N
synchronous client threads, reporting request p50/p99 latency and
aggregate req/s at each concurrency, plus batcher fill from /v1/stats.

Usage: python scripts/http_load_probe.py [--variant base]
       [--concurrency 1 8 16 32] [--requests 128] [--batch-size 32]
"""

import argparse
import io
import json
import os
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base")
    ap.add_argument("--concurrency", type=int, nargs="*",
                    default=[1, 8, 16, 32])
    ap.add_argument("--requests", type=int, default=128,
                    help="requests per client at each concurrency level")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.engine.http_serving import (
        RecognitionHTTPServer)
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.models.mgp_str import (
        MGPSTR, MGPSTRConfig)

    model = MGPSTR(MGPSTRConfig(variant=args.variant))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3)))["params"]
    engine = MGPSTRInference(model, params, CharCodec())
    server = RecognitionHTTPServer(engine, batch_size=args.batch_size,
                                   max_wait_ms=args.max_wait_ms,
                                   port=0).start()
    url = f"http://127.0.0.1:{server.port}/v1/recognize"
    stats_url = f"http://127.0.0.1:{server.port}/v1/stats"

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (32, 128, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    body = buf.getvalue()

    def one(timeout: float = 120) -> float:
        t0 = time.perf_counter()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            json.loads(resp.read())
        return time.perf_counter() - t0

    # compile the batched forward: the first compile rides the TPU
    # tunnel and has been measured anywhere from 90s to >420s depending
    # on tunnel weather — retry until it lands (the server keeps the
    # compile going even after the client socket times out)
    for attempt in range(4):
        try:
            one(timeout=600)
            break
        except Exception as e:  # noqa: BLE001 - probe resilience
            print(f"warmup attempt {attempt}: {type(e).__name__}: {e}",
                  flush=True)
            time.sleep(10)
    else:
        raise SystemExit("warmup never completed")
    print(f"server: variant={args.variant} batch={args.batch_size} "
          f"max_wait={args.max_wait_ms}ms", flush=True)
    try:
        for conc in args.concurrency:
            n = args.requests * conc

            def client(_):
                return [one() for _ in range(args.requests)]

            t0 = time.perf_counter()
            with ThreadPoolExecutor(conc) as ex:
                lat = [x for res in ex.map(client, range(conc)) for x in res]
            wall = time.perf_counter() - t0
            lat_ms = np.sort(np.asarray(lat)) * 1000
            p50 = lat_ms[len(lat_ms) // 2]
            p99 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))]
            with urllib.request.urlopen(stats_url, timeout=30) as resp:
                st = json.loads(resp.read())
            b = st.get("batches", 0) or 1
            fill = st.get("items", 0) / (b * args.batch_size)
            print(f"concurrency {conc:3d}: {n / wall:7.1f} req/s  "
                  f"p50 {p50:7.1f} ms  p99 {p99:7.1f} ms  "
                  f"(cum. batch fill {fill:.2f})", flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
