"""Measure the serving daemon (tools/serve.py) under concurrent load.

Two numbers:
  * engine-level: shape-bucketed batching executor throughput (model
    dispatch + host<->device transfers, no image codecs) — the ceiling the
    daemon's design aims for;
  * socket-level: end-to-end requests/s through the Unix socket with N
    concurrent clients sending PNGs (includes PNG decode/encode on server
    threads — the realistic number).

Run: python scripts/bench_serve.py [clients] [seconds]
"""

import io
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import numpy as np

LR_HW = 128
SCALE = 4


def _make_model_file(tmpdir):
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.models import SRResNet
    from simplesr_tpu.train import serialization

    model = SRResNet(upsample_factor=SCALE, num_res_blocks=16, num_filters=64)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, LR_HW, LR_HW, 3), jnp.float32))
    path = os.path.join(tmpdir, "gen.msgpack")
    serialization.save_model(
        {"upsample_factor": SCALE, "architecture": "srresnet",
         "num_blocks": 16, "num_filters": 64}, variables, path)
    return path


def _run_load(call, clients, seconds, stage, max_batch):
    """Ramp (untimed, absorbs first-use bucket compiles) + measured window;
    returns the stage record with throughput and latency percentiles."""
    for measured in (False, True):
        done = [0] * clients
        lat = []
        stop = time.monotonic() + (seconds if measured else seconds / 2)

        def client(i):
            while time.monotonic() < stop:
                t0 = time.monotonic()
                call()
                lat.append(time.monotonic() - t0)
                done[i] += 1

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.monotonic() - t0
    n = sum(done)
    lat.sort()
    rec = {"stage": stage, "requests_per_s": round(n / elapsed, 1),
           "output_mpix_per_s": round(
               n * (LR_HW * SCALE) ** 2 / elapsed / 1e6, 1),
           "clients": clients, "max_batch": max_batch}
    if lat:
        rec["latency_ms_p50"] = round(lat[len(lat) // 2] * 1e3, 1)
        rec["latency_ms_p95"] = round(
            lat[min(int(len(lat) * 0.95), len(lat) - 1)] * 1e3, 1)
    return rec


def bench_engine(model_path, seconds=10.0, clients=32, max_batch=16):
    from simplesr_tpu.tools.serve import SREngine

    engine = SREngine(model_path, SCALE, max_batch=max_batch, max_wait_ms=10)
    img_f32 = np.random.default_rng(0).uniform(0, 1, (LR_HW, LR_HW, 3)) \
        .astype(np.float32)
    img_u8 = (img_f32 * 255).astype(np.uint8)
    engine.warmup(shapes=((LR_HW, LR_HW),))  # both dtype buckets, batch-1

    results = [
        _run_load(lambda: engine.upscale(img_f32), clients, seconds,
                  "engine_f32", max_batch),
        _run_load(lambda: engine.upscale_u8(img_u8), clients, seconds,
                  "engine_u8", max_batch),
    ]
    engine.close()

    # paired-trunk row (models/paired.py, exact rewrite): same load, the
    # engine serving through the batch→channel lane-fill lowering
    paired = SREngine(model_path, SCALE, max_batch=max_batch, max_wait_ms=10,
                      paired=2)
    paired.warmup(shapes=((LR_HW, LR_HW),), u8=True)
    results.append(
        _run_load(lambda: paired.upscale_u8(img_u8), clients, seconds,
                  "engine_u8_paired2", max_batch))
    paired.close()
    return results

def bench_socket(model_path, seconds=10.0, clients=8, max_batch=16):
    from PIL import Image
    from simplesr_tpu.tools.serve import serve, request_upscale, SRClient

    sock_path = os.path.join(tempfile.mkdtemp(), "sr.sock")
    ready, stop_ev = threading.Event(), threading.Event()
    server = threading.Thread(
        target=serve, args=(model_path, SCALE),
        kwargs=dict(socket_path=sock_path, max_batch=max_batch,
                    max_wait_ms=10, ready_event=ready, stop_event=stop_ev,
                    # precompile every pow2 batch bucket for this shape —
                    # otherwise first-use compiles land inside the window
                    warm_shapes=((LR_HW, LR_HW),)),
        daemon=True)
    server.start()
    ready.wait(600)

    img_file = os.path.join(tempfile.mkdtemp(), "in.png")
    arr = (np.random.default_rng(1).uniform(0, 255, (LR_HW, LR_HW, 3))
           .astype(np.uint8))
    Image.fromarray(arr).save(img_file)
    img_bytes = open(img_file, "rb").read()

    # v2 protocol: each client holds ONE persistent connection (the
    # production pattern); the reconnecting row quantifies what v1's
    # connection-per-request cost.
    local = threading.local()

    def persistent_call():
        if getattr(local, "client", None) is None:
            local.client = SRClient(sock_path)
        local.client.upscale_bytes(img_bytes)

    recs = [
        _run_load(persistent_call, clients, seconds,
                  "socket_png_persistent", max_batch),
        _run_load(lambda: request_upscale(sock_path, img_file),
                  clients, seconds, "socket_png_reconnect", max_batch),
    ]
    stop_ev.set()
    return recs


def bench_http(model_path, seconds=10.0, clients=8, max_batch=16):
    """HTTP gateway under the same load shape (keep-alive connections)."""
    import http.client
    from PIL import Image
    from simplesr_tpu.tools.http_gateway import serve_http

    ready, stop_ev = threading.Event(), threading.Event()
    bound = {}
    server = threading.Thread(
        target=serve_http, args=(model_path, SCALE, 0),
        kwargs=dict(max_batch=max_batch, max_wait_ms=10, ready_event=ready,
                    stop_event=stop_ev, warm_shapes=((LR_HW, LR_HW),),
                    on_server=lambda s: bound.update(
                        port=s.server_address[1])),
        daemon=True)
    server.start()
    ready.wait(600)

    buf = io.BytesIO()
    arr = (np.random.default_rng(1).uniform(0, 255, (LR_HW, LR_HW, 3))
           .astype(np.uint8))
    Image.fromarray(arr).save(buf, format="PNG")
    img_bytes = buf.getvalue()
    local = threading.local()

    def call():
        if getattr(local, "conn", None) is None:
            local.conn = http.client.HTTPConnection(
                "127.0.0.1", bound["port"], timeout=600)
        local.conn.request("POST", "/upscale", body=img_bytes)
        resp = local.conn.getresponse()
        resp.read()
        assert resp.status == 200

    rec = _run_load(call, clients, seconds, "http_png_keepalive", max_batch)
    stop_ev.set()
    return [rec]


def main(clients=16, seconds=10):
    from simplesr_tpu.utils import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    tmp = tempfile.mkdtemp()
    model_path = _make_model_file(tmp)
    for rec in bench_engine(model_path, seconds, clients):
        print(json.dumps(rec), flush=True)
    for rec in bench_socket(model_path, seconds, max(4, clients // 2)):
        print(json.dumps(rec), flush=True)
    for rec in bench_http(model_path, seconds, max(4, clients // 2)):
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
