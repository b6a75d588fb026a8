"""HTTP gateway over the serving engine — `curl`-able super-resolution.

    python -m simplesr_tpu.tools.http_gateway --model gen.msgpack \
        --scale 4 --port 8080
    curl -s --data-binary @input.png http://127.0.0.1:8080/upscale > out.png

Endpoints:
- ``POST /upscale`` — request body is any PIL-decodable image; the response
  body is the SR result as PNG. Errors come back as plain-text 4xx/5xx
  (bad image → 400, internal fault → 500) so clients can tell bad input
  from server failure.
- ``GET /healthz`` — JSON liveness + model/scale/ensemble description.

The gateway shares `SREngine` with the socket daemon (tools/serve.py), so
requests get the same shape-bucketed device batching and uint8 device I/O;
the HTTP layer is stdlib `ThreadingHTTPServer` — one blocked thread per
in-flight request, the device work is batched underneath. Beyond-reference
capability (the reference has no serving surface at all; SURVEY.md §2).
"""

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MAX_BODY_BYTES = 64 * 1024 * 1024  # refuse absurd uploads before decoding


def serve_http(model_path, scale, port, host="127.0.0.1", max_batch=8,
               max_wait_ms=5, ensemble=False, paired=0, warm_shapes=None,
               ready_event=None, stop_event=None, on_server=None):
    """Run the HTTP gateway until `stop_event` (or forever). Returns the
    server object. `on_server(server)` fires after binding but before
    readiness — with port=0 the bound port is
    `server.server_address[1]`."""
    from PIL import Image

    from simplesr_tpu.tools.serve import SREngine

    engine = SREngine(model_path, scale, max_batch=max_batch,
                      max_wait_ms=max_wait_ms, ensemble=ensemble,
                      paired=paired)
    if warm_shapes:
        engine.warmup(shapes=warm_shapes, u8=True)

    health = json.dumps({
        "status": "ok", "model": str(model_path), "scale": int(scale),
        "ensemble": bool(ensemble), "paired": int(paired),
    }).encode()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive: many requests per conn

        def log_message(self, fmt, *args):  # quiet; the daemon logs enough
            pass

        def _reply(self, code, body, ctype="text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/health"):
                self._reply(200, health, "application/json")
            else:
                self._reply(404, b"unknown path; POST /upscale or GET /healthz")

        def do_POST(self):
            if self.path != "/upscale":
                self._reply(404, b"unknown path; POST /upscale")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                length = 0
            if length <= 0:
                self._reply(411, b"Content-Length required")
                return
            if length > MAX_BODY_BYTES:
                self._reply(413, f"body exceeds {MAX_BODY_BYTES} bytes".encode())
                return
            blob = self.rfile.read(length)
            try:
                img = np.asarray(
                    Image.open(io.BytesIO(blob)).convert("RGB"), np.uint8)
            except Exception as e:
                self._reply(400, f"cannot decode image: {e}".encode())
                return
            try:
                arr = engine.upscale_u8(img)
                out = io.BytesIO()
                Image.fromarray(arr).save(out, format="PNG")
            except Exception as e:
                self._reply(500, f"{type(e).__name__}: {e}".encode())
                return
            self._reply(200, out.getvalue(), "image/png")

    server = ThreadingHTTPServer((host, port), Handler)
    server.daemon_threads = True
    if on_server is not None:
        on_server(server)
    if ready_event is not None:
        ready_event.set()
    try:
        if stop_event is None:
            server.serve_forever()
        else:
            thread = threading.Thread(target=server.serve_forever, daemon=True)
            thread.start()
            stop_event.wait()
    finally:
        server.shutdown()
        server.server_close()
        engine.close()
    return server


def main(argv=None):
    from simplesr_tpu.utils import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="saved model (.msgpack)")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5)
    p.add_argument("--ensemble", action="store_true",
                   help="serve through the x8 geometric self-ensemble")
    p.add_argument("--paired", type=int, default=0, metavar="W",
                   help="serve through the batch-to-channel paired trunk "
                        "(W items packed into channels for MXU lane fill)")
    p.add_argument("--warm", metavar="HxW[,HxW...]",
                   help="pre-compile these LR shape buckets before serving")
    args = p.parse_args(argv)
    warm = None
    if args.warm:
        warm = []
        for s in args.warm.split(","):
            dims = s.split("x")
            if len(dims) != 2 or not all(d.isdigit() and int(d) > 0
                                         for d in dims):
                p.error(f"--warm entries must be HxW (two positive ints), "
                        f"got {s!r}")
            warm.append((int(dims[0]), int(dims[1])))
        warm = tuple(warm)
    print(f"http gateway: {args.model} x{args.scale} on "
          f"http://{args.host}:{args.port}", flush=True)
    if args.paired and args.paired < 2:
        p.error(f"--paired must be >= 2, got {args.paired}")
    from simplesr_tpu.tools.serve import _install_stop_handler
    serve_http(args.model, args.scale, args.port, host=args.host,
               max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
               ensemble=args.ensemble, paired=args.paired, warm_shapes=warm,
               stop_event=_install_stop_handler())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
