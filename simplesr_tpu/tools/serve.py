"""Batched SR serving daemon.

The production face of the eval machinery (no reference counterpart — its
inference surface is the one-shot evaluation script, operations/
evaluation.py:214): a long-lived process that keeps the model warm on the
chip and serves upscale requests over a Unix (or TCP) socket.

Design, TPU-first:
  * requests are grouped BY SHAPE and batched up to ``max_batch`` (static
    shapes → every (batch, H, W) bucket compiles once and stays in the jit
    cache; identical-shape requests ride one MXU dispatch);
  * a collector thread assembles batches with a ``max_wait_ms`` deadline —
    latency is bounded, throughput comes from batching;
  * same-shape batching keeps served outputs bit-identical to the one-shot
    ``tools.upscale`` path (no bucket padding, so no border drift);
  * images larger than the tile threshold stream through the overlap-tiled
    path (ops.tiled_apply), same as offline eval.

Protocol (length-prefixed frames; the connection PERSISTS — send any number
of requests over one socket, close to end the session; connection setup was
the measured cost floor for small images under the 1-request/connection v1):
  client → server: uint64 big-endian length + PNG/JPEG bytes   (repeat)
  server → client: 1 status byte (0 = ok, 1 = error)
                   + uint64 big-endian length
                   + payload: PNG bytes (ok) | UTF-8 error message (error)
A per-request failure (undecodable image, model error) is reported with
status=1 and a human-readable message; the connection stays usable.

Run:    python -m simplesr_tpu.tools.serve --model m.msgpack --scale 4 \
            --socket /tmp/sr.sock
Client: python -m simplesr_tpu.tools.serve --client /tmp/sr.sock \
            in.png --output out/
Library client (persistent connection): ``with SRClient(addr) as c:
c.upscale_file(p) for p in paths``.
"""

import argparse
import io
import os
import queue
import socket
import socketserver
import struct
import threading
import time

import numpy as np

_LEN = struct.Struct(">Q")


# --------------------------------------------------------------- wire I/O

def _read_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf += chunk
    return buf


def _recv_blob(sock, allow_eof=False):
    """Read one length-prefixed blob; with allow_eof, a clean close before
    the first byte returns None (end of a persistent session)."""
    first = sock.recv(1)
    if not first:
        if allow_eof:
            return None
        raise ConnectionError("peer closed mid-message")
    (n,) = _LEN.unpack(first + _read_exact(sock, _LEN.size - 1))
    return _read_exact(sock, n)


def _send_blob(sock, data):
    sock.sendall(_LEN.pack(len(data)) + data)


STATUS_OK = b"\x00"
STATUS_ERROR = b"\x01"


def _send_reply(sock, status, payload):
    sock.sendall(status + _LEN.pack(len(payload)) + payload)


def _recv_reply(sock):
    """→ (ok: bool, payload: bytes)."""
    status = _read_exact(sock, 1)
    (n,) = _LEN.unpack(_read_exact(sock, _LEN.size))
    return status == STATUS_OK, _read_exact(sock, n)


# ----------------------------------------------------------------- engine

class _Request:
    __slots__ = ("img", "event", "result", "error")

    def __init__(self, img):
        # float32 HWC in [0,1] (upscale) or uint8 HWC (upscale_u8); the
        # result mirrors the request dtype: float32 [-1,1] or uint8
        self.img = img
        self.event = threading.Event()
        self.result = None
        self.error = None


class SREngine:
    """Shape-bucketed batching executor around one warm model.

    Two entry points: `upscale` (float32 in/out — the library contract) and
    `upscale_u8` (uint8 in/out). The uint8 path normalizes AND re-quantizes
    ON DEVICE, so host↔device transfers carry 1 byte/channel instead of 4 —
    a 4× cut of the serving path's dominant non-compute cost (PCIe on a
    real TPU VM; measured 2.8× more steady-state requests/s through this
    dev environment's bandwidth-limited tunnel, scripts/bench_serve.py).
    The socket server uses it for every request."""

    def __init__(self, model_path, scale, max_batch=8, max_wait_ms=5,
                 tile_threshold=1000, fast=True, mesh=None, ensemble=False,
                 paired=0):
        import jax
        import jax.numpy as jnp
        from simplesr_tpu.eval.evaluation import _as_predictor

        # paired=w: batch→channel paired trunk (models/paired.py) — the
        # predictor pads non-divisible batches internally, so the pow2
        # bucket ladder is unchanged and served bytes stay exact
        base = _as_predictor(model_path, fast=fast, ensemble=ensemble,
                             paired=paired)

        def u8_wrapper(x_u8):
            sr = base(x_u8.astype(jnp.float32) / 255.0)
            sr = jnp.clip((sr.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0)
            # truncating cast = the tools.upscale / offline quantization
            # convention (np .astype(uint8)); keeps served bytes identical
            return sr.astype(jnp.uint8)

        if mesh is not None:
            # multi-chip serving: shard the batch dimension over the mesh's
            # first axis (pure SPMD data parallelism — the generator weights
            # replicate, XLA inserts no collectives in the forward). Batch
            # buckets are padded up to at least the axis size below.
            from simplesr_tpu.parallel.mesh import data_sharding
            axis = mesh.axis_names[0]
            shard = data_sharding(mesh, axis=axis)
            self._min_batch = mesh.shape[axis]
            self._predict = jax.jit(base, in_shardings=shard,
                                    out_shardings=shard)
            self._predict_u8 = jax.jit(u8_wrapper, in_shardings=shard,
                                       out_shardings=shard)
        else:
            self._min_batch = 1
            self._predict = base
            self._predict_u8 = jax.jit(u8_wrapper)
        self.scale = int(scale)
        self.max_batch = max(int(max_batch), self._min_batch)
        self.max_wait_s = max_wait_ms / 1000.0
        self.tile_threshold = tile_threshold
        self._queue = queue.SimpleQueue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -------------------------------------------------------------- public

    def upscale(self, img_01, timeout=120.0):
        """Blocking: float32 HWC [0,1] → float32 HWC [-1,1] SR."""
        return self._submit(_Request(np.asarray(img_01, np.float32)), timeout)

    def upscale_u8(self, img_u8, timeout=120.0):
        """Blocking: uint8 HWC → uint8 HWC SR (device-side (de)quantization,
        4× less host↔device traffic than `upscale`)."""
        return self._submit(_Request(np.asarray(img_u8, np.uint8)), timeout)

    def _submit(self, req, timeout):
        self._queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("SR request timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def warmup(self, shapes=((64, 64), (128, 128)), u8=None):
        """Pre-compile EVERY batch bucket for each shape — the pow2 ladder
        from _min_batch (1, or the mesh axis size) up to max_batch, the
        full set _run can dispatch thanks to pow2 padding. u8=None warms
        BOTH dtype buckets (the socket server serves uint8; the library
        contract is float32)."""
        sizes = []
        b = self._min_batch
        while True:  # covers next_pow2(max_batch) for non-pow2 max_batch
            sizes.append(b)
            if b >= self.max_batch:
                break
            b *= 2
        for h, w in shapes:
            for n in sizes:
                if u8 is None or u8:
                    self._predict_u8(np.zeros((n, h, w, 3), np.uint8))
                if u8 is None or not u8:
                    self._predict(np.zeros((n, h, w, 3), np.float32))

    def close(self):
        self._stop.set()
        self._queue.put(None)
        self._worker.join(timeout=10)

    # -------------------------------------------------------------- worker

    def _collect(self):
        """One batch of same-shape requests (deadline-bounded)."""
        first = self._queue.get()
        if first is None:
            return None, []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        stragglers = []
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                break
            if (req.img.shape == first.img.shape
                    and req.img.dtype == first.img.dtype):
                batch.append(req)
            else:
                stragglers.append(req)  # different bucket: next round
        return batch, stragglers

    def _run(self):
        import jax.numpy as jnp
        from simplesr_tpu.eval.evaluation import _upscale

        while not self._stop.is_set():
            batch, stragglers = self._collect()
            for req in stragglers:
                self._queue.put(req)
            if not batch:
                continue
            try:
                h, w = batch[0].img.shape[:2]
                u8 = batch[0].img.dtype == np.uint8
                if min(h, w) > self.tile_threshold:
                    # tiled path is per-image; keep requests independent
                    outs = []
                    for r in batch:
                        img = r.img.astype(np.float32) / 255.0 if u8 else r.img
                        sr = np.asarray(_upscale(
                            self._predict, jnp.asarray(img)[None],
                            self.scale)[0])
                        if u8:
                            sr = np.clip((sr + 1.0) * 127.5, 0,
                                         255).astype(np.uint8)
                        outs.append(sr)
                else:
                    # pad to the next pow2 step from _min_batch: batch
                    # entries are independent through the convs, so served
                    # outputs are byte-identical while the jit-compile set
                    # stays bounded (the warmup() ladder per shape instead
                    # of every batch size concurrency happens to produce —
                    # each novel size is a fresh multi-second XLA compile)
                    stacked = np.stack([r.img for r in batch])
                    target = self._min_batch  # ≥ mesh device count
                    while target < len(batch):
                        target *= 2
                    if target > len(batch):
                        pad = np.repeat(stacked[:1], target - len(batch), 0)
                        stacked = np.concatenate([stacked, pad], 0)
                    fn = self._predict_u8 if u8 else self._predict
                    outs = np.asarray(fn(jnp.asarray(stacked)))[:len(batch)]
                for req, out in zip(batch, outs):
                    req.result = np.asarray(out)
            except Exception as e:  # report to the callers, keep serving
                for req in batch:
                    req.error = e
            finally:
                for req in batch:
                    req.event.set()


# ----------------------------------------------------------------- server

def serve(model_path, scale, socket_path=None, tcp_port=None, max_batch=8,
          max_wait_ms=5, ready_event=None, stop_event=None, warm_shapes=None,
          mesh=None, ensemble=False, paired=0):
    """Run the daemon until stop_event (or forever). `warm_shapes`
    (e.g. ((128, 128),)) pre-compiles those LR buckets in the uint8 dtype
    the socket path serves, before readiness is signaled. `mesh` shards
    request batches over its data axis (multi-chip serving); `ensemble`
    serves every request through the ×8 geometric self-ensemble; `paired`
    serves through the batch→channel paired trunk (models/paired.py)."""
    from PIL import Image

    engine = SREngine(model_path, scale, max_batch=max_batch,
                      max_wait_ms=max_wait_ms, mesh=mesh, ensemble=ensemble,
                      paired=paired)
    if warm_shapes:
        engine.warmup(shapes=warm_shapes, u8=True)

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            # persistent session: serve requests until the client closes
            while True:
                try:
                    blob = _recv_blob(self.request, allow_eof=True)
                except (ConnectionError, OSError):
                    return
                if blob is None:
                    return  # clean close
                try:
                    img = np.asarray(
                        Image.open(io.BytesIO(blob)).convert("RGB"), np.uint8)
                    arr = engine.upscale_u8(img)  # (de)quantization on device
                    out = io.BytesIO()
                    Image.fromarray(arr).save(out, format="PNG")
                    reply = (STATUS_OK, out.getvalue())
                except Exception as e:  # report WHY; keep the session alive
                    msg = f"{type(e).__name__}: {e}".encode(
                        "utf-8", "replace")[:4096]
                    reply = (STATUS_ERROR, msg)
                try:
                    _send_reply(self.request, *reply)
                except OSError:
                    return

    class ThreadingUnixServer(socketserver.ThreadingMixIn,
                              socketserver.UnixStreamServer):
        daemon_threads = True

    class ThreadingTCPServer(socketserver.ThreadingMixIn,
                             socketserver.TCPServer):
        daemon_threads = True
        allow_reuse_address = True

    if socket_path:
        if os.path.exists(socket_path):
            os.unlink(socket_path)
        server = ThreadingUnixServer(socket_path, Handler)
    else:
        server = ThreadingTCPServer(("127.0.0.1", tcp_port or 0), Handler)

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
        if socket_path and os.path.exists(socket_path):
            os.unlink(socket_path)
    return server


class SRError(RuntimeError):
    """Server-reported per-request failure (carries the server's message)."""


class SRClient:
    """Persistent-connection client: one socket, many requests.

    ``address`` is a Unix socket path or a (host, port) tuple. A server-side
    per-request error raises SRError with the server's message; the
    connection stays open for further requests."""

    def __init__(self, address):
        if isinstance(address, tuple):
            self._sock = socket.create_connection(address)
        else:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(address)

    def upscale_bytes(self, img_bytes):
        """PNG/JPEG bytes → SR image as numpy uint8 HWC."""
        from PIL import Image

        _send_blob(self._sock, img_bytes)
        ok, payload = _recv_reply(self._sock)
        if not ok:
            raise SRError(payload.decode("utf-8", "replace")
                          or "server reported an error for this image")
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))

    def upscale_file(self, image_path):
        with open(image_path, "rb") as f:
            return self.upscale_bytes(f.read())

    def close(self):
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def request_upscale(address, image_path):
    """One-shot helper: send one image file, return decoded SR numpy uint8.
    For many images, hold an SRClient open instead — connection setup was
    the measured small-image cost floor (docs/serving.md)."""
    with SRClient(address) as client:
        return client.upscale_file(image_path)


def main(argv=None):
    from simplesr_tpu.utils import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", help="saved model (.msgpack) [server mode]")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--socket", help="Unix socket path")
    p.add_argument("--port", type=int, help="TCP port (instead of --socket)")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5)
    p.add_argument("--warm", metavar="HxW[,HxW...]",
                   help="pre-compile these LR shape buckets before serving "
                        "(e.g. 128x128,256x256)")
    p.add_argument("--mesh-dp", type=int, metavar="N",
                   help="shard request batches over N devices "
                        "(multi-chip data-parallel serving)")
    p.add_argument("--ensemble", action="store_true",
                   help="serve through the x8 geometric self-ensemble "
                        "(higher PSNR, ~8x compute per request)")
    p.add_argument("--paired", type=int, default=0, metavar="W",
                   help="serve through the batch-to-channel paired trunk "
                        "(W batch items packed into channels for MXU lane "
                        "fill; exact rewrite, SRResNet/RRDB)")
    p.add_argument("--client", metavar="ADDR",
                   help="client mode: socket path (or host:port)")
    p.add_argument("--output", default=".", help="[client] output directory")
    p.add_argument("inputs", nargs="*", help="[client] image files")
    args = p.parse_args(argv)

    if args.client:
        from PIL import Image
        addr = args.client
        if ":" in addr and not os.path.exists(addr):
            host, port = addr.rsplit(":", 1)
            addr = (host, int(port))
        os.makedirs(args.output, exist_ok=True)
        rc = 0
        with SRClient(addr) as client:  # one connection for the whole list
            for path in args.inputs:
                try:
                    arr = client.upscale_file(path)
                except SRError as e:
                    print(f"{path}: server error: {e}")
                    rc = 1
                    continue
                out = os.path.join(args.output, os.path.splitext(
                    os.path.basename(path))[0] + "_sr.png")
                Image.fromarray(arr).save(out)
                print(f"{path} -> {out} {arr.shape[1]}x{arr.shape[0]}")
        return rc

    if not args.model or not (args.socket or args.port):
        p.error("server mode needs --model and --socket/--port")
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
    mesh = None
    if args.mesh_dp is not None:
        import jax
        from simplesr_tpu.parallel import make_mesh
        avail = len(jax.devices())
        if args.mesh_dp < 1:
            p.error(f"--mesh-dp must be >= 1, got {args.mesh_dp}")
        if args.mesh_dp > avail:  # don't silently serve at lower parallelism
            p.error(f"--mesh-dp {args.mesh_dp} but only {avail} devices"
                    " are available")
        mesh = make_mesh(devices=jax.devices()[:args.mesh_dp])
    print(f"serving {args.model} x{args.scale} on "
          f"{args.socket or f'127.0.0.1:{args.port}'}", flush=True)
    if args.paired and args.paired < 2:
        p.error(f"--paired must be >= 2, got {args.paired}")
    # SIGTERM (systemd/docker stop) must run the same cleanup as Ctrl-C:
    # unlink the socket, close the engine — otherwise the next start finds
    # a stale socket and clients see connection-refused mid-drain
    stop = _install_stop_handler()
    serve(args.model, args.scale, socket_path=args.socket,
          tcp_port=args.port, max_batch=args.max_batch,
          max_wait_ms=args.max_wait_ms, warm_shapes=warm, mesh=mesh,
          ensemble=args.ensemble, paired=args.paired, stop_event=stop)
    return 0


def _install_stop_handler():
    """SIGTERM/SIGINT → a stop event the serve loop waits on (graceful
    shutdown path; shared by the HTTP gateway)."""
    import signal
    import threading

    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.set())
    return stop


if __name__ == "__main__":
    raise SystemExit(main())
