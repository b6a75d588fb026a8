"""HTTP gateway end-to-end: POST an image, get the SR PNG back; errors are
transparent HTTP statuses; health endpoint reports the served model."""

import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from simplesr_tpu.train import Generator, save_model


@pytest.fixture(scope="module")
def gateway(tmp_path_factory):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))
    model = str(tmp_path_factory.mktemp("http") / "gen.msgpack")
    save_model(gen.module_config(), gen.variables, model)

    from simplesr_tpu.tools.http_gateway import serve_http
    ready = threading.Event()
    stop = threading.Event()
    bound = {}
    t = threading.Thread(
        target=serve_http, args=(model, 2, 0),
        kwargs=dict(ready_event=ready, stop_event=stop,
                    on_server=lambda s: bound.update(port=s.server_address[1])),
        daemon=True)
    t.start()
    assert ready.wait(timeout=120)
    yield model, f"http://127.0.0.1:{bound['port']}"
    stop.set()
    t.join(timeout=30)


def test_health(gateway):
    model, base = gateway
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["scale"] == 2
    assert info["ensemble"] is False


def test_upscale_roundtrip_matches_engine(gateway, rng):
    model, base = gateway
    img = (rng.uniform(0, 255, (20, 24, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(f"{base}/upscale", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (40, 48, 3)

    from simplesr_tpu.tools.serve import SREngine
    engine = SREngine(model, 2, max_batch=1, max_wait_ms=1)
    want = np.asarray(engine.upscale_u8(img))
    engine.close()
    np.testing.assert_array_equal(out, want)


def test_bad_image_is_400_with_reason(gateway):
    model, base = gateway
    req = urllib.request.Request(f"{base}/upscale", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400
    assert b"cannot decode" in exc.value.read()


def test_unknown_path_is_404(gateway):
    model, base = gateway
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{base}/nope", timeout=30)
    assert exc.value.code == 404


def test_keepalive_many_requests_one_connection(gateway, rng):
    """HTTP/1.1 keep-alive: several requests reuse one TCP connection."""
    import http.client
    model, base = gateway
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=120)
    try:
        for _ in range(3):
            img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            conn.request("POST", "/upscale", body=buf.getvalue())
            resp = conn.getresponse()
            assert resp.status == 200
            out = np.asarray(Image.open(io.BytesIO(resp.read())))
            assert out.shape == (32, 32, 3)
    finally:
        conn.close()
