"""Serving daemon: shape-bucketed batching correctness + the socket
round-trip. Engine outputs must be bit-identical to the one-shot path
(same-shape batching, no bucket padding)."""

import os
import threading

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.train import Generator
from simplesr_tpu.train.serialization import save_model


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))
    path = str(tmp_path_factory.mktemp("serve") / "gen.msgpack")
    save_model(gen.module_config(), gen.variables, path)
    return path


def test_engine_batches_same_shape_and_matches_direct(model_file, rng):
    from simplesr_tpu.tools.serve import SREngine
    from simplesr_tpu.eval.evaluation import _as_predictor

    engine = SREngine(model_file, scale=2, max_batch=4, max_wait_ms=30)
    calls = []
    inner = engine._predict
    engine._predict = lambda x: (calls.append(x.shape), inner(x))[1]

    imgs_a = [rng.uniform(0, 1, (16, 16, 3)).astype(np.float32) for _ in range(3)]
    img_b = rng.uniform(0, 1, (24, 16, 3)).astype(np.float32)

    results = [None] * 4
    def run(i, img):
        results[i] = engine.upscale(img)
    threads = [threading.Thread(target=run, args=(i, img))
               for i, img in enumerate(imgs_a + [img_b])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    engine.close()

    direct = _as_predictor(model_file)
    for img, out in zip(imgs_a + [img_b], results):
        expect = np.asarray(direct(jnp.asarray(img)[None])[0])
        np.testing.assert_array_equal(np.asarray(out), expect)
    # the three same-shape requests must NOT have run as 3 single-image
    # dispatches (the deadline lets them coalesce), and every dispatched
    # batch is a pow2 bucket (bounded compile set; padding sliced off)
    b16 = [s for s in calls if s[1] == 16 and s[2] == 16]
    assert len(b16) <= 2
    assert all(s[0] in (1, 2, 4) for s in b16)
    assert sum(s[0] for s in b16) >= 3


def test_socket_roundtrip(model_file, rng, tmp_path):
    from PIL import Image
    from simplesr_tpu.tools import serve as serve_mod

    img_path = str(tmp_path / "in.png")
    arr = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    Image.fromarray(arr).save(img_path)

    sock_path = str(tmp_path / "sr.sock")
    ready, stop = threading.Event(), threading.Event()
    server = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(model_path=model_file, scale=2, socket_path=sock_path,
                    ready_event=ready, stop_event=stop, max_wait_ms=1),
        daemon=True)
    server.start()
    assert ready.wait(timeout=120)
    try:
        out = serve_mod.request_upscale(sock_path, img_path)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8

        # parity with the offline tools.upscale quantization
        from simplesr_tpu.eval.evaluation import _as_predictor
        sr = np.asarray(_as_predictor(model_file)(
            jnp.asarray(arr[None], jnp.float32) / 255.0)[0])
        expect = np.clip((sr + 1.0) * 127.5, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out, expect)
    finally:
        stop.set()
        server.join(timeout=30)
    assert not os.path.exists(sock_path)  # daemon cleaned up


def test_engine_mesh_serving_matches_single_device(model_file, rng):
    """SREngine(mesh=...) shards request batches over the data axis; served
    outputs must match the single-device engine exactly, including when the
    pow2 pad target is raised to the device count."""
    import jax
    from simplesr_tpu.parallel import make_mesh
    from simplesr_tpu.tools.serve import SREngine

    mesh = make_mesh(devices=jax.devices()[:8])
    meshed = SREngine(model_file, scale=2, max_batch=8, max_wait_ms=20,
                      mesh=mesh)
    plain = SREngine(model_file, scale=2, max_batch=8, max_wait_ms=1)
    assert meshed._min_batch == 8

    imgs = [rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
            for _ in range(3)]  # 3 requests -> padded to the 8-wide bucket
    results = [None] * 3

    def run(i):
        results[i] = meshed.upscale(imgs[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    for img, out in zip(imgs, results):
        expect = plain.upscale(img)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5, rtol=1e-5)

    u8 = (imgs[0] * 255).astype(np.uint8)
    np.testing.assert_array_equal(meshed.upscale_u8(u8), plain.upscale_u8(u8))
    meshed.close()
    plain.close()


def test_server_survives_malformed_request(model_file, rng, tmp_path):
    """A garbage blob must error that one request with a status=1 reply
    carrying a diagnostic message, leave the SAME connection usable (v2
    persistent protocol), and leave the daemon serving."""
    from PIL import Image
    from simplesr_tpu.tools import serve as serve_mod

    sock_path = str(tmp_path / "sr.sock")
    ready, stop = threading.Event(), threading.Event()
    server = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(model_path=model_file, scale=2, socket_path=sock_path,
                    ready_event=ready, stop_event=stop, max_wait_ms=1),
        daemon=True)
    server.start()
    assert ready.wait(timeout=120)
    try:
        img_path = str(tmp_path / "ok.png")
        Image.fromarray(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                        ).save(img_path)
        with serve_mod.SRClient(sock_path) as client:
            # malformed: not an image → SRError with the server's reason
            with pytest.raises(serve_mod.SRError) as exc:
                client.upscale_bytes(b"this is not a PNG")
            assert "Error" in str(exc.value) or "error" in str(exc.value)
            # the SAME connection still serves real requests afterwards
            out = client.upscale_file(img_path)
            assert out.shape == (32, 32, 3)

        # and fresh connections work too
        out = serve_mod.request_upscale(sock_path, img_path)
        assert out.shape == (32, 32, 3)
    finally:
        stop.set()
        server.join(timeout=30)


def test_persistent_connection_many_requests(model_file, rng, tmp_path):
    """v2 protocol: many requests ride one socket; outputs match the
    one-shot path byte-for-byte."""
    from PIL import Image
    from simplesr_tpu.tools import serve as serve_mod

    sock_path = str(tmp_path / "sr.sock")
    ready, stop = threading.Event(), threading.Event()
    server = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(model_path=model_file, scale=2, socket_path=sock_path,
                    ready_event=ready, stop_event=stop, max_wait_ms=1),
        daemon=True)
    server.start()
    assert ready.wait(timeout=120)
    try:
        paths = []
        for i in range(3):
            p = str(tmp_path / f"in{i}.png")
            Image.fromarray(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                            ).save(p)
            paths.append(p)
        with serve_mod.SRClient(sock_path) as client:
            outs = [client.upscale_file(p) for p in paths]
        for p, out in zip(paths, outs):
            np.testing.assert_array_equal(
                out, serve_mod.request_upscale(sock_path, p))
    finally:
        stop.set()
        server.join(timeout=30)


def test_paired_predictor_matches_unpaired_any_batch(model_file, rng):
    """_as_predictor(paired=2): exact paired-trunk rewrite + internal
    padding — outputs must match the plain predictor for batches that are
    and are not multiples of `ways` (incl. batch 1)."""
    from simplesr_tpu.eval.evaluation import _as_predictor

    plain = _as_predictor(model_file)
    paired = _as_predictor(model_file, paired=2)
    for batch in (1, 2, 3, 4):
        x = jnp.asarray(rng.uniform(0, 1, (batch, 16, 16, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(paired(x)),
                                   np.asarray(plain(x)),
                                   atol=1e-5, rtol=1e-5)


def test_paired_predictor_rrdb(tmp_path, rng):
    from simplesr_tpu.eval.evaluation import _as_predictor

    gen = Generator.rrdb(upsample_factor=2, num_blocks=1, num_filters=8,
                         dtype=jnp.float32, input_dims=(16, 16))
    path = str(tmp_path / "rrdb.msgpack")
    save_model(gen.module_config(), gen.variables, path)
    plain = _as_predictor(path)
    paired = _as_predictor(path, paired=2)
    x = jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(paired(x)), np.asarray(plain(x)),
                               atol=1e-5, rtol=1e-5)


def test_paired_with_no_fast_keeps_training_form_tail(model_file, rng):
    """fast=False + paired: the paired trunk applies but the tail stays in
    training form — outputs match the plain no-fast predictor."""
    from simplesr_tpu.eval.evaluation import _as_predictor

    nofast = _as_predictor(model_file, fast=False)
    nofast_paired = _as_predictor(model_file, fast=False, paired=2)
    x = jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(nofast_paired(x)),
                               np.asarray(nofast(x)), atol=1e-5, rtol=1e-5)


def test_paired_composes_with_ensemble(model_file, rng):
    """--ensemble --paired: the self-ensemble wraps the padded paired
    predictor; output must match ensemble-over-plain (the ensemble's
    internal batches are whatever the transform groups produce, so the
    padding path is exercised for real)."""
    from simplesr_tpu.eval.evaluation import _as_predictor

    plain_ens = _as_predictor(model_file, ensemble=True)
    paired_ens = _as_predictor(model_file, ensemble=True, paired=2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(paired_ens(x)),
                               np.asarray(plain_ens(x)),
                               atol=1e-5, rtol=1e-5)


def test_engine_paired_serves_identical_bytes(model_file, rng):
    """SREngine(paired=2) must serve byte-identical uint8 results to the
    plain engine (exact rewrite + pad/slice through the bucket ladder)."""
    from simplesr_tpu.tools.serve import SREngine

    img = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
    plain = SREngine(model_file, scale=2, max_batch=2, max_wait_ms=1)
    want = np.asarray(plain.upscale_u8(img))
    plain.close()
    paired = SREngine(model_file, scale=2, max_batch=2, max_wait_ms=1,
                      paired=2)
    got = np.asarray(paired.upscale_u8(img))
    paired.close()
    # f32 reassociation noise in the larger contraction can flip a value
    # sitting exactly on a truncation boundary by one count
    assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1


def test_engine_ensemble_matches_library_op(model_file, rng):
    """SREngine(ensemble=True) serves exactly self_ensemble of the plain
    predictor, through the f32 and uint8 entry points."""
    from simplesr_tpu.tools.serve import SREngine
    from simplesr_tpu.eval.evaluation import _as_predictor
    from simplesr_tpu.ops import self_ensemble

    engine = SREngine(model_file, scale=2, max_batch=2, max_wait_ms=1,
                      ensemble=True)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = np.asarray(engine.upscale(img))

    predict = _as_predictor(model_file)
    want = np.asarray(self_ensemble(predict, jnp.asarray(img)[None])[0])
    np.testing.assert_allclose(out, want, atol=1e-5)

    u8 = (img * 255).astype(np.uint8)
    out_u8 = np.asarray(engine.upscale_u8(u8))
    want_u8 = np.asarray(self_ensemble(
        predict, jnp.asarray(u8, jnp.float32)[None] / 255.0)[0])
    want_u8 = np.clip((want_u8 + 1.0) * 127.5, 0, 255).astype(np.int16)
    assert np.abs(out_u8.astype(np.int16) - want_u8).max() <= 1
    engine.close()


def test_sigterm_graceful_shutdown(model_file, tmp_path):
    """CLI server: SIGTERM (systemd/docker stop) must exit cleanly and
    unlink the Unix socket — the same cleanup path as Ctrl-C."""
    import signal
    import subprocess
    import sys
    import time

    sock = str(tmp_path / "sr.sock")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from simplesr_tpu.tools.serve import main\n"
        f"raise SystemExit(main(['--model', {model_file!r}, '--scale', '2',"
        f" '--socket', {sock!r}]))\n")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 120
        while not os.path.exists(sock):
            assert proc.poll() is None, proc.communicate()[0].decode()
            assert time.time() < deadline, "server never bound its socket"
            time.sleep(0.2)
        proc.send_signal(signal.SIGTERM)
        out = proc.communicate(timeout=60)[0].decode()
        assert proc.returncode == 0, out
        assert not os.path.exists(sock), "stale socket left behind"
    finally:
        if proc.poll() is None:
            proc.kill()
