"""HTTP serving front-end (pipeline/server.py): JSON API over the pipelined
orchestrator — generate round-trip, validation errors, health and metrics."""

import base64
import io
import json
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest
from PIL import Image

from visualcloze_tpu.pipeline import random_components
from visualcloze_tpu.pipeline.server import run_server

pytestmark = pytest.mark.slow  # full-pipeline HTTP round trips


@pytest.fixture(scope="module")
def endpoint():
    model = random_components(
        jax.random.PRNGKey(0), tiny=True, resolution=64, attn_impl="xla"
    )
    httpd, fe = run_server(model, host="127.0.0.1", port=0, block=False)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, fe
    httpd.shutdown()
    fe.server.close()


def _b64(color):
    img = Image.new("RGB", (64, 64), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, body, path="/v1/generate"):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(endpoint):
    url, _ = endpoint
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert r.status == 200
        body = json.loads(r.read())
    assert body["ok"] is True and body["queue_depth"] == 0


def test_generate_round_trip_and_metrics(endpoint):
    url, fe = endpoint
    body = {
        "images": [
            [_b64((255, 0, 0)), _b64((0, 255, 0))],
            [_b64((0, 0, 255)), None],
        ],
        "prompts": ["grid layout", "task",
                    "The content of the last image in the final row is: x"],
        "seed": 7, "cfg": 4.0, "steps": 2, "upsampling": False,
    }
    status, out = _post(url, body)
    assert status == 200, out
    assert out["images"] and out["latency_s"] > 0 and len(out["id"]) == 12
    img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
    arr = np.asarray(img, np.float32)
    assert arr.ndim == 3 and np.isfinite(arr).all()

    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "visualcloze_requests_total 1" in text
    assert "visualcloze_failures_total 0" in text
    assert 'visualcloze_latency_seconds{quantile="0.5"}' in text


def test_generate_validation_errors(endpoint):
    url, _ = endpoint
    status, out = _post(url, {"prompts": ["a"]})
    assert status == 400 and "images" in out["error"]
    status, out = _post(url, {
        "images": [[_b64((1, 1, 1))], [_b64((1, 1, 1)), None]],
        "prompts": ["a", "b", "c"],
    })
    assert status == 400 and "ragged" in out["error"]
    status, out = _post(url, {
        "images": [[_b64((1, 1, 1)), None]],
        "prompts": ["a", "b", "c"],
        "grid_size": [2, 2],
    })
    assert status == 400 and "grid_size" in out["error"]


def test_unknown_paths_404(endpoint):
    url, _ = endpoint
    status, _ = _post(url, {}, path="/v1/nope")
    assert status == 404
    try:
        urllib.request.urlopen(url + "/nope", timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_malformed_image_payload_is_a_client_error(endpoint):
    """Bad base64 / non-image bytes / string rows are 400s, not 500s, and
    don't pollute the failure metric."""
    url, fe = endpoint
    fails_before = fe.metrics.failures_total
    status, out = _post(url, {
        "images": [["!!notbase64", None]],
        "prompts": ["a", "b", "c"],
    })
    assert status == 400 and "invalid image cell" in out["error"]
    status, out = _post(url, {"images": ["abc"], "prompts": ["a", "b", "c"]})
    assert status == 400 and "row lists" in out["error"]
    assert fe.metrics.failures_total == fails_before
    assert fe.metrics.client_errors_total >= 2


def test_non_pair_grid_size_and_bad_scalars_are_client_errors(endpoint):
    """A scalar grid_size (or a null scalar param) must map to 400, not a
    TypeError-driven 500 that pollutes the failure metric."""
    url, fe = endpoint
    fails_before = fe.metrics.failures_total
    status, out = _post(url, {
        "images": [[_b64((1, 1, 1)), None]],
        "prompts": ["a", "b", "c"],
        "grid_size": 2,
    })
    assert status == 400 and "grid_size" in out["error"]
    status, out = _post(url, {
        "images": [[_b64((1, 1, 1)), None]],
        "prompts": ["a", "b", "c"],
        "seed": None,
    })
    assert status == 400 and "parameter" in out["error"]
    assert fe.metrics.failures_total == fails_before


def test_wedged_backend_times_out_with_504():
    """A backend future that never resolves must not pin the admission slot
    forever: the handler returns 504 after result_timeout_s and counts a
    server failure."""
    from concurrent.futures import Future

    from visualcloze_tpu.pipeline.server import run_frontend

    class WedgedServer:
        def submit(self, *a, **k):
            return Future()  # never resolves

        def close(self):
            pass

    httpd, fe = run_frontend(
        WedgedServer(), host="127.0.0.1", port=0, block=False,
        result_timeout_s=0.3,
    )
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        status, out = _post(url, {"images": [[None]], "prompts": ["a", "b", "c"]})
        assert status == 504 and "timeout" in out["error"]
        assert fe.metrics.failures_total == 1
        assert fe.queue_depth == 0  # slot released
    finally:
        httpd.shutdown()


def test_serve_cli_smoke(tmp_path):
    """serve.py end-to-end as a subprocess (the exact path bench.py's
    resident-serving phase drives): boot --demo with grid + SDEdit-bucket
    warmup, answer /healthz, serve one /v1/generate POST with an
    upsampling-capable payload, exit cleanly."""
    import os
    import socket
    import subprocess
    import sys
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    log = open(tmp_path / "serve.log", "w")
    child = subprocess.Popen(
        [sys.executable, os.path.join(here, "serve.py"), "--demo",
         "--port", str(port), "--warmup_grids", "1x2",
         "--warmup_upsampling", "96x96", "--max_inflight", "2"],
        stdout=log, stderr=subprocess.STDOUT, cwd=here, env=env,
    )
    url = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 900  # demo boot ~6 min on a contended 1-CPU box
        while True:
            assert child.poll() is None, (
                f"serve.py died rc={child.returncode}: "
                f"{(tmp_path / 'serve.log').read_text()[-2000:]}"
            )
            try:
                with urllib.request.urlopen(url + "/healthz", timeout=5) as r:
                    if r.status == 200:
                        break
            except (urllib.error.URLError, OSError):
                pass
            assert time.time() < deadline, "serve.py boot timed out"
            time.sleep(2)
        status, out = _post(url, {
            "images": [[_b64((40, 90, 200)), None]],
            "prompts": ["warm", "", "a square"],
            "grid_size": [1, 2],
            "seed": 3,
            "steps": 4,
            "upsampling": True,
            "upsampling_steps": 4,
            "upsampling_noise": 0.4,
        })
        assert status == 200, out
        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        assert img.size[0] >= 64
    finally:
        child.terminate()
        try:
            child.wait(30)
        except subprocess.TimeoutExpired:
            child.kill()
        log.close()
