"""HTTP serving front end: dynamic batching, MCTS endpoint, introspection.

Starts a real ``ThreadingHTTPServer`` on an ephemeral port around a tiny
pipeline with the hermetic FakeBackend and drives it with concurrent
urllib clients: concurrently queued one-shot requests must fuse into one
engine wave (pinned via the server's ``batched`` counter), the MCTS
endpoint must return scored candidates, and malformed requests must fail
with 400 without wedging the scheduler.
"""
import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.infer import DetikzifyPipeline, FakeBackend, set_backend
from detikzify_tpu.models import detikzify
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
from detikzify_tpu.serve import _parse_job, make_server


@pytest.fixture(scope="module", autouse=True)
def fake_compiler():
    set_backend(FakeBackend())
    yield
    set_backend(None)


def _figure(seed=0):
    img = Image.new("RGB", (100, 80), "white")
    ImageDraw.Draw(img).rectangle([8 + seed, 8, 92, 72], outline="black",
                                  width=2)
    return img


def _b64(img) -> str:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test_config(vocab_size=512).replace(model_max_length=96)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    pipe = DetikzifyPipeline(params, cfg, DetikzifyProcessor(tok, cfg),
                             num_slots=4, max_len=96, metric="fast")
    httpd, inference = make_server(pipe, port=0, batch_window_s=1.0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    # warm the compiled decode programs so batching timing is deterministic
    pipe.sample(image=_figure(), temperature=0.0)
    yield base, inference
    httpd.shutdown()
    inference.stop()
    httpd.server_close()


def _post(base, payload, timeout=300):
    req = urllib.request.Request(
        base + "/v1/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz_and_404(server):
    base, _ = server
    status, body = _get(base, "/healthz")
    assert status == 200 and body["status"] == "ok"
    assert body["num_slots"] == 4
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/nope")
    assert e.value.code == 404


def test_concurrent_sampling_requests_batch_into_one_wave(server):
    base, inference = server
    before = dict(inference.requests)
    payload = {"image": _b64(_figure()), "algorithm": "sampling",
               "temperature": 0.0, "max_new_tokens": 12}
    results = [None] * 3

    def call(i):
        results[i] = _post(base, dict(payload, image=_b64(_figure(i))))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for status, body in results:
        assert status == 200
        assert isinstance(body["code"], str)
        assert isinstance(body["compiled"], bool)
        assert isinstance(body["errors"], dict)
    assert inference.requests["sample"] - before["sample"] == 3
    # identical sampling params queued within the window -> one fused wave
    assert inference.requests["batched"] - before["batched"] >= 2


def test_mcts_endpoint_returns_scored_candidates(server):
    base, _ = server
    status, body = _post(base, {
        "image": _b64(_figure()), "algorithm": "mcts", "expansions": 2,
        "temperature": 0.7})
    assert status == 200
    assert body["candidates"]
    for cand in body["candidates"]:
        assert set(cand) >= {"code", "compiled", "errors", "score"}
    if body["compiled"]:
        assert body["score"] == max(c["score"] for c in body["candidates"]
                                    if c["compiled"])


def test_text_conditioned_requests_run_singleton(server):
    # tiny model has no adapter: a caption must error cleanly, not wedge
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"image": _b64(_figure()), "text": "a caption"})
    assert e.value.code == 500
    # the scheduler survives: the next plain request still works
    status, _ = _post(base, {"image": _b64(_figure()),
                             "temperature": 0.0, "max_new_tokens": 8})
    assert status == 200


def test_bad_requests_get_400(server):
    base, _ = server
    for payload in ({}, {"image": "!!not-base64!!"},
                    {"image": _b64(_figure()), "algorithm": "alien"}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, payload)
        assert e.value.code == 400


def test_metrics_shape(server):
    base, _ = server
    status, body = _get(base, "/metrics")
    assert status == 200
    assert body["num_slots"] == 4
    assert body["engine"]["decode_dispatches"] > 0
    assert body["requests"]["sample"] >= 1
    assert "prefix_pages_used" in body and "queue_depth" in body


def test_parse_job_validation():
    with pytest.raises(ValueError, match="image"):
        _parse_job({})
    with pytest.raises(ValueError, match="JSON object"):
        _parse_job([1, 2])
    job = _parse_job({"image": _b64(_figure()), "algorithm": "mcts",
                      "expansions": "3", "top_k": 5.0, "timeout": 1.5})
    assert job.kind == "mcts" and job.expansions == 3
    assert job.sampling["top_k"] == 5 and job.timeout == 1.5
    assert job.batch_key() is None            # mcts never fuses
    sample = _parse_job({"image": _b64(_figure()), "temperature": 0.1})
    assert sample.batch_key() is not None
