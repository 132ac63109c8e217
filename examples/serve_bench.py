#!/usr/bin/env python
"""Load-test the HTTP serving front end (detikzify_tpu/serve.py).

Spins up the server in-process around a DS-1.3b-shaped engine
(zero-initialized weights -- decode throughput is weight-value-
independent) and fires concurrent one-shot clients that share a sampling
key, so the scheduler fuses them into continuous-batched engine waves;
one extra client exercises the SSE streaming path concurrently. Reports
end-to-end requests/min, aggregate decode tok/s, and the fused fraction
straight from ``/metrics``.

The reference has no serving front end to compare against -- this
measures OUR serving layer's overhead on top of the raw engine numbers
bench.py reports (same engine shape: int8, 16 slots, block 128).

Usage::

    python examples/serve_bench.py [--requests 48] [--clients 16]
        [--max-new-tokens 160] [--tiny]   # --tiny: CPU-sized smoke run
"""
import argparse
import base64
import http.client
import io
import json
import os
import sys
import threading
import time

# runnable as a bare subprocess (bench.py serve_bench_leg): the script's
# own dir -- not the repo root -- is what python puts on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=48)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--max-new-tokens", type=int, default=160)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config on CPU (smoke test, not a benchmark)")
    args = p.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from PIL import Image, ImageDraw

    from detikzify_tpu.config import get_config, tiny_test_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.ops.sampling import SamplingParams
    from detikzify_tpu.infer import DetikzifyPipeline, FakeBackend, \
        set_backend
    from detikzify_tpu.models import detikzify
    from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
    from detikzify_tpu.serve import make_server

    set_backend(FakeBackend())
    if args.tiny:
        cfg = tiny_test_config(vocab_size=512).replace(model_max_length=96)
        params = detikzify.init(jax.random.PRNGKey(0), cfg)
        engine_kw = dict(num_slots=4, max_len=96)
    else:
        from detikzify_tpu.ops.quant import (fuse_projections,
                                             quantize_params)

        cfg = get_config("detikzify-ds-1.3b").replace(model_max_length=640)
        params = jax.tree_util.tree_map(
            lambda s: jax.numpy.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda: detikzify.init(jax.random.PRNGKey(0),
                                                  cfg, dtype="bfloat16")))
        # int8 serving tree + fused qkv/gate-up, same as bench.py's
        # headline engine; measured-best throughput shape (docs/SERVING.md)
        params = fuse_projections(quantize_params(params))
        engine_kw = dict(num_slots=16, max_len=640, decode_block=128)
    tok = ByteTokenizer(vocab_size=cfg.text.vocab_size,
                        image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id,
                        pad_token_id=cfg.pad_token_id,
                        model_max_length=cfg.model_max_length)
    engine = DecodeEngine(params, cfg, sampling=SamplingParams(
        temperature=0.8, top_p=0.95, top_k=0), **engine_kw)
    pipe = DetikzifyPipeline(params, cfg, DetikzifyProcessor(tok, cfg),
                             engine=engine, metric="fast")
    httpd, inference = make_server(pipe, "127.0.0.1", 0,
                                   batch_window_s=0.05, max_pending=256)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    img = Image.new("RGB", (420, 420), "white")
    ImageDraw.Draw(img).rectangle([40, 40, 380, 380], outline="black",
                                  width=3)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    payload = json.dumps({"image": b64, "temperature": 0.8,
                          "max_new_tokens": args.max_new_tokens}).encode()

    def post(path="/v1/generate", body=payload):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", path, body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        return resp.status, data

    # warm the compiled programs (start + decode shapes) off the clock
    status, _ = post()
    assert status == 200, status
    print(f"warmup ok; {args.requests} requests from {args.clients} "
          f"clients, max_new_tokens={args.max_new_tokens}", flush=True)

    base = inference.metrics()
    errors, lock = [], threading.Lock()
    todo = list(range(args.requests))
    lat_idle = []           # client-side sampling latencies, idle server

    def client(lat=lat_idle):
        while True:
            with lock:
                if not todo:
                    return
                todo.pop()
            t_req = time.perf_counter()
            status, data = post()
            with lock:
                lat.append(time.perf_counter() - t_req)
            if status != 200:
                with lock:
                    errors.append((status, data[:200]))

    def stream_client():
        # one SSE consumer alongside the batch: must not stall the waves
        status, data = post("/v1/stream")
        if status != 200 or b"event: result" not in data:
            with lock:
                errors.append(("stream", data[:200]))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client)
               for _ in range(args.clients)] + \
              [threading.Thread(target=stream_client)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    m = inference.metrics()
    served = (m["requests"]["sample"] - base["requests"]["sample"])
    batched = (m["requests"]["batched"] - base["requests"]["batched"])
    toks = (m["engine"]["decode_tokens"] - base["engine"]["decode_tokens"])
    assert not errors, errors[:3]
    assert served == args.requests + 1, (served, args.requests)

    def pct(xs, q):
        s = sorted(xs)
        return s[min(len(s) - 1, int(round(q * (len(s) - 1))))]

    result = {
        "requests": served,
        "wall_s": round(wall, 2),
        "requests_per_min": round(60 * served / wall, 1),
        "decode_tok_s": round(toks / wall, 1),
        "fused_fraction": round(batched / served, 3),
        "sample_p50_s": round(pct(lat_idle, 0.5), 3),
        "sample_p95_s": round(pct(lat_idle, 0.95), 3),
        "failed": m["requests"]["failed"] - base["requests"]["failed"],
    }

    # --- mixed workload: one MCTS search monopolizing its slot share
    # while sampling clients keep arriving. Sampling latency must stay
    # near its idle value (no head-of-line blocking: the search's on_tick
    # hook interleaves the waves into reserved slots).
    mcts_budget = 12 if args.tiny else 45
    mcts_payload = json.dumps({
        "image": b64, "algorithm": "mcts", "timeout": mcts_budget,
        "temperature": 0.8}).encode()
    mcts_out = {}

    def mcts_client():
        t_req = time.perf_counter()
        status, data = post(body=mcts_payload)
        mcts_out.update(
            status=status, wall=time.perf_counter() - t_req,
            candidates=len(json.loads(data).get("candidates", []))
            if status == 200 else 0)

    mt = threading.Thread(target=mcts_client)
    mt.start()
    while inference.metrics()["active_mcts"] == 0 and mt.is_alive():
        time.sleep(0.02)
    lat_mixed = []
    todo.extend(range(max(4, args.requests // 2)))
    mixed_clients = [
        threading.Thread(target=client, args=(lat_mixed,))
        for _ in range(max(2, args.clients // 4))]
    t0 = time.perf_counter()
    for t in mixed_clients:
        t.start()
    for t in mixed_clients:
        t.join()
    mixed_wall = time.perf_counter() - t0
    mt.join()
    assert not errors, errors[:3]
    assert mcts_out["status"] == 200, mcts_out
    result.update({
        "mixed_requests": len(lat_mixed),
        "mixed_wall_s": round(mixed_wall, 2),
        "mixed_sample_p50_s": round(pct(lat_mixed, 0.5), 3),
        "mixed_sample_p95_s": round(pct(lat_mixed, 0.95), 3),
        "mixed_vs_idle_p95": round(pct(lat_mixed, 0.95)
                                   / max(pct(lat_idle, 0.95), 1e-9), 2),
        "mcts_budget_s": mcts_budget,
        "mcts_candidates_during_mix": mcts_out["candidates"],
        "server_latency_s": inference.metrics()["latency_s"],
    })
    print(json.dumps(result))
    inference.stop()
    httpd.shutdown()


if __name__ == "__main__":
    main()
