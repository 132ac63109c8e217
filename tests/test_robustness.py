"""Robustness and edge-case tests: engine limits, webui streaming without
gradio, config serialization, harness p50."""
import numpy as np
import jax
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import (DetikzifyConfig, get_config,
                                  tiny_test_config)
from detikzify_tpu.engine import DecodeEngine
from detikzify_tpu.evaluate.harness import (generate_until_compilable,
                                            p50_time_to_first_compile)
from detikzify_tpu.infer import DetikzifyPipeline, FakeBackend, set_backend
from detikzify_tpu.models import detikzify
from detikzify_tpu.ops.sampling import SamplingParams
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor


@pytest.fixture(scope="module", autouse=True)
def fake_compiler():
    set_backend(FakeBackend())
    yield
    set_backend(None)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(vocab_size=512).replace(model_max_length=96)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    return cfg, params, DetikzifyProcessor(tok, cfg)


def _figure():
    img = Image.new("RGB", (100, 80), "white")
    ImageDraw.Draw(img).rectangle([8, 8, 92, 72], outline="black", width=2)
    return img


def test_engine_slot_exhaustion(setup):
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=64,
                       sampling=SamplingParams(temperature=0.0))
    r1 = eng.start([cfg.bos_token_id, 1], max_new_tokens=4, lazy=True)
    r2 = eng.start([cfg.bos_token_id, 2], max_new_tokens=4, lazy=True)
    with pytest.raises(RuntimeError, match="no free slots"):
        eng.start([cfg.bos_token_id, 3], max_new_tokens=4)
    eng.run()
    eng.release(r1)
    eng.release(r2)
    assert len(eng._free_slots) == 2
    # double release is a no-op
    eng.release(r1)
    assert len(eng._free_slots) == 2


def test_prefix_store_lru_eviction(setup):
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=64,
                       sampling=SamplingParams(temperature=0.0),
                       prefix_budget_bytes=1)  # floor: 2-page budget
    ro = eng.start([cfg.bos_token_id, 1, 2, 3, 4, 5] + list(range(6, 40)),
                   max_new_tokens=4)
    eng.run()
    # occupy the second slot too: live slots and the store share one pool,
    # so pressure needs both slot reserves held
    other = eng.start([cfg.bos_token_id, 9], max_new_tokens=2)
    eng.run()
    # each short prefix copy-on-writes one boundary page (page_size=128 >
    # lengths, no full shared pages); the 2-page budget LRU-evicts the
    # oldest on the third store
    a = eng.store_prefix("a", ro, length=3)
    eng.store_prefix("b", ro, length=20)
    eng.store_prefix("c", ro, length=30)
    assert len(eng._prefix_store) == 2
    assert a.dropped                      # evicted handles are flagged...
    eng.release(other)
    r2 = eng.start([cfg.bos_token_id, 1, 2], max_new_tokens=2, prefix=a)
    eng.run()                             # ...and silently fall back
    assert len(r2.token_ids) > 3
    eng.release(ro)
    eng.release(r2)


def test_prefix_pages_shared_across_tree_depth(setup):
    """Copy-on-write pages: a chain of nested prefixes stores each token's
    KV once -- unique pages grow ~linearly with DEPTH of the deepest node,
    not with the SUM of prefix lengths (VERDICT next-step #10)."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96,
                       sampling=SamplingParams(temperature=0.0),
                       page_size=16)
    prompt = [cfg.bos_token_id] + list(range(1, 80))
    ro = eng.start(prompt, max_new_tokens=8)
    eng.run()

    sps = [eng.store_prefix(f"n{n}", ro, length=n) for n in (32, 48, 64, 80)]
    assert all(sp is not None for sp in sps)
    # naive copies would hold 2+3+4+5 = 14 pages; sharing holds 5
    assert eng.prefix_pages_used == 80 // 16
    # deeper prefixes literally reuse the shallower ones' page ids
    assert sps[1].pages[:2] == sps[0].pages
    assert sps[3].pages[:3] == sps[2].pages[:3]

    # restore-equivalence from a shared-page prefix
    full = list(ro.token_ids)
    eng.release(ro)
    node = full[:64]
    r_prefix = eng.start(node, max_new_tokens=6, prefix=sps[2])
    eng.run()
    r_fresh = eng.start(node, max_new_tokens=6)
    eng.run()
    assert r_prefix.token_ids == r_fresh.token_ids


def test_webui_inference_streams_without_gradio(setup):
    """webui.inference is plain Python generators -- drive it directly."""
    from detikzify_tpu.webui.webui import inference

    cfg, params, processor = setup
    pipe = DetikzifyPipeline(params, cfg, processor, num_slots=2,
                             max_len=96)
    outputs = list(inference(pipe, _figure(), algorithm="mcts",
                             expansions=2))
    assert outputs
    code, mcts_out = outputs[-1]
    assert isinstance(code, str)
    # sampling mode too
    outputs = list(inference(pipe, _figure(), algorithm="sampling"))
    assert len(outputs) == 1


def test_generate_until_compilable(setup):
    cfg, params, processor = setup
    pipe = DetikzifyPipeline(params, cfg, processor, num_slots=2,
                             max_len=96, metric="fast")
    result = generate_until_compilable(pipe, _figure(), max_expansions=5)
    assert result.num_programs >= 1
    assert result.seconds > 0
    assert p50_time_to_first_compile([result.seconds]) == result.seconds


def test_config_json_roundtrip():
    cfg = get_config("detikzify-v2-8b")
    as_dict = cfg.to_dict()
    back = DetikzifyConfig.from_dict(as_dict)
    assert back == cfg
    assert back.text.rope_scaling == cfg.text.rope_scaling
    tiny = tiny_test_config()
    assert DetikzifyConfig.from_dict(tiny.to_dict()) == tiny


def test_webui_build_ui_requires_gradio():
    from detikzify_tpu.webui.webui import build_ui

    with pytest.raises(ImportError, match="gradio"):
        build_ui()


def test_parallel_mcts_stress_random_compile_outcomes(setup):
    """Seeded stress: parallel searches against a compiler with
    content-keyed pseudo-random latency and hard failures (including
    UNLOCATABLE errors, log line 0) must stream the requested number of
    scored results and leave the engine + tree structurally consistent --
    the refill loop keeps decode, compile, and score stages all busy, so
    this exercises wave launch, error-line-bounded attach, failed-rollout
    replay, and cleanup under adversarial compile timing."""
    import time
    import zlib

    from detikzify_tpu.infer.generator import DetikzifyGenerator
    from detikzify_tpu.infer.tikz import CompileResult, CompileService

    cfg, params, processor = setup

    class JitterBackend:
        """Deterministic (content-addressed) latency + failure injection
        on top of FakeBackend semantics."""

        def __init__(self):
            self.base = FakeBackend()

        def compile(self, code, timeout=60):
            h = zlib.crc32(code.encode())
            time.sleep((h % 7) * 0.02)          # 0-120 ms jitter
            if h % 5 == 0:                      # hard, unlocatable failure
                return CompileResult(status=2, log="! Emergency stop.\n")
            return self.base.compile(code, timeout)

        def rasterize(self, pdf, size=420):
            return None

    backend = JitterBackend()
    set_backend(backend)
    try:
        eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                           page_size=16)
        for parallelism, expansions in ((2, 10), (4, 12)):
            gen = DetikzifyGenerator(
                engine=eng, processor=processor, image=_figure(),
                metric=None,                    # fast mode: scores -1/0/1
                compile_service=CompileService(workers=3, backend=backend))
            results = list(gen.simulate(expansions=expansions,
                                        parallelism=parallelism))
            assert len(results) == expansions
            assert all(s in (-1, 0, 1) for s, _ in results)
            assert eng.num_free_slots == eng.num_slots
            assert not eng._rollouts

            def walk(n):
                yield n
                for c in n.children:
                    yield from walk(c)
            for node in walk(gen.root):
                assert node.visits >= 0
            assert gen.root.visits == len(gen.root._rewards)
            assert gen.montecarlo.stats_expansion_count == expansions
            gen.close()
    finally:
        set_backend(FakeBackend())
