"""End-to-end pipeline tests: sample() and MCTS simulate() on a tiny model
with the hermetic fake compiler (SURVEY §4 test strategy)."""
import numpy as np
import jax
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.infer import DetikzifyPipeline, FakeBackend, set_backend
from detikzify_tpu.infer.tikz import TikzDocument
from detikzify_tpu.models import detikzify
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor


@pytest.fixture(scope="module", autouse=True)
def fake_compiler():
    set_backend(FakeBackend())
    yield
    set_backend(None)


@pytest.fixture(scope="module")
def pipeline():
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(7), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    processor = DetikzifyProcessor(tok, cfg)
    return DetikzifyPipeline(params, cfg, processor, num_slots=4, max_len=96)


@pytest.fixture(scope="module")
def figure():
    img = Image.new("RGB", (180, 120), "white")
    d = ImageDraw.Draw(img)
    d.rectangle([10, 10, 170, 110], outline="black", width=2)
    d.ellipse([40, 30, 140, 90], outline="red", width=2)
    return img


def test_sample_returns_document(pipeline, figure):
    doc = pipeline.sample(image=figure)
    assert isinstance(doc, TikzDocument)
    assert isinstance(doc.code, str)


def test_simulate_yields_scored_documents(pipeline, figure):
    results = list(pipeline.simulate(image=figure, expansions=3))
    assert len(results) == 3
    for score, doc in results:
        assert isinstance(doc, TikzDocument)
        assert isinstance(score, (int, float))
        if doc.is_rasterizable:
            assert -1.0 <= score <= 1.0   # SelfSim cosine range
        else:
            assert score == -1


def test_simulate_fast_mode(pipeline, figure):
    """metric='fast' scores from compiler diagnostics in {-1, 0, 1}."""
    pipe = DetikzifyPipeline(pipeline.engine.params, pipeline.cfg,
                             pipeline.processor, metric="fast",
                             engine=pipeline.engine)
    results = list(pipe.simulate(image=figure, expansions=2))
    assert len(results) == 2
    assert all(score in (-1, 0, 1) for score, _ in results)


def test_mcts_grows_tree_and_reuses_prefixes(pipeline, figure):
    gen = pipeline._generator(figure, None, True, metric=pipeline.metric)
    try:
        for _ in gen.simulate(expansions=4):
            pass
        root = gen.root
        # the root always carries its widen child; expansions attach more
        assert len(root.children) >= 1
        assert gen.montecarlo.stats_expansion_count == 4
        assert gen.stats["rollouts"] >= 1
        # after the first expansion, later rollouts must restore stored
        # prefixes (at minimum the root-adjacent nodes) instead of
        # re-prefilling from scratch
        if any(not c.is_widen_node for c in root.children):
            assert gen.stats["prefix_hits"] >= 1
    finally:
        gen.close()


def test_sequential_abort_stops_search(pipeline, figure):
    """control.abort() must end the whole SEQUENTIAL search (reference
    raises InterruptedError, generate.py:278-280), not just the in-flight
    rollout -- rollout() resets the flag per rollout, so without the loop
    check an aborted search keeps running."""
    gen = pipeline._generator(figure, None, True, metric=pipeline.metric)
    try:
        results = []
        for item in gen.simulate(expansions=50):
            results.append(item)
            gen.control.abort()
        assert len(results) == 1
    finally:
        gen.close()


def test_simulate_respects_timeout(pipeline, figure):
    results = list(pipeline.simulate(image=figure, expansions=50,
                                     timeout=1e-6))
    assert len(results) <= 1


def test_text_without_adapter_rejected(pipeline):
    with pytest.raises(ValueError):
        pipeline.sample(text="a caption")


def test_requires_some_input(pipeline):
    with pytest.raises(ValueError):
        pipeline.sample()


def test_simulate_parallel(pipeline, figure):
    """Parallel expansions produce the same kind of results and grow the
    tree; all engine slots are freed afterwards."""
    engine = pipeline.engine
    free_before = len(engine._free_slots)
    results = list(pipeline.simulate(image=figure, expansions=6,
                                     parallelism=3))
    assert len(results) == 6
    for score, doc in results:
        assert isinstance(score, (int, float))
        if doc.is_rasterizable:
            assert -1.0 <= score <= 1.0
    assert len(engine._free_slots) == free_before
    assert not engine._rollouts


def test_simulate_parallel_virtual_loss_reverted(pipeline, figure):
    gen = pipeline._generator(figure, None, True, metric=pipeline.metric)
    try:
        results = list(gen.simulate(expansions=4, parallelism=2))
        assert len(results) == 4
        root = gen.root
        # visits on root must equal total backprops (virtual loss reverted)
        assert root.visits == sum(len(n._rewards) for n in [root])
        assert gen.montecarlo.stats_expansion_count == 4
    finally:
        gen.close()


def test_parallel_abort_cleans_up_inflight_stages(pipeline, figure):
    """Aborting a PARALLEL search with expansions in every stage
    (decoding, compiling, score-dispatched) must free all engine slots,
    finish all rollouts, and revert the virtual losses of expansions that
    never completed -- the refill loop keeps more expansions in flight
    than ``parallelism``, so the cleanup path covers all three lists."""
    from detikzify_tpu.infer.generator import DetikzifyGenerator
    from detikzify_tpu.infer.tikz import CompileService

    backend = FakeBackend(latency=0.2)
    set_backend(backend)
    try:
        gen = DetikzifyGenerator(
            engine=pipeline.engine, processor=pipeline.processor,
            image=pipeline.load(figure, True), metric=pipeline.metric,
            compile_service=CompileService(workers=3, backend=backend))
        free_before = pipeline.engine.num_free_slots
        completed = 0
        for _ in gen.simulate(expansions=30, parallelism=3):
            completed += 1
            if completed == 2:
                gen.control.abort()
        assert completed < 30                      # actually aborted
        assert pipeline.engine.num_free_slots == free_before
        assert not pipeline.engine._rollouts
        # every remaining visit corresponds to a real backprop: virtual
        # losses of launched-but-never-completed expansions were reverted
        def walk(n):
            yield n
            for c in n.children:
                yield from walk(c)
        for node in walk(gen.root):
            assert node.visits >= 0
        assert gen.root.visits == len(gen.root._rewards)
        gen.close()
    finally:
        set_backend(FakeBackend())


def test_sample_batch(pipeline, figure):
    from PIL import ImageDraw, Image as PILImage

    figs = [figure]
    for i in range(3):
        img = PILImage.new("RGB", (120, 90), "white")
        ImageDraw.Draw(img).line([5 + i * 10, 5, 110, 80], fill="red",
                                 width=2)
        figs.append(img)
    docs = pipeline.sample_batch(figs, max_new_tokens=8)
    assert len(docs) == 4
    assert all(isinstance(d.code, str) for d in docs)
    assert len(pipeline.engine._free_slots) == pipeline.engine.num_slots


def test_remat_forward_matches():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detikzify_tpu.config import tiny_test_config
    from detikzify_tpu.models import detikzify

    cfg = tiny_test_config(128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    ids = np.full((1, cfg.image_seq_len + 4), cfg.image_token_id, np.int32)
    ids[0, cfg.image_seq_len:] = [cfg.bos_token_id, 5, 6, 7]
    pix = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)
    labels = jnp.asarray(np.where(ids == cfg.image_token_id, -100, ids))

    def loss(p, remat):
        _, l = detikzify.forward(p, cfg, jnp.asarray(ids), pix,
                                 labels=labels, attn_impl="xla", remat=remat)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_per_call_generation_overrides(pipeline, figure):
    """Reference gen_kwargs pass-through (generate.py:404,436): sampling
    params, max_length, and compile_timeout can all be overridden per call
    without touching the pipeline defaults."""
    doc = pipeline.sample(image=figure, temperature=0.0, top_p=1.0,
                          top_k=0, max_length=80, compile_timeout=5)
    assert isinstance(doc, TikzDocument)
    assert doc.timeout == 5
    # pipeline defaults untouched
    assert pipeline.compile_timeout == 60.0
    assert pipeline.engine.sampling.temperature == 0.8


def test_wave_scoring_shares_score_memo_and_dedups(pipeline, figure):
    """The batched wave scorer shares the sequential path's score memo
    (reference generate.py:192 memoizes score on image bytes, making
    terminal leaf revisits free): cached renders are skipped (completion
    falls back to the memo), in-wave duplicate renders encode once, and
    resolved values are written back so later revisits never re-encode."""
    import concurrent.futures as cf

    gen = pipeline._generator(figure, None, True, metric=pipeline.metric)
    try:
        class _Doc:
            is_rasterizable = True
            compiled_with_errors = False

            def __init__(self, img):
                self._img = img

            def rasterize(self):
                return self._img

        def _exp(img):
            e = type("_E", (), {})()
            fut = cf.Future()
            fut.set_result(_Doc(img))
            e.future = fut
            return e

        red = Image.new("RGB", (64, 64), "red")
        blue = Image.new("RGB", (64, 64), "blue")
        exps = [_exp(red), _exp(blue), _exp(red)]   # in-wave duplicate
        pending = gen._dispatch_scores(exps)
        assert pending is not None
        _dev, k, _keys, _bytes, _seen = pending
        assert k == 2                       # red encoded once, not twice
        out = gen._resolve_scores(pending)
        assert len(out) == 3                # every expansion resolved
        assert out[id(exps[0])] == out[id(exps[2])]
        # write-back: both renders are now in the sequential memo
        memo = gen.score.cache
        assert red.tobytes() in memo and blue.tobytes() in memo
        assert memo[red.tobytes()] == out[id(exps[0])]
        # memo-aware skip: a wave of only already-scored renders
        # dispatches NO encoder pass and counts the hits
        hits0 = gen.stats["score_memo_hits"]
        assert gen._dispatch_scores([_exp(red), _exp(blue)]) is None
        assert gen.stats["score_memo_hits"] == hits0 + 2
        # the completion fallback (self.score) serves the memoized value
        assert gen.score(red) == out[id(exps[0])]
    finally:
        gen.close()
