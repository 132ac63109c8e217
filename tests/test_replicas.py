"""Replica-parallel inference: one model replica + decode engine per local
device, in one process (the reference's one-model-per-rank eval placement,
``/root/reference/examples/eval.py:110-133``, done TPU-natively)."""
import jax
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.infer import DetikzifyPipeline, FakeBackend, set_backend
from detikzify_tpu.models import detikzify
from detikzify_tpu.parallel.replicas import ReplicaPool
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    return cfg, params, DetikzifyProcessor(tok, cfg)


def _figures(n):
    figs = []
    for i in range(n):
        img = Image.new("RGB", (64, 64), "white")
        ImageDraw.Draw(img).rectangle([4 + 2 * i, 4, 60, 60 - 3 * i],
                                      outline="black", width=2)
        figs.append(img)
    return figs


def test_replicas_live_on_distinct_devices(setup):
    cfg, params, processor = setup
    pool = ReplicaPool(params, cfg, processor, devices=jax.devices()[:4],
                       metric="fast", num_slots=2, max_len=96)
    assert len(pool) == 4
    devs = [next(iter(p.engine.cache.k.devices())) for p in pool.pipelines]
    assert len(set(devs)) == 4
    for pipe, d in zip(pool.pipelines, devs):
        assert next(iter(
            pipe.engine.params.text["embed_tokens"].devices())) == d


def test_pool_greedy_matches_single_pipeline(setup):
    """A replica must behave exactly like a standalone pipeline: greedy
    one-shot samples agree token-for-token regardless of which chip served
    the request."""
    cfg, params, processor = setup
    img = _figures(1)[0]
    single = DetikzifyPipeline(params, cfg, processor, metric="fast",
                               temperature=0.0, num_slots=2, max_len=96)
    want = single.sample(image=img).code
    pool = ReplicaPool(params, cfg, processor, devices=jax.devices()[:2],
                       metric="fast", temperature=0.0, num_slots=2,
                       max_len=96)
    docs = pool.map_sample([img, img])
    assert [d.code for d in docs] == [want, want]


def test_map_until_compilable_across_replicas(setup):
    """The eval per-item protocol stripes across replica threads; every
    item completes and slots are drained on every replica."""
    cfg, params, processor = setup
    set_backend(FakeBackend())
    try:
        pool = ReplicaPool(params, cfg, processor,
                           devices=jax.devices()[:2], metric="fast",
                           num_slots=2, max_len=96)
        results = pool.map_until_compilable(
            _figures(5), max_expansions=3, parallelism=2)
        assert len(results) == 5
        for r in results:
            assert not isinstance(r, Exception), r
            assert r.num_programs >= 1
        for pipe in pool.pipelines:
            assert not pipe.engine._rollouts
    finally:
        set_backend(None)


def test_pool_speculative_greedy_parity(setup):
    """Replica engines with speculation emit the same greedy streams as a
    plain standalone pipeline (per-replica hint/history state isolated)."""
    cfg, params, processor = setup
    img = _figures(1)[0]
    single = DetikzifyPipeline(params, cfg, processor, metric="fast",
                               temperature=0.0, num_slots=2, max_len=96)
    want = single.sample(image=img).code
    pool = ReplicaPool(params, cfg, processor, devices=jax.devices()[:2],
                       metric="fast", temperature=0.0, num_slots=2,
                       max_len=96, speculate=3)
    docs = pool.map_sample([img, img])
    assert [d.code for d in docs] == [want, want]
