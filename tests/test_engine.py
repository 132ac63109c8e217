"""Decode engine tests: correctness of continuous batching + prefix reuse.

The invariant under test: whatever path tokens take through the engine
(one-shot, staggered joins, prefix restore), greedy decoding must produce
the same continuation as a plain full forward pass.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.engine import DecodeEngine
from detikzify_tpu.models import detikzify, llama
from detikzify_tpu.ops.sampling import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(vocab_size=128)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def greedy_reference(params, cfg, prompt, n_steps, banned, eos):
    """Reference greedy continuation via repeated full forwards (no cache)."""
    ids = list(prompt)
    out = []
    for step in range(n_steps):
        logits, _ = detikzify.forward(params, cfg,
                                      jnp.asarray([ids]), None,
                                      attn_impl="xla")
        row = np.array(logits[0, -1])
        row[list(banned)] = -np.inf
        if step == 0:
            row[eos] = -np.inf
        tok = int(row.argmax())
        ids.append(tok)
        out.append(tok)
    return out


def test_engine_matches_full_forward_greedy(setup):
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id, 5, 6, 7, 8]
    ro = eng.start(prompt, max_new_tokens=10)
    eng.run()
    got = ro.token_ids[len(prompt):]
    want = greedy_reference(params, cfg, prompt, len(got),
                            banned=(cfg.image_token_id,),
                            eos=eng.eos_token_id)
    assert got == want


def test_engine_staggered_batch(setup):
    """Slots joining at different times must not perturb each other."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                       sampling=SamplingParams(temperature=0.0))
    p1 = [cfg.bos_token_id, 11, 12]
    p2 = [cfg.bos_token_id, 21, 22, 23, 24, 25]
    r1 = eng.start(p1, max_new_tokens=8)
    for _ in range(3):
        eng.step()
    r2 = eng.start(p2, max_new_tokens=8)
    eng.run()
    w1 = greedy_reference(params, cfg, p1, len(r1.token_ids) - len(p1),
                          (cfg.image_token_id,), eng.eos_token_id)
    w2 = greedy_reference(params, cfg, p2, len(r2.token_ids) - len(p2),
                          (cfg.image_token_id,), eng.eos_token_id)
    assert r1.token_ids[len(p1):] == w1
    assert r2.token_ids[len(p2):] == w2


def test_prefix_reuse_exact(setup):
    """Restoring a stored prefix must reproduce the no-reuse continuation."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.bos_token_id, 31, 32, 33]

    r1 = eng.start(prompt, max_new_tokens=6)
    eng.run()
    full_seq = list(r1.token_ids)
    eng.store_prefix("node-a", r1, length=len(prompt) + 3)
    eng.release(r1)

    # continue from the stored node with prefix restore
    node_ids = full_seq[:len(prompt) + 3]
    key_sp = eng.best_prefix(node_ids)
    assert key_sp is not None
    _, sp = key_sp
    assert sp.length == len(node_ids)
    r2 = eng.start(node_ids, max_new_tokens=3, prefix=sp)
    eng.run()
    # same greedy continuation as the uncached path
    assert r2.token_ids[:len(full_seq)] == full_seq[:len(r2.token_ids)]

    # and identical to a fresh rollout without reuse
    r3 = eng.start(node_ids, max_new_tokens=3)
    eng.run()
    assert r2.token_ids == r3.token_ids


def test_engine_with_image_prompt(setup):
    """Image-token prompts route vision features; output differs by image."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96,
                       sampling=SamplingParams(temperature=0.0))
    rng = np.random.default_rng(0)
    pix1 = jnp.asarray(rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32)
    emb1 = eng.encode_image(pix1)
    emb2 = eng.encode_image(pix1 * 0.0)

    prompt = [cfg.image_token_id] * cfg.image_seq_len + [cfg.bos_token_id]
    r1 = eng.start(prompt, image_embeds=emb1, max_new_tokens=6)
    eng.run()
    eng.release(r1)
    r2 = eng.start(prompt, image_embeds=emb2, max_new_tokens=6)
    eng.run()
    assert r1.token_ids != r2.token_ids


def test_eos_suppressed_on_first_token(setup):
    """begin_suppress: first sampled token is never EOS even if argmax."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=1, max_len=64,
                       sampling=SamplingParams(temperature=0.0))
    ro = eng.start([cfg.bos_token_id], max_new_tokens=4)
    assert ro.token_ids[1] != eng.eos_token_id


def test_pipelined_mode_matches_sync(setup):
    """Opt-in pipelined stepping must produce identical greedy output."""
    cfg, params = setup
    prompt = [cfg.bos_token_id, 41, 42, 43]
    outs = []
    for pipelined in (False, True):
        eng = DecodeEngine(params, cfg, num_slots=2, max_len=96,
                           sampling=SamplingParams(temperature=0.0),
                           pipelined=pipelined, decode_block=4)
        ro = eng.start(prompt, max_new_tokens=10)
        eng.run()
        outs.append(list(ro.token_ids))
    assert outs[0] == outs[1]


def test_per_slot_sampling_override(setup):
    """Per-call sampling params are traced, not static: a greedy rollout
    and a sampled rollout share one continuous batch (and one compiled
    decode program), and the greedy slot still matches the full-forward
    argmax (reference gen_kwargs overrides, generate.py:399-426)."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96,
                       sampling=SamplingParams(temperature=0.9, top_p=0.9))
    p_greedy = [cfg.bos_token_id, 41, 42, 43]
    p_sampled = [cfg.bos_token_id, 51, 52]
    r_greedy = eng.start(p_greedy, max_new_tokens=8,
                         sampling=SamplingParams(temperature=0.0),
                         lazy=True)
    r_sampled = eng.start(p_sampled, max_new_tokens=8, lazy=True)
    eng.run()
    want = greedy_reference(params, cfg, p_greedy,
                            len(r_greedy.token_ids) - len(p_greedy),
                            (cfg.image_token_id,), eng.eos_token_id)
    assert r_greedy.token_ids[len(p_greedy):] == want
    assert len(r_sampled.token_ids) > len(p_sampled)

    # changing sampling params must NOT trigger a recompile of the block
    # decode program
    n_compiled = eng._decode_many._cache_size()
    r3 = eng.start([cfg.bos_token_id, 61], max_new_tokens=4,
                   sampling=SamplingParams(temperature=0.31, top_p=0.5,
                                           top_k=7))
    eng.run()
    assert eng._decode_many._cache_size() == n_compiled
    assert len(r3.token_ids) > 2


def test_start_many_matches_individual_starts(setup):
    """A fused burst start (one device program for B rollouts) must produce
    exactly the token streams of B individual starts -- greedy, mixed
    prompt lengths, with and without a shared stored prefix."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    prompts = [[cfg.bos_token_id, 71, 72],
               [cfg.bos_token_id, 71, 73, 74],
               [cfg.bos_token_id, 75]]

    ros = eng.start_many(prompts, max_new_tokens=8)
    eng.run()
    burst = [list(r.token_ids) for r in ros]
    for r in ros:
        eng.release(r)

    single = []
    for p in prompts:
        r = eng.start(p, max_new_tokens=8)
        eng.run()
        single.append(list(r.token_ids))
        eng.release(r)
    assert burst == single

    # shared-prefix burst (GRPO shape: same prompt, one stored root)
    root = [cfg.bos_token_id] + list(range(1, 33))
    r0 = eng.start(root, max_new_tokens=4)
    eng.run()
    sp = eng.store_prefix("root", r0, length=32)
    eng.release(r0)
    extended = [root + [81], root + [82, 83]]
    ros = eng.start_many(extended, max_new_tokens=6, prefix=sp)
    eng.run()
    burst = [list(r.token_ids) for r in ros]
    for r in ros:
        eng.release(r)
    for p, got in zip(extended, burst):
        r = eng.start(p, max_new_tokens=6)
        eng.run()
        assert list(r.token_ids) == got
        eng.release(r)
    # burst counted as ONE start dispatch worth of prefix restores
    assert eng.counters["prefix_starts"] >= 2


def test_prefix_restart_with_image_tokens_in_tail(setup):
    """GRPO shape: the prompt is ALL image tokens and the stored prefix
    covers the whole prompt, so the re-prefilled one-token tail is an
    image token. It must receive its true position's image embedding
    (image_offsets), not image_embeds[:, 0] -- greedy continuations with
    and without the prefix must match exactly (CLAUDE.md invariant:
    prefix restore == no-reuse rollout)."""
    import jax
    import jax.numpy as jnp

    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    prompt = [cfg.image_token_id] * cfg.image_seq_len
    embeds = jax.random.normal(
        jax.random.PRNGKey(7),
        (1, cfg.image_seq_len, cfg.text.hidden_size), jnp.float32) * 0.1

    ro = eng.start(prompt, image_embeds=embeds, max_new_tokens=6)
    eng.run()
    want = list(ro.token_ids)
    sp = eng.store_prefix("img-root", ro, length=len(prompt))
    eng.release(ro)

    r2 = eng.start(prompt, image_embeds=embeds, max_new_tokens=6, prefix=sp)
    eng.run()
    assert list(r2.token_ids) == want
    eng.release(r2)

    # and through the burst path (GRPO's actual call shape)
    ros = eng.start_many([prompt, prompt], image_embeds=embeds,
                         max_new_tokens=6, prefix=sp)
    eng.run()
    for r in ros:
        assert list(r.token_ids) == want
        eng.release(r)


def test_prefix_restart_near_max_len_no_write_clamp(setup):
    """A restored start whose write offset is within one bucket of max_len
    must not let the padded prefill block clamp/shift (the engine
    re-prefills a little more of the matching prefix instead): greedy
    continuation equals the no-prefix rollout exactly."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=63, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    assert eng.max_len == 64
    prompt = [cfg.bos_token_id] + list(range(1, 58))        # 58 tokens
    ro = eng.start(prompt, max_new_tokens=4)
    eng.run()
    want = list(ro.token_ids)
    sp = eng.store_prefix("deep", ro, length=56)            # 4 pages
    eng.release(ro)
    # start 56 + bucket 16 > 64: without the host-side clamp the whole
    # block lands at 48 with the tail tokens at the wrong rows
    r2 = eng.start(prompt, max_new_tokens=4, prefix=sp)
    eng.run()
    assert list(r2.token_ids) == want
    eng.release(r2)


def test_best_prefix_refreshes_lru(setup):
    """Pool-pressure eviction must drop COLD prefixes, not the hottest one
    (the root image+prompt restored by every rollout)."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    root = [cfg.bos_token_id] + list(range(1, 33))
    ro = eng.start(root, max_new_tokens=2)
    eng.run()
    eng.store_prefix("hot", ro, length=32, namespace="ns")
    eng.release(ro)
    ro = eng.start(root + [40, 41, 42], max_new_tokens=2)
    eng.run()
    eng.store_prefix("cold", ro, length=35, namespace="ns")
    eng.release(ro)
    # a best_prefix hit on "hot" must move it behind "cold" in the LRU
    found = eng.best_prefix(root + [99], namespace="ns")
    assert found is not None and found[0] == "hot"
    assert eng._prefix_lru[0] == "cold"


def test_start_many_heterogeneous_prefixes(setup):
    """A burst mixing PER-PROMPT prefixes of different depths (and a row
    with no prefix at all) must reproduce individual starts exactly --
    the MCTS expansion-wave shape."""
    cfg, params = setup
    eng = DecodeEngine(params, cfg, num_slots=4, max_len=96, page_size=16,
                       sampling=SamplingParams(temperature=0.0))
    root = [cfg.bos_token_id] + list(range(1, 33))          # 33 tokens
    r0 = eng.start(root, max_new_tokens=4)
    eng.run()
    sp_root = eng.store_prefix("r", r0, length=32)          # 2 pages
    eng.release(r0)
    deep = root + [91, 92, 93] + list(range(100, 113))      # 49 tokens
    r1 = eng.start(deep, max_new_tokens=4, prefix=sp_root)
    eng.run()
    sp_deep = eng.store_prefix("d", r1, length=48)          # 3 pages (CoW)
    eng.release(r1)

    prompts = [root + [70],                 # shallow prefix (2 pages)
               deep + [71, 72],             # deep prefix (3 pages)
               [cfg.bos_token_id, 60, 61]]  # no prefix
    prefixes = [sp_root, sp_deep, None]
    before = eng.counters["prefill_tokens"]
    ros = eng.start_many(prompts, max_new_tokens=6, prefixes=prefixes)
    eng.run()
    burst = [list(r.token_ids) for r in ros]
    for r in ros:
        eng.release(r)
    # tail-only prefill: 2 + 3 + 3 tokens embedded (bucketed block padding
    # is masked), never the restored prefixes
    assert eng.counters["prefill_tokens"] - before == 2 + 3 + 3
    for p, pf, got in zip(prompts, prefixes, burst):
        r = eng.start(p, max_new_tokens=6, prefix=pf)
        eng.run()
        assert list(r.token_ids) == got
        eng.release(r)


def test_cpu_pinned_engine_forces_xla_attention(setup, monkeypatch):
    """An engine committed to a device on a NON-default backend (the
    verify_real host-side fp32 parity engine next to a chip) must pin
    attn_impl="xla": trace-time kernel dispatch keys off
    jax.default_backend(), which would select the TPU Pallas kernels for
    a CPU-lowered program and fail to compile (round-4 review finding).
    Simulated hermetically by faking the default backend."""
    cfg, params = setup
    from detikzify_tpu.engine import decode as decode_mod

    monkeypatch.setattr(decode_mod.jax, "default_backend", lambda: "tpu")
    cpu = jax.devices("cpu")[0]
    eng = DecodeEngine(params, cfg, num_slots=2, max_len=96,
                       device=cpu,
                       sampling=SamplingParams(temperature=0.0))
    assert eng.attn_impl == "xla"
    monkeypatch.undo()
    # the forced-xla engine still decodes correctly on its device
    prompt = [cfg.bos_token_id, 5, 6, 7, 8]
    ro = eng.start(prompt, max_new_tokens=8)
    eng.run()
    got = ro.token_ids[len(prompt):]
    want = greedy_reference(params, cfg, prompt, len(got),
                            banned=(cfg.image_token_id,),
                            eos=eng.eos_token_id)
    assert got == want
    # same-platform pinning keeps automatic kernel dispatch
    eng2 = DecodeEngine(params, cfg, num_slots=2, max_len=96, device=cpu,
                        sampling=SamplingParams(temperature=0.0))
    assert eng2.attn_impl == "auto"
