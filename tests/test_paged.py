"""Paged-KV model paths == contiguous paths (logit-level, fp32 CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detikzify_tpu.config import TextConfig
from detikzify_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = TextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=512,
                     rope_theta=10000.0)
    params = llama.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


PAGE = 8
M_CAP = 8          # 64-row slots
TRASH_ROW = 61     # rows [61, 64) = trash block
B = 2


def _embed(params, ids):
    return llama.embed(params, jnp.asarray(ids, jnp.int32))


def test_prefill_decode_paged_matches_contiguous(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    max_len = M_CAP * PAGE

    ids = rng.integers(0, 64, (B, 13))
    cache = llama.init_cache(cfg, B, max_len, jnp.float32)
    start = jnp.zeros((B,), jnp.int32)
    seq = jnp.asarray([13, 9], jnp.int32)
    h_ref, cache = llama.prefill(params, cfg, _embed(params, ids), start,
                                 seq, cache, attn_impl="xla")

    # paged: slots own disjoint shuffled pages; trash page is pool page 17
    pool = llama.init_paged_cache(cfg, 18, PAGE, jnp.float32)
    perm = rng.permutation(16)
    tabs = jnp.asarray(perm.reshape(B, M_CAP), jnp.int32)
    h_pg, pool = llama.prefill_paged(
        params, cfg, _embed(params, ids), start, seq, pool,
        jnp.zeros((B, 0), jnp.int32), tabs, jnp.zeros((B,), jnp.int32),
        trash_row=TRASH_ROW, trash_page=17, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(h_pg), np.asarray(h_ref),
                               atol=1e-5, rtol=1e-4)

    # decode steps from per-slot positions
    positions = jnp.asarray([13, 9], jnp.int32)
    for t in range(6):
        tok = rng.integers(0, 64, (B,))
        e = _embed(params, tok)
        h1, cache = llama.decode_step(params, cfg, e, positions, cache)
        h2, pool = llama.decode_step_paged(
            params, cfg, e, positions, pool, tabs, trash_row=TRASH_ROW,
            trash_page=17, attn_impl="xla")
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                                   atol=1e-5, rtol=1e-4)
        positions = positions + 1


def test_prefix_restore_tail_prefill_matches_full(setup):
    """Sharing an ancestor's pages + COW boundary + tail prefill must equal
    prefilling the whole sequence contiguously."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    full = rng.integers(0, 64, (1, 21))
    prefix_len = 13                       # 1 full page (8) + 5-row boundary

    # reference: contiguous full prefill then one decode
    max_len = M_CAP * PAGE
    cache = llama.init_cache(cfg, 1, max_len, jnp.float32)
    h_ref, cache = llama.prefill(
        params, cfg, _embed(params, full), jnp.zeros((1,), jnp.int32),
        jnp.asarray([21], jnp.int32), cache, attn_impl="xla")

    # paged: "ancestor slot" prefills the prefix into pages 0..7
    pool = llama.init_paged_cache(cfg, 24, PAGE, jnp.float32)
    anc_tab = jnp.arange(M_CAP, dtype=jnp.int32)[None]
    _, pool = llama.prefill_paged(
        params, cfg, _embed(params, full[:, :prefix_len]),
        jnp.zeros((1,), jnp.int32), jnp.asarray([prefix_len], jnp.int32),
        pool, jnp.zeros((1, 0), jnp.int32), anc_tab,
        jnp.zeros((1,), jnp.int32), trash_row=TRASH_ROW, trash_page=23,
        attn_impl="xla")

    # child slot: entry 0 SHARES ancestor page 0; boundary page (rows 8-15,
    # partially covered by the prefix) is COW'd into private page 8;
    # remaining entries private (pages 8..14)
    child_tab = jnp.asarray([[0] + list(range(8, 15))], jnp.int32)
    read_tab = anc_tab[:, :2]             # prefix pages cover rows [0, 16)
    start = jnp.asarray([prefix_len], jnp.int32)
    cow = jnp.asarray([8], jnp.int32)     # boundary page base
    h_child, pool = llama.prefill_paged(
        params, cfg, _embed(params, full[:, prefix_len:]), start,
        jnp.asarray([21 - prefix_len], jnp.int32), pool, read_tab,
        child_tab, cow, trash_row=TRASH_ROW, trash_page=23,
        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(h_child),
                               np.asarray(h_ref[:, prefix_len:]),
                               atol=1e-5, rtol=1e-4)

    # decode continues identically on both
    positions = jnp.asarray([21], jnp.int32)
    for _ in range(5):
        tok = rng.integers(0, 64, (1,))
        e = _embed(params, tok)
        h1, cache = llama.decode_step(params, cfg, e, positions, cache)
        h2, pool = llama.decode_step_paged(
            params, cfg, e, positions, pool, child_tab,
            trash_row=TRASH_ROW, trash_page=23, attn_impl="xla")
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                                   atol=1e-5, rtol=1e-4)
        positions = positions + 1

    # the ancestor's shared page 0 was never written by the child: its
    # content still equals the original prefix K rows
    # (the COW boundary page 8 diverged instead)
    assert not np.allclose(np.asarray(pool.k[:, 8]), np.asarray(pool.k[:, 1]))


def test_trash_rows_never_dereference_table(setup):
    """Writes at rows >= trash_row go to the shared trash page, so a stale
    table full of another slot's pages is never written through."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    pool = llama.init_paged_cache(cfg, 10, PAGE, jnp.float32)
    victim_pages = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7]], jnp.int32)
    before = np.asarray(pool.k[:, :8]).copy()

    e = _embed(params, rng.integers(0, 64, (1,)))
    _, pool = llama.decode_step_paged(
        params, cfg, e, jnp.asarray([TRASH_ROW], jnp.int32), pool,
        victim_pages, trash_row=TRASH_ROW, trash_page=9, attn_impl="xla")
    np.testing.assert_array_equal(np.asarray(pool.k[:, :8]), before)
    assert np.abs(np.asarray(pool.k[:, 9])).sum() > 0   # went to trash


def _check_accounting(eng):
    """Host page accounting invariant: every non-trash page's refcount ==
    live slot-table references + stored-prefix references; the free list
    is duplicate-free and exactly the zero-refcount pages."""
    n_pages = eng._page_refs.shape[0]
    trash = eng._trash_page
    expected = np.zeros(n_pages, np.int64)
    for slot in range(eng.num_slots):
        if eng._table_live[slot]:
            np.add.at(expected, eng._tables[slot], 1)
    for sp in eng._prefix_store.values():
        np.add.at(expected, list(sp.pages), 1)
    for pid in range(n_pages):
        if pid == trash:
            continue
        assert eng._page_refs[pid] == expected[pid], (
            pid, int(eng._page_refs[pid]), int(expected[pid]))
    free = eng._free_pages
    assert len(free) == len(set(free))
    assert trash not in free
    zero = {pid for pid in range(n_pages)
            if pid != trash and eng._page_refs[pid] == 0}
    assert set(free) == zero, sorted(set(free) ^ zero)


def _tiny_engine(num_slots=3, max_len=128, page_size=16,
                 prefix_budget_bytes=1, **kw):
    from detikzify_tpu.config import tiny_test_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.models import detikzify
    from detikzify_tpu.ops.sampling import SamplingParams

    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, num_slots=num_slots, max_len=max_len,
                       page_size=page_size,
                       prefix_budget_bytes=prefix_budget_bytes,
                       sampling=SamplingParams(temperature=0.0), **kw)
    return cfg, params, eng


def _drain(eng, ro):
    while not ro.finished:
        eng.step()
    return list(ro.token_ids)


def test_restore_survives_same_wave_eviction():
    """A restored start whose own page allocation LRU-evicts the prefix it
    is restoring from must still produce correct tokens: the non-aligned
    BOUNDARY page is only read by the COW gather (it never joins the slot
    table), and before the wave pinned it, eviction could recycle it as
    the same wave's private page -- the fused program would then prefill
    over the very page it gathers (review finding)."""
    cfg, params, eng = _tiny_engine()    # pool: 3*8 + 2 pages (+trash)
    rng = np.random.default_rng(3)
    prompt = [cfg.bos_token_id] + [int(t) for t in rng.integers(1, 200, 23)]

    ro0 = eng.start(prompt, max_new_tokens=1)
    _drain(eng, ro0)
    sp = eng.store_prefix("k", ro0, length=20)   # 20 % 16 != 0: boundary
    assert sp is not None and len(sp.pages) == 2
    eng.release(ro0)

    # occupy the other two slots so the restore's allocation must evict
    fill1 = eng.start([cfg.bos_token_id] + [3] * 9, max_new_tokens=40,
                      lazy=True)
    fill2 = eng.start([cfg.bos_token_id] + [5] * 9, max_new_tokens=40,
                      lazy=True)
    # two more stored prefixes eat the remaining slack (each pins 1 copy)
    spf1 = eng.store_prefix("f1", fill1, length=4)
    spf2 = eng.store_prefix("f2", fill2, length=4)
    assert spf1 is not None and spf2 is not None
    need = eng._m_cap - 20 // eng.page            # private pages for restore
    assert len(eng._free_pages) < need, "scenario must force eviction"

    ids = list(sp.token_ids) + [int(t) for t in rng.integers(1, 200, 4)]
    boundary = int(sp.pages[1])
    ro = eng.start(ids, prefix=sp, max_new_tokens=6)
    assert sp.dropped, "restore's own allocation must have evicted it"
    # the still-referenced boundary page must NOT have been recycled into
    # this very wave's private pages (the fused program would write it)
    assert boundary not in list(eng._tables[ro.slot]), \
        "boundary page recycled into the wave that reads it"
    got = _drain(eng, ro)
    _check_accounting(eng)

    _, _, ref = _tiny_engine()
    want = _drain(ref, ref.start(ids, max_new_tokens=6))
    assert got == want, "restored rollout diverged after boundary recycle"


def test_burst_cross_chunk_eviction_keeps_prefix_pages():
    """start_many chunks a burst into power-of-two groups; chunk 1's page
    allocation may LRU-evict the prefix chunk 2 restores from. The burst
    must pin every restored prefix's pages upfront, or the later chunk
    increfs pages already handed back to the pool (review finding)."""
    cfg, params, eng = _tiny_engine()
    rng = np.random.default_rng(4)

    def mk(n, seed):
        r = np.random.default_rng(seed)
        return [cfg.bos_token_id] + [int(t) for t in r.integers(1, 200, n)]

    # store C first (LRU-oldest), spanning 6 full pages + boundary
    roc = eng.start(mk(101, 0), max_new_tokens=1)
    _drain(eng, roc)
    spc = eng.store_prefix("C", roc, length=100)
    assert spc is not None and len(spc.pages) == 7
    eng.release(roc)
    # A and B pin further pages so chunk 1 must evict
    roa = eng.start(mk(37, 1), max_new_tokens=1)
    _drain(eng, roa)
    spa = eng.store_prefix("A", roa, length=36)
    eng.release(roa)
    rob = eng.start(mk(69, 2), max_new_tokens=1)
    _drain(eng, rob)
    spb = eng.store_prefix("B", rob, length=68)
    eng.release(rob)
    assert len(eng._free_pages) < 2 * eng._m_cap, \
        "chunk 1 must be forced to evict"

    tail = [int(t) for t in rng.integers(1, 200, 3)]
    prompts = [mk(10, 5), mk(10, 6), list(spc.token_ids) + tail]
    ros = eng.start_many(prompts, prefixes=[None, None, spc],
                         max_new_tokens=4)
    for ro in ros:
        _drain(eng, ro)
    _check_accounting(eng)

    _, _, ref = _tiny_engine()
    want = _drain(ref, ref.start(prompts[2], max_new_tokens=4))
    assert list(ros[2].token_ids) == want


def test_pool_exhaustion_rolls_back_cleanly():
    """A failed allocation mid-wave must return every slot and page: no
    leaked tables, no lost slots, and the engine keeps serving (review
    finding: the old path leaked all wave slots + earlier rows' pages)."""
    cfg, params, eng = _tiny_engine()
    real_alloc = eng._alloc_pages
    fails = {"n": 1}

    def flaky(n):
        if fails["n"] > 0:
            fails["n"] -= 1
            return None
        return real_alloc(n)

    eng._alloc_pages = flaky
    free_slots = len(eng._free_slots)
    free_pages = len(eng._free_pages)
    prompt = [cfg.bos_token_id] + [7] * 9
    with pytest.raises(RuntimeError, match="exhausted"):
        eng.start(prompt, max_new_tokens=2)
    assert len(eng._free_slots) == free_slots
    assert len(eng._free_pages) == free_pages
    _check_accounting(eng)

    # burst: chunk 1 (2 rows) succeeds, chunk 2 fails -> chunk 1 lives on,
    # the failing chunk's slot is returned
    fails["n"] = 0
    calls = {"n": 0}

    def flaky2(n):
        calls["n"] += 1
        if calls["n"] == 3:                     # third row's private pages
            return None
        return real_alloc(n)

    eng._alloc_pages = flaky2
    with pytest.raises(RuntimeError, match="exhausted"):
        eng.start_many([prompt, prompt, prompt], max_new_tokens=2)
    assert len(eng._free_slots) == 1, "failed chunk's slot must return"
    launched = [ro for ro in eng._rollouts.values()]
    assert len(launched) == 2, "chunk 1 must have launched"
    eng._alloc_pages = real_alloc
    for ro in launched:
        _drain(eng, ro)
        eng.release(ro)
    _check_accounting(eng)
    # the engine still serves after both failures
    ro = eng.start(prompt, max_new_tokens=2)
    _drain(eng, ro)


def test_page_pool_refcount_fuzz():
    """Seeded fuzz over the engine's page-pool lifecycle: random
    interleavings of fresh starts, prefix-restored starts, stores at
    random depths, releases, drops, and aborts must keep the host page
    accounting exactly consistent -- every non-trash page's refcount
    equals the number of live slot-table entries plus stored-prefix
    references to it, the free list is duplicate-free and exactly the
    zero-refcount pages, and tearing everything down returns the pool to
    fully free. Guards the COW/pin logic that all prefix-reuse
    performance rests on."""
    from detikzify_tpu.config import tiny_test_config
    from detikzify_tpu.engine import DecodeEngine
    from detikzify_tpu.models import detikzify
    from detikzify_tpu.ops.sampling import SamplingParams

    cfg = tiny_test_config(vocab_size=512)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)

    def check(eng):
        n_pages = eng._page_refs.shape[0]
        trash = eng._trash_page
        expected = np.zeros(n_pages, np.int64)
        for slot in range(eng.num_slots):
            if eng._table_live[slot]:
                np.add.at(expected, eng._tables[slot], 1)
        for sp in eng._prefix_store.values():
            np.add.at(expected, list(sp.pages), 1)
        for pid in range(n_pages):
            if pid == trash:
                continue
            assert eng._page_refs[pid] == expected[pid], (
                pid, int(eng._page_refs[pid]), int(expected[pid]))
        free = eng._free_pages
        assert len(free) == len(set(free))
        assert trash not in free
        zero = {pid for pid in range(n_pages)
                if pid != trash and eng._page_refs[pid] == 0}
        assert set(free) == zero, sorted(set(free) ^ zero)

    for seed in (0, 7):
        rng = np.random.default_rng(seed)
        eng = DecodeEngine(params, cfg, num_slots=3, max_len=96,
                           page_size=16, prefix_budget_bytes=1 << 30,
                           sampling=SamplingParams(temperature=0.0))
        live = []              # rollouts not yet released
        keys = []
        for i in range(40):
            ops = ["start"]
            if keys:
                ops += ["restore", "drop"]
            finished = [r for r in live if r.finished]
            if finished:
                ops += ["store", "release", "release"]
            unfinished = [r for r in live if not r.finished]
            if unfinished:
                ops += ["abort", "run"]
            if eng.num_free_slots >= 2:
                ops += ["burst"]
            op = ops[rng.integers(len(ops))]
            if op == "start" and eng.num_free_slots:
                n = int(rng.integers(2, 60))
                prompt = [cfg.bos_token_id] + [int(t) for t in
                                               rng.integers(1, 200, n)]
                live.append(eng.start(prompt,
                                      max_new_tokens=int(rng.integers(1, 8)),
                                      lazy=bool(rng.integers(2))))
            elif op == "burst":
                b = int(rng.integers(2, eng.num_free_slots + 1))
                prompts, pfx = [], []
                for _ in range(b):
                    sp = (eng.get_prefix(keys[rng.integers(len(keys))])
                          if keys and rng.integers(2) else None)
                    base = list(sp.token_ids) if sp is not None else \
                        [cfg.bos_token_id]
                    n = int(rng.integers(1, 20))
                    prompts.append(base + [int(t) for t in
                                           rng.integers(1, 200, n)])
                    pfx.append(sp)
                live.extend(eng.start_many(
                    prompts, prefixes=pfx,
                    max_new_tokens=int(rng.integers(1, 6))))
            elif op == "restore":
                key = keys[rng.integers(len(keys))]
                sp = eng.get_prefix(key)
                if sp is not None and eng.num_free_slots:
                    ids = list(sp.token_ids) + [int(t) for t in
                                                rng.integers(1, 200, 2)]
                    live.append(eng.start(ids, max_new_tokens=2, prefix=sp))
            elif op == "store" and finished:
                ro = finished[rng.integers(len(finished))]
                length = int(rng.integers(1, ro.length + 1))
                key = f"k{seed}-{i}"
                if eng.store_prefix(key, ro, length=length) is not None:
                    keys.append(key)
            elif op == "release" and finished:
                ro = finished[rng.integers(len(finished))]
                eng.release(ro)
                live.remove(ro)
            elif op == "drop" and keys:
                key = keys.pop(rng.integers(len(keys)))
                eng.drop_prefix(key)
            elif op == "abort" and unfinished:
                eng.abort(unfinished[rng.integers(len(unfinished))])
                eng.run()
            elif op == "run":
                eng.run()
            check(eng)
        # teardown: everything released + dropped -> pool fully free
        eng.run()
        for ro in live:
            eng.release(ro)
        for key in list(keys):
            eng.drop_prefix(key)
        check(eng)
        n_pages = eng._page_refs.shape[0]
        assert len(eng._free_pages) == n_pages - 1
        assert all(int(r) == 0 for pid, r in enumerate(eng._page_refs)
                   if pid != eng._trash_page)
