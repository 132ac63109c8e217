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
