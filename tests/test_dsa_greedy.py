"""Parity tests for the cross-step fused greedy decode (ops/dsa_greedy.py).

Oracle chain: the head-level stepwise greedy path
(caption_heads._greedy_sample over the per-step DSA core — itself pinned
against torch in test_eval_torch_parity.py) is the independent derivation;
dsa_greedy_scan_ref must reproduce its tokens EXACTLY, and the Pallas
kernel (interpret mode on CPU) must reproduce the oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops.dsa_greedy import (dsa_greedy_scan, dsa_greedy_scan_ref,
                                    greedy_mask_outputs)


def make_args(B=2, S=18, H=2, Dh=8, Q=3, L=2, P=2, A=16, R=8, V=11, E=12,
              seed=0):
    ts = (12, 6)
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32))
    LP = L * P
    value_t = f(B, H, S, Dh)
    base_pos = jnp.asarray(
        rng.uniform(-0.5, max(ts) - 0.5, (B, H, Q, LP)).astype(np.float32))
    scale_t = jnp.asarray(
        rng.uniform(0.2, 2.0, (B, Q, LP)).astype(np.float32))
    const_z = f(B, Q, 4 * R) * 0.3
    embed = f(V + 1, E) * 0.3
    token_w = f(E, 4 * R) * 0.3
    logit_w = f(R, V + 1) * 0.5
    logit_b = f(V + 1) * 0.1
    off_w_h = f(H, R, LP) * 0.2
    h2att_w = f(R, A) * 0.3
    h2att_b = f(A) * 0.1
    cw = f(Dh, A) * 0.3
    cb = f(A) * 0.1
    aw = f(A) * 0.3
    ab = jnp.float32(0.05)
    ctx_w3 = f(H, Dh, 4 * R) * 0.2
    w_hh = f(R, 4 * R) * 0.2
    return (value_t, base_pos, scale_t, const_z, embed, token_w, logit_w,
            logit_b, off_w_h, h2att_w, h2att_b, cw, cb, aw, ab, ctx_w3,
            w_hh), ts


@pytest.mark.parametrize('shapes', [
    dict(),                                   # base
    dict(Q=5),                                # Q not multiple of 8 (pad)
    dict(V=130),                              # vocab pad to 256
    dict(B=1),                                # degenerate batch
    dict(L=3, P=2, S=21),                     # odd level table
])
def test_pallas_forward_parity(shapes):
    ts = {2: (12, 6), 3: (12, 6, 3)}[shapes.get('L', 2)]
    args, _ = make_args(**shapes)
    K = 5
    tok_ref, lp_ref = dsa_greedy_scan_ref(*args, ts, K)
    tok_pal, lp_pal = dsa_greedy_scan(*args, ts, K,
                                      impl='pallas_interpret')
    np.testing.assert_array_equal(np.asarray(tok_pal), np.asarray(tok_ref))
    np.testing.assert_allclose(np.asarray(lp_pal), np.asarray(lp_ref),
                               rtol=2e-5, atol=2e-5)


def test_mask_outputs_semantics():
    """greedy_mask_outputs == the stepwise loop's emit semantics
    (caption_heads._greedy_sample), re-derived literally here."""
    rng = np.random.default_rng(1)
    B, K, Q = 2, 6, 3
    tok = rng.integers(0, 4, (B, K, Q)).astype(np.int32)
    lp = rng.standard_normal((B, K, Q)).astype(np.float32)
    seq, lps = greedy_mask_outputs(jnp.asarray(tok), jnp.asarray(lp))
    seq = np.asarray(seq)
    lps = np.asarray(lps)
    for b in range(B):
        for q in range(Q):
            unfinished = True
            for t in range(1, K + 1):
                it = tok[b, t - 1, q]           # token chosen at step t-1
                unfinished = unfinished and (it > 0)
                assert seq[b, t - 1, q] == (it if unfinished else 0)
                assert lps[b, t - 1, q] == lp[b, t - 1, q]


def _head_setup(seed=3):
    from dvc_tpu.models.caption_heads import (CaptionHeadConfig,
                                              DSACaptionHead)
    cfg = CaptionHeadConfig(
        vocab_size=23, input_encoding_size=12, rnn_size=16, num_layers=1,
        drop_prob=0.0, max_caption_len=6, hidden_dim=16, att_hid_size=16,
        cap_nheads=2, cap_dec_n_points=2, cap_num_feature_levels=2)
    rng = np.random.default_rng(seed)
    B, Pq, d, S = 2, 3, 16, 18
    ts = (12, 6)
    query = jnp.asarray(rng.standard_normal((B, Pq, d)).astype(np.float32))
    ref_c = jnp.asarray(rng.uniform(0.1, 0.9, (B, Pq, 2)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.05, 0.2, (B, Pq, 2)).astype(np.float32))
    memory = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    pad_mask = jnp.zeros((B, S), bool)
    heads = {fuse: DSACaptionHead(cfg, att_impl='ref', greedy_fuse=fuse)
             for fuse in (False, True)}
    params = heads[False].init(
        jax.random.PRNGKey(0), query, ref_c, scale, memory, ts, pad_mask,
        deterministic=True, mode='sample')
    return heads, params, (query, ref_c, scale, memory, ts, pad_mask)


def test_head_greedy_fuse_equivalence():
    """DSACaptionHead with greedy_fuse on (ref impl) must produce the
    exact same sampled tokens and logprobs as the stepwise path."""
    heads, params, (query, ref_c, scale, memory, ts, pad_mask) = \
        _head_setup()

    def run(fuse):
        return heads[fuse].apply(params, query, ref_c, scale, memory, ts,
                                 pad_mask, deterministic=True,
                                 mode='sample')

    seq0, lps0 = run(False)
    seq1, lps1 = run(True)
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq0))
    np.testing.assert_allclose(np.asarray(lps1), np.asarray(lps0),
                               rtol=2e-5, atol=2e-5)


def test_head_greedy_fuse_kernel_interpret():
    """Same head-level equivalence through the interpret-mode kernel."""
    from dvc_tpu.models.caption_heads import DSACaptionHead
    heads, params, (query, ref_c, scale, memory, ts, pad_mask) = \
        _head_setup(seed=5)
    kern = DSACaptionHead(heads[True].cfg, att_impl='pallas_interpret',
                          greedy_fuse=True)
    seq0, lps0 = heads[False].apply(
        params, query, ref_c, scale, memory, ts, pad_mask,
        deterministic=True, mode='sample')
    seq1, lps1 = kern.apply(
        params, query, ref_c, scale, memory, ts, pad_mask,
        deterministic=True, mode='sample')
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq0))
    np.testing.assert_allclose(np.asarray(lps1), np.asarray(lps0),
                               rtol=2e-5, atol=2e-5)
