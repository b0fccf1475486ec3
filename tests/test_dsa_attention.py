"""Fused DSA additive-attention op: Pallas (interpret) vs jnp oracle, plus
finite-difference gradient checks (same methodology as
tests/test_ms_deform_attn.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops.dsa_attention import (dsa_additive_attention,
                                       dsa_additive_attention_ref)


def make_inputs(seed=0, N=11, H=3, P=5, Dh=7, A=13):
    rng = np.random.default_rng(seed)
    taps = rng.standard_normal((N, H, P, Dh)).astype(np.float32)
    hvec = rng.standard_normal((N, A)).astype(np.float32)
    cw = rng.standard_normal((Dh, A)).astype(np.float32) * 0.3
    cb = rng.standard_normal((A,)).astype(np.float32) * 0.1
    aw = rng.standard_normal((A,)).astype(np.float32) * 0.3
    ab = np.float32(0.05)
    return tuple(jnp.asarray(x) for x in (taps, hvec, cw, cb, aw, ab))


@pytest.mark.parametrize("shape", [
    dict(N=11, H=3, P=5, Dh=7, A=13),       # odd everything
    dict(N=16, H=8, P=16, Dh=64, A=128),    # flagship-like
    dict(N=3, H=1, P=1, Dh=4, A=4),         # degenerate
])
def test_pallas_matches_ref_forward(shape):
    args = make_inputs(**shape)
    want = dsa_additive_attention_ref(*args)
    got = dsa_additive_attention(*args, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_matches_ref_gradients():
    args = make_inputs(N=9, H=2, P=6, Dh=8, A=16)

    def loss(impl):
        def f(*a):
            out = dsa_additive_attention(*a, impl=impl)
            # non-uniform weighting so every grad component matters
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out * jnp.sin(w))
        return f

    g_ref = jax.grad(loss('ref'), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_pal = jax.grad(loss('pallas_interpret'), argnums=(0, 1, 2, 3, 4, 5))(
        *args)
    names = ['taps', 'hvec', 'ctx_w', 'ctx_b', 'alpha_w', 'alpha_b']
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_finite_difference_taps():
    args = list(make_inputs(N=4, H=2, P=3, Dh=4, A=8))

    def f(taps):
        return jnp.sum(dsa_additive_attention(
            taps, *args[1:], impl='pallas_interpret') ** 2)

    g = jax.grad(f)(args[0])
    rng = np.random.default_rng(1)
    for _ in range(5):
        idx = tuple(rng.integers(0, s) for s in args[0].shape)
        eps = 1e-3
        tp = args[0].at[idx].add(eps)
        tm = args[0].at[idx].add(-eps)
        fd = (f(tp) - f(tm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                   rtol=2e-2, atol=2e-3)


def test_head_uses_fused_op_consistently():
    """DSA head: ref-attention vs interpret-kernel attention produce the
    same teacher-forcing logprobs."""
    from dvc_tpu.models.caption_heads import CaptionHeadConfig, DSACaptionHead
    cfg = CaptionHeadConfig(vocab_size=17, input_encoding_size=8,
                            rnn_size=12, num_layers=1, drop_prob=0.0,
                            max_caption_len=6, hidden_dim=8, att_hid_size=10,
                            cap_nheads=2, cap_dec_n_points=2,
                            cap_num_feature_levels=2)
    rng = np.random.default_rng(0)
    B, P, T = 2, 3, 12
    shapes = (8, 4)
    query = jnp.asarray(rng.standard_normal((B, P, 8)).astype(np.float32))
    center = jnp.asarray(rng.uniform(0.2, 0.8, (B, P, 2)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.05, 0.2, (B, P, 2)).astype(np.float32))
    memory = jnp.asarray(rng.standard_normal((B, T, 8)).astype(np.float32))
    pad = jnp.zeros((B, T), bool)
    seq = jnp.asarray(rng.integers(1, 17, (B * P, 6)).astype(np.int32))

    outs = {}
    for impl in ('ref', 'pallas_interpret'):
        head = DSACaptionHead(cfg, att_impl=impl)
        params = head.init({'params': jax.random.PRNGKey(0)}, query, center,
                           scale, memory, shapes, pad, seq=seq,
                           deterministic=True, mode='forward')
        outs[impl] = np.asarray(head.apply(
            params, query, center, scale, memory, shapes, pad, seq=seq,
            deterministic=True, mode='forward'))
    np.testing.assert_allclose(outs['pallas_interpret'], outs['ref'],
                               rtol=2e-5, atol=2e-5)
