"""Parity tests for the cross-step fused word scan (ops/dsa_scan.py).

Oracle chain: dsa_teacher_scan_ref (jnp scan of the per-step composition)
is pinned against a step-by-step composition of the already-tested
dsa_sample_attend_ref + LSTM cell; the Pallas kernel (interpret mode on
CPU) is pinned against the oracle for forward and all 13 gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops.dsa_scan import (dsa_teacher_scan, dsa_teacher_scan_ref,
                                  _scan_core)
from dvc_tpu.ops.dsa_step import dsa_sample_attend_ref, _lstm_cell_fwd


def make_args(B=2, S=18, H=2, Dh=8, Q=3, L=2, P=2, A=16, R=8, K=4, seed=0):
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
    z_all = f(B, K, Q, 4 * R) * 0.3
    off_w_h = f(H, R, LP) * 0.2
    h2att_w = f(R, A) * 0.3
    h2att_b = f(A) * 0.1
    cw = f(Dh, A) * 0.3
    cb = f(A) * 0.1
    aw = f(A) * 0.3
    ab = jnp.float32(0.05)
    ctx_w3 = f(H, Dh, 4 * R) * 0.2
    w_hh = f(R, 4 * R) * 0.2
    return (value_t, base_pos, scale_t, z_all, off_w_h, h2att_w, h2att_b,
            cw, cb, aw, ab, ctx_w3, w_hh), ts


def stepwise_oracle(args, ts):
    """Compose the scan from the per-step oracle (dsa_sample_attend_ref)
    — an independent derivation of the same math."""
    (value_t, base_pos, scale_t, z_all, off_w_h, h2att_w, h2att_b,
     cw, cb, aw, ab, ctx_w3, w_hh) = args
    B, H, S, Dh = value_t.shape
    K, Q = z_all.shape[1], z_all.shape[2]
    R = w_hh.shape[0]
    L = len(ts)
    LP = scale_t.shape[-1]
    P = LP // L
    t_vec = jnp.asarray(ts, jnp.float32)
    # express (base_pos, scale_t) back as (ref_center=base/T, offsets=h@W,
    # offset_scale=scale_t/T) for the per-step op's interface
    value = value_t.transpose(0, 2, 1, 3)                 # (B, S, H, Dh)
    ref_c = ((base_pos + 0.5)
             / t_vec[None, None, None, :].repeat(P, -1))  # (B,H,Q,LP)
    scale = scale_t / t_vec[None, None, :].repeat(P, -1)  # (B, Q, LP)
    h = jnp.zeros((B, Q, R))
    c = jnp.zeros((B, Q, R))
    hs = []
    for k in range(K):
        off = jnp.einsum('bqr,hrp->bhqp', h, off_w_h)     # (B,H,Q,LP)
        # per-step op wants offsets (B, Q, H, L, P), ref/scale (B, Q, L);
        # fold the head-dependent base in as offsets with scale 1
        loc = (ref_c + off * scale[:, None]).transpose(0, 2, 1, 3)
        loc = loc.reshape(B, Q, H, L, P)
        hvec = h @ h2att_w + h2att_b
        ctx = dsa_sample_attend_ref(
            value, loc, jnp.zeros((B, Q, L)), jnp.ones((B, Q, L)),
            hvec, cw, cb, aw, ab, ts)                     # (B, Q, H, Dh)
        z = (z_all[:, k] + h @ w_hh
             + jnp.einsum('bqhd,hdr->bqr', ctx, ctx_w3))
        h, c = _lstm_cell_fwd(z, c)
        hs.append(h)
    return jnp.stack(hs, axis=1)                          # (B, K, Q, R)


def test_ref_matches_stepwise_composition():
    args, ts = make_args()
    hs_ref, cs_ref = dsa_teacher_scan_ref(*args, ts)
    hs_cmp = stepwise_oracle(args, ts)
    np.testing.assert_allclose(np.asarray(hs_ref), np.asarray(hs_cmp),
                               rtol=2e-5, atol=2e-5)
    assert hs_ref.shape == cs_ref.shape


@pytest.mark.parametrize('shapes', [
    dict(),                                   # base
    dict(Q=5),                                # Q not multiple of 8 (pad)
    dict(B=1, K=1),                           # degenerate scan
    dict(L=3, P=2, S=21),                     # odd level table
])
def test_pallas_forward_parity(shapes):
    ts = {2: (12, 6), 3: (12, 6, 3)}[shapes.get('L', 2)]
    args, _ = make_args(**shapes)
    hs_ref, _ = dsa_teacher_scan_ref(*args, ts)
    hs_pal = dsa_teacher_scan(*args, ts, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(hs_pal), np.asarray(hs_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_gradient_parity():
    args, ts = make_args(K=3)

    def loss_ref(*a):
        hs, _ = dsa_teacher_scan_ref(*a, ts)
        return jnp.sum(jnp.sin(hs * 3.0))

    def loss_pal(*a):
        hs = _scan_core(*a, ts, True, 'float32')
        return jnp.sum(jnp.sin(hs * 3.0))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(13)))(*args)
    g_pal = jax.grad(loss_pal, argnums=tuple(range(13)))(*args)
    names = ['value', 'base_pos', 'scale_t', 'z_all', 'off_w_h', 'h2att_w',
             'h2att_b', 'cw', 'cb', 'aw', 'ab', 'ctx_w3', 'w_hh']
    for name, r, p in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=5e-4, atol=5e-5,
            err_msg=f'gradient mismatch: {name}')


def test_pallas_gradient_parity_padded_q():
    args, ts = make_args(Q=5, K=2)

    def loss_ref(*a):
        hs, _ = dsa_teacher_scan_ref(*a, ts)
        return jnp.sum(hs * hs)

    def loss_pal(*a):
        hs = _scan_core(*a, ts, True, 'float32')
        return jnp.sum(hs * hs)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 12))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 3, 12))(*args)
    for r, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.heavy
def test_head_scan_fuse_equivalence():
    """DSACaptionHead with scan_fuse on (ref impl) must produce the same
    teacher-forcing logprobs and parameter gradients as the stepwise
    path."""
    from dvc_tpu.models.caption_heads import CaptionHeadConfig, DSACaptionHead
    cfg = CaptionHeadConfig(
        vocab_size=23, input_encoding_size=12, rnn_size=16, num_layers=1,
        drop_prob=0.0, max_caption_len=6, hidden_dim=16, att_hid_size=16,
        cap_nheads=2, cap_dec_n_points=2, cap_num_feature_levels=2)
    rng = np.random.default_rng(3)
    B, Pq, d, S = 2, 3, 16, 18
    ts = (12, 6)
    query = jnp.asarray(rng.standard_normal((B, Pq, d)).astype(np.float32))
    ref_c = jnp.asarray(rng.uniform(0.1, 0.9, (B, Pq, 2)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.05, 0.2, (B, Pq, 2)).astype(np.float32))
    memory = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    pad_mask = jnp.zeros((B, S), bool)
    seq = jnp.asarray(rng.integers(1, 23, (B, Pq, 6)).astype(np.int32))
    seq = seq.at[:, :, -1].set(0)

    heads = {fuse: DSACaptionHead(cfg, att_impl='ref', scan_fuse=fuse)
             for fuse in (False, True)}
    params = heads[False].init(
        jax.random.PRNGKey(0), query, ref_c, scale, memory, ts, pad_mask,
        seq=seq, deterministic=True, mode='forward', ss_enabled=False)

    def run(fuse, params):
        lps = heads[fuse].apply(params, query, ref_c, scale, memory, ts,
                                pad_mask, seq=seq, deterministic=True,
                                mode='forward', ss_enabled=False)
        return lps

    lp0 = run(False, params)
    lp1 = run(True, params)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0),
                               rtol=2e-5, atol=2e-5)

    def loss(fuse):
        return lambda p: jnp.sum(run(fuse, p) ** 2)

    g0 = jax.grad(loss(False))(params)
    g1 = jax.grad(loss(True))(params)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    for k, v0 in flat0:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat1[key]), np.asarray(v0), rtol=1e-3, atol=1e-4,
            err_msg=f'param grad mismatch: {key}')
