"""Fused caption-step op (sampling + additive attention): Pallas
(interpret) vs the jnp composition, forward and all gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops.dsa_step import (dsa_lstm_step, dsa_lstm_step_ref,
                                  dsa_sample_attend, dsa_sample_attend_ref)

SHAPES = dict(B=3, S=24 + 12 + 6, H=2, Dh=8, Q=5, L=3, P=4, A=16,
              temporal_shapes=(24, 12, 6))


def make_inputs(seed=0, **over):
    p = dict(SHAPES)
    p.update(over)
    rng = np.random.default_rng(seed)
    B, S, H, Dh, Q, L, P, A = (p[k] for k in
                               ('B', 'S', 'H', 'Dh', 'Q', 'L', 'P', 'A'))
    value = rng.standard_normal((B, S, H, Dh)).astype(np.float32)
    offsets = (rng.standard_normal((B, Q, H, L, P)) * 2).astype(np.float32)
    ref = rng.uniform(0.1, 0.9, (B, Q, L)).astype(np.float32)
    scale = rng.uniform(0.02, 0.3, (B, Q, L)).astype(np.float32)
    hvec = rng.standard_normal((B, Q, A)).astype(np.float32)
    cw = (rng.standard_normal((Dh, A)) * 0.3).astype(np.float32)
    cb = (rng.standard_normal(A) * 0.1).astype(np.float32)
    aw = (rng.standard_normal(A) * 0.3).astype(np.float32)
    ab = np.float32(0.07)
    args = tuple(jnp.asarray(x) for x in
                 (value, offsets, ref, scale, hvec, cw, cb, aw, ab))
    return args, tuple(p['temporal_shapes'])


def test_forward_parity():
    args, shapes = make_inputs()
    want = dsa_sample_attend_ref(*args, shapes)
    got = dsa_sample_attend(*args, shapes, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_flagshiplike():
    # flagship-ish: H=8, Dh=64, L=4, P=4, A=512, S=375
    args, shapes = make_inputs(B=2, S=200 + 100 + 50 + 25, H=8, Dh=64,
                               Q=6, L=4, P=4, A=512,
                               temporal_shapes=(200, 100, 50, 25))
    want = dsa_sample_attend_ref(*args, shapes)
    got = dsa_sample_attend(*args, shapes, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gradient_parity():
    args, shapes = make_inputs(seed=3)

    def loss(impl):
        def f(*a):
            out = dsa_sample_attend(*a, shapes, impl=impl)
            wts = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)
                          .reshape(out.shape))
            return jnp.sum(out * wts)
        return f

    argnums = tuple(range(9))
    g_ref = jax.grad(loss('ref'), argnums=argnums)(*args)
    g_pal = jax.grad(loss('pallas_interpret'), argnums=argnums)(*args)
    names = ['value', 'offsets', 'ref_center', 'offset_scale', 'hvec',
             'ctx_w', 'ctx_b', 'alpha_w', 'alpha_b']
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


def test_bf16_precision_close_and_grads_finite():
    """precision='bfloat16' (MXU bf16 multiplies, f32 accumulate) must
    track the f32 path within bf16 mantissa tolerance, fwd and bwd."""
    args, shapes = make_inputs(seed=7)
    want = dsa_sample_attend_ref(*args, shapes)
    got = dsa_sample_attend(*args, shapes, impl='pallas_interpret',
                            precision='bfloat16')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)

    def loss(*a):
        out = dsa_sample_attend(*a, shapes, impl='pallas_interpret',
                                precision='bfloat16')
        return jnp.sum(out ** 2)

    argnums = tuple(range(9))
    g_bf = jax.grad(loss, argnums=argnums)(*args)
    g_ref = jax.grad(lambda *a: jnp.sum(dsa_sample_attend_ref(
        *a, shapes) ** 2), argnums=argnums)(*args)
    for name, a, b in zip(['value', 'offsets', 'ref_center', 'offset_scale',
                           'hvec', 'ctx_w', 'ctx_b', 'alpha_w', 'alpha_b'],
                          g_ref, g_bf):
        b = np.asarray(b)
        assert np.all(np.isfinite(b)), name
        np.testing.assert_allclose(
            b, np.asarray(a), rtol=6e-2,
            atol=6e-2 * max(1e-3, float(np.abs(np.asarray(a)).max())),
            err_msg=name)


def make_lstm_inputs(seed=0, R=24, **over):
    args, shapes = make_inputs(seed, **over)
    value, offsets, ref, scale, hvec, cw, cb, aw, ab = args
    B, Q = offsets.shape[:2]
    d = value.shape[2] * value.shape[3]                   # H * Dh
    rng = np.random.default_rng(seed + 100)
    z0 = (rng.standard_normal((B, Q, 4 * R)) * 0.5).astype(np.float32)
    h = (rng.standard_normal((B, Q, R)) * 0.5).astype(np.float32)
    c = (rng.standard_normal((B, Q, R)) * 0.5).astype(np.float32)
    ctx_w = (rng.standard_normal((d, 4 * R)) * 0.2).astype(np.float32)
    w_hh = (rng.standard_normal((R, 4 * R)) * 0.2).astype(np.float32)
    full = (value, offsets, ref, scale, hvec,
            jnp.asarray(z0), jnp.asarray(h), jnp.asarray(c),
            jnp.asarray(ctx_w), jnp.asarray(w_hh), cw, cb, aw, ab)
    return full, shapes


def test_lstm_step_forward_parity():
    args, shapes = make_lstm_inputs()
    want_h, want_c = dsa_lstm_step_ref(*args, shapes)
    got_h, got_c = dsa_lstm_step(*args, shapes, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)


def test_lstm_step_gradient_parity():
    args, shapes = make_lstm_inputs(seed=11)

    def loss(impl):
        def f(*a):
            h_new, c_new = dsa_lstm_step(*a, shapes, impl=impl)
            wts_h = jnp.cos(jnp.arange(h_new.size, dtype=jnp.float32)
                            .reshape(h_new.shape))
            wts_c = jnp.sin(jnp.arange(c_new.size, dtype=jnp.float32)
                            .reshape(c_new.shape))
            return jnp.sum(h_new * wts_h) + jnp.sum(c_new * wts_c)
        return f

    argnums = tuple(range(14))
    g_ref = jax.grad(loss('ref'), argnums=argnums)(*args)
    g_pal = jax.grad(loss('pallas_interpret'), argnums=argnums)(*args)
    names = ['value', 'offsets', 'ref_center', 'offset_scale', 'hvec',
             'z0', 'h', 'c', 'ctx_w', 'w_hh',
             'ctx2att_w', 'ctx2att_b', 'alpha_w', 'alpha_b']
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


def test_lstm_step_flagshiplike_shapes():
    args, shapes = make_lstm_inputs(
        seed=2, R=32, B=2, S=200 + 100 + 50 + 25, H=8, Dh=64, Q=6, L=4,
        P=4, A=512, temporal_shapes=(200, 100, 50, 25))
    want_h, want_c = dsa_lstm_step_ref(*args, shapes)
    got_h, got_c = dsa_lstm_step(*args, shapes, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.heavy
def test_head_lstm_fuse_equivalence():
    """DSACaptionHead with lstm_fuse on/off: same math, same outputs —
    teacher forcing logprobs, greedy tokens, and parameter gradients."""
    from dvc_tpu.models.caption_heads import CaptionHeadConfig, DSACaptionHead

    cfg = CaptionHeadConfig(vocab_size=23, input_encoding_size=12,
                            rnn_size=16, num_layers=1, drop_prob=0.0,
                            max_caption_len=7, hidden_dim=16,
                            att_hid_size=20, cap_nheads=2,
                            cap_dec_n_points=3, cap_num_feature_levels=2)
    B, Pq, L = 2, 3, 2
    shapes = (12, 6)
    rng = np.random.default_rng(0)
    query = jnp.asarray(rng.standard_normal((B, Pq, 16)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, Pq, L)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.05, 0.2, (B, Pq, L)), jnp.float32)
    memory = jnp.asarray(rng.standard_normal((B, sum(shapes), 16)),
                         jnp.float32)
    pad = jnp.zeros((B, sum(shapes)), bool)
    seq = jnp.asarray(rng.integers(0, 23, (B, Pq, 7)), jnp.int32)

    outs = {}
    for fuse in (True, False):
        head = DSACaptionHead(cfg, lstm_fuse=fuse)
        params = head.init({'params': jax.random.PRNGKey(0)}, query, ref,
                           scale, memory, shapes, pad, seq)

        def loss(p):
            lp = head.apply(p, query, ref, scale, memory, shapes, pad, seq)
            return jnp.sum(lp * jnp.cos(
                jnp.arange(lp.size, dtype=jnp.float32).reshape(lp.shape)))

        tokens, lps = head.apply(params, query, ref, scale, memory, shapes,
                                 pad, mode='sample')
        outs[fuse] = (head.apply(params, query, ref, scale, memory, shapes,
                                 pad, seq),
                      jax.grad(loss)(params), tokens, lps)

    lp_t, g_t, tok_t, slp_t = outs[True]
    lp_f, g_f, tok_f, slp_f = outs[False]
    np.testing.assert_allclose(np.asarray(lp_t), np.asarray(lp_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tok_t), np.asarray(tok_f))
    np.testing.assert_allclose(np.asarray(slp_t), np.asarray(slp_f),
                               rtol=1e-5, atol=1e-6)
    flat_t = jax.tree_util.tree_leaves_with_path(g_t)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, val in flat_t:
        np.testing.assert_allclose(np.asarray(val),
                                   np.asarray(flat_f[path]),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_lstm_step_bf16_precision():
    """precision='bfloat16' on the fused LSTM step must track f32 within
    bf16 mantissa tolerance with finite gradients (mirrors the attention
    op's bf16 test)."""
    args, shapes = make_lstm_inputs(seed=17)
    want_h, want_c = dsa_lstm_step_ref(*args, shapes)
    got_h, got_c = dsa_lstm_step(*args, shapes, impl='pallas_interpret',
                                 precision='bfloat16')
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=3e-2, atol=3e-2)

    def loss(*a):
        h_new, c_new = dsa_lstm_step(*a, shapes, impl='pallas_interpret',
                                     precision='bfloat16')
        return jnp.sum(h_new ** 2) + jnp.sum(c_new ** 2)

    g = jax.grad(loss, argnums=(0, 6, 8, 9))(*args)
    for name, arr in zip(['value', 'h', 'ctx_w', 'w_hh'], g):
        arr = np.asarray(arr)
        assert np.all(np.isfinite(arr)), name


def test_rational_tanh_and_sigmoid_accuracy():
    """The 13/6-degree rational tanh must match jnp.tanh to ~4e-7 max abs
    error over the full range (documented 3.6e-7), and the derived sigmoid
    to the same order; 'native' must be the stock ops exactly."""
    import dvc_tpu.ops.dsa_step as dsa_mod
    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    try:
        dsa_mod._TANH_IMPL = 'rational'
        t_err = np.abs(np.asarray(dsa_mod._kernel_tanh(x))
                       - np.tanh(np.asarray(x)))
        s_err = np.abs(np.asarray(dsa_mod._kernel_sigmoid(x))
                       - np.asarray(jax.nn.sigmoid(x)))
        assert t_err.max() < 5e-7, t_err.max()
        assert s_err.max() < 5e-7, s_err.max()
        dsa_mod._TANH_IMPL = 'native'
        np.testing.assert_array_equal(np.asarray(dsa_mod._kernel_tanh(x)),
                                      np.asarray(jnp.tanh(x)))
        np.testing.assert_array_equal(
            np.asarray(dsa_mod._kernel_sigmoid(x)),
            np.asarray(jax.nn.sigmoid(x)))
    finally:
        dsa_mod._TANH_IMPL = None


def test_rational_tanh_full_op_parity():
    """The rational formulation must hold the op-level parity tolerances
    unchanged — attention (sample+attend) and the fused LSTM step, fwd and
    a gradient probe."""
    import dvc_tpu.ops.dsa_step as dsa_mod
    args, shapes = make_inputs(seed=13)
    largs, lshapes = make_lstm_inputs(seed=13)
    try:
        dsa_mod._TANH_IMPL = 'rational'
        got = dsa_sample_attend(*args, shapes, impl='pallas_interpret')
        gh, gc = dsa_lstm_step(*largs, lshapes, impl='pallas_interpret')
        g = jax.grad(lambda v: jnp.sum(dsa_sample_attend(
            v, *args[1:], shapes, impl='pallas_interpret') ** 2))(args[0])
    finally:
        dsa_mod._TANH_IMPL = None
    want = dsa_sample_attend_ref(*args, shapes)
    wh, wc = dsa_lstm_step_ref(*largs, lshapes)
    g_ref = jax.grad(lambda v: jnp.sum(dsa_sample_attend_ref(
        v, *args[1:], shapes) ** 2))(args[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(wh),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(wc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=3e-4, atol=3e-5)


def test_bf16_tanh_accuracy_and_op_tolerance():
    """DVC_DSA_TANH=bf16 evaluates only the attention tanh on bf16 lanes:
    elementwise |Δ| must stay within bf16 resolution (~1/256 relative),
    the LSTM gates must remain bit-identical to native f32, and the full
    sample+attend op must stay within a loosened (documented) tolerance
    of the f32 oracle."""
    import dvc_tpu.ops.dsa_step as dsa_mod
    x = jnp.asarray(np.linspace(-6.0, 6.0, 20001), jnp.float32)
    try:
        dsa_mod._TANH_IMPL = 'bf16'
        t_err = np.abs(np.asarray(dsa_mod._kernel_tanh(x))
                       - np.tanh(np.asarray(x)))
        assert t_err.max() < 8e-3, t_err.max()
        # ...and the rounding must actually engage (a zero error would
        # mean the bf16 branch silently fell through to f32)
        assert t_err.max() > 1e-4, t_err.max()
        # gates stay f32-native under bf16 mode
        np.testing.assert_array_equal(np.asarray(dsa_mod._gate_tanh(x)),
                                      np.asarray(jnp.tanh(x)))
        np.testing.assert_array_equal(
            np.asarray(dsa_mod._kernel_sigmoid(x)),
            np.asarray(jax.nn.sigmoid(x)))
        args, shapes = make_inputs(seed=13)
        got = dsa_sample_attend(*args, shapes, impl='pallas_interpret')
        g = jax.grad(lambda v: jnp.sum(dsa_sample_attend(
            v, *args[1:], shapes, impl='pallas_interpret') ** 2))(args[0])
    finally:
        dsa_mod._TANH_IMPL = None
    want = dsa_sample_attend_ref(*args, shapes)
    g_ref = jax.grad(lambda v: jnp.sum(dsa_sample_attend_ref(
        v, *args[1:], shapes) ** 2))(args[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)


def test_out_of_range_taps_border():
    """Locations pushed far out of range must follow border semantics and
    give zero location-gradient there."""
    args, shapes = make_inputs(seed=5)
    offsets = args[1] + 50.0       # everything clamps
    args = (args[0], offsets) + args[2:]
    want = dsa_sample_attend_ref(*args, shapes)
    got = dsa_sample_attend(*args, shapes, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda o: jnp.sum(dsa_sample_attend(
        args[0], o, *args[2:], shapes, impl='pallas_interpret') ** 2))(
        offsets)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
