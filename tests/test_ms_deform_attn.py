"""Parity tests for the 1-D MS deformable attention op.

Mirrors the reference's only real test (``pdvc/ops/test.py``): forward
parity between implementations plus gradient checks across channel sizes
including non-powers of two — with the jnp oracle as the fixture and the
dense/pallas paths as the implementations under test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops import (
    ms_deform_attn_dense,
    ms_deform_attn_pallas,
    ms_deform_attn_ref,
    ms_deform_attn_sample_values,
)

SHAPES = ((8, 4, 2, 1),)  # T0..T3


def make_inputs(rng, B=2, Q=6, H=4, D=8, shapes=SHAPES[0], P=3):
    S = sum(shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32)
    # locations straddle the valid range to exercise boundary handling
    loc = rng.uniform(-0.2, 1.2, (B, Q, H, L, P)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, Q, H, L, P)).astype(np.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)


def numpy_oracle(value, shapes, loc, attn, mode="zeros"):
    """Straightforward loop implementation — the ground truth."""
    value, loc, attn = map(np.asarray, (value, loc, attn))
    B, S, H, D = value.shape
    _, Q, _, L, P = loc.shape
    starts = np.cumsum([0] + list(shapes))[:-1]
    out = np.zeros((B, Q, H, D), np.float32)
    for b in range(B):
        for q in range(Q):
            for h in range(H):
                for l in range(L):
                    T, s0 = shapes[l], starts[l]
                    for p in range(P):
                        pos = loc[b, q, h, l, p] * T - 0.5
                        i0 = int(np.floor(pos))
                        w1 = pos - i0
                        for i, w in ((i0, 1 - w1), (i0 + 1, w1)):
                            if mode == "zeros":
                                if 0 <= i < T:
                                    out[b, q, h] += attn[b, q, h, l, p] * w * value[b, s0 + i, h]
                            else:  # border
                                ic = min(max(i, 0), T - 1)
                                out[b, q, h] += attn[b, q, h, l, p] * w * value[b, s0 + ic, h]
    return out.reshape(B, Q, H * D)


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_ref_matches_numpy_oracle(mode):
    rng = np.random.default_rng(0)
    value, loc, attn = make_inputs(rng)
    got = ms_deform_attn_ref(value, SHAPES[0], loc, attn, mode=mode)
    want = numpy_oracle(value, SHAPES[0], loc, attn, mode=mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D", [8, 16, 30, 71])
def test_dense_matches_ref(D):
    rng = np.random.default_rng(1)
    value, loc, attn = make_inputs(rng, D=D)
    got = ms_deform_attn_dense(value, SHAPES[0], loc, attn)
    want = ms_deform_attn_ref(value, SHAPES[0], loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D", [8, 30, 64])
def test_pallas_interpret_matches_ref(D):
    rng = np.random.default_rng(2)
    value, loc, attn = make_inputs(rng, D=D)
    got = ms_deform_attn_pallas(value, SHAPES[0], loc, attn, "zeros", True)
    want = ms_deform_attn_ref(value, SHAPES[0], loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_between_impls():
    rng = np.random.default_rng(3)
    value, loc, attn = make_inputs(rng)

    def loss(fn):
        def f(v, s, a):
            out = fn(v, s, a)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        return jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)

    g_ref = loss(lambda v, s, a: ms_deform_attn_ref(v, SHAPES[0], s, a))
    g_dense = loss(lambda v, s, a: ms_deform_attn_dense(v, SHAPES[0], s, a))
    g_pallas = loss(lambda v, s, a: ms_deform_attn_pallas(v, SHAPES[0], s, a, "zeros", True))
    for a, b in zip(g_ref, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    for a, b in zip(g_ref, g_pallas):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_grad_numeric_check():
    """Finite-difference check of d(out)/d(loc) away from cell boundaries."""
    rng = np.random.default_rng(4)
    value, loc, attn = make_inputs(rng, B=1, Q=2, H=2, D=4, P=2)
    # keep away from interpolation-cell boundaries where grad is discontinuous
    loc = jnp.clip(loc, 0.15, 0.85) + 0.013

    def f(l):
        return jnp.sum(ms_deform_attn_ref(value, SHAPES[0], l, attn) ** 2)

    g = jax.grad(f)(loc)
    eps = 1e-3
    flat = np.asarray(loc).ravel()
    for k in [0, 3, 7]:
        e = np.zeros_like(flat); e[k] = eps
        d = (f(jnp.asarray((flat + e).reshape(loc.shape)))
             - f(jnp.asarray((flat - e).reshape(loc.shape)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g).ravel()[k], d, rtol=2e-2, atol=1e-3)


def test_sample_values_border_semantics():
    rng = np.random.default_rng(5)
    value, loc, attn = make_inputs(rng, B=1, Q=3, H=2, D=4, P=2)
    samp = ms_deform_attn_sample_values(value, SHAPES[0], loc)
    B, Q, H, L, P, D = samp.shape
    assert (B, Q, H, L, P, D) == (1, 3, 2, 4, 2, 4)
    # reducing the samples with the attention weights == full op in border mode
    out = jnp.sum(samp * attn[..., None], axis=(3, 4)).reshape(1, 3, -1)
    want = numpy_oracle(value, SHAPES[0], loc, attn, mode="border")
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_sample_values_grad_matches_gather():
    """Custom (dense-formulated) backward of sample_values equals the
    gather implementation's autodiff."""
    from dvc_tpu.ops.ms_deform_attn import _sample_values_gather
    rng = np.random.default_rng(7)
    value, loc, attn = make_inputs(rng, B=1, Q=3, H=2, D=4, P=2)

    def loss_custom(v, l):
        out = ms_deform_attn_sample_values(v, SHAPES[0], l)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_gather(v, l):
        out = _sample_values_gather(v, SHAPES[0], l, 'border')
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g1 = jax.grad(loss_custom, argnums=(0, 1))(value, loc)
    g2 = jax.grad(loss_gather, argnums=(0, 1))(value, loc)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_pallas_analytic_bwd_matches_dense_vjp(mode):
    """The analytic level-merged Pallas backward emits the same
    (dvalue, dloc, dattn) as the XLA dense-formulation VJP, both modes,
    with boundary-straddling locations."""
    import importlib
    m = importlib.import_module("dvc_tpu.ops.ms_deform_attn")
    rng = np.random.default_rng(11)
    value, loc, attn = make_inputs(rng, B=2, Q=5, H=3, D=6, P=3)

    def loss(v, s, a):
        out = ms_deform_attn_pallas(v, SHAPES[0], s, a, mode, True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    old = m._BWD_IMPL
    try:
        m._BWD_IMPL = 'pallas'
        g_pal = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
        m._BWD_IMPL = 'dense'
        g_dense = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
    finally:
        m._BWD_IMPL = old
    for a, b in zip(g_pal, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_bwd_odd_channels_and_single_level():
    """Padding correctness: odd D, Q not a multiple of 8, one level."""
    import importlib
    m = importlib.import_module("dvc_tpu.ops.ms_deform_attn")
    shapes = (7,)
    rng = np.random.default_rng(13)
    value, loc, attn = make_inputs(rng, B=1, Q=3, H=2, D=5,
                                   shapes=shapes, P=2)

    def loss(fn):
        def f(v, s, a):
            out = fn(v, s, a)
            return jnp.sum(out * jnp.sin(1.0 + jnp.arange(out.size)
                                         .reshape(out.shape)))
        return jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)

    old = m._BWD_IMPL
    try:
        m._BWD_IMPL = 'pallas'
        g_pal = loss(lambda v, s, a: ms_deform_attn_pallas(
            v, shapes, s, a, "zeros", True))
    finally:
        m._BWD_IMPL = old
    g_ref = loss(lambda v, s, a: ms_deform_attn_ref(v, shapes, s, a))
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fwd_impl", ["level", "flat"])
@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_pallas_fwd_variants_match_ref(fwd_impl, mode):
    """Both forward kernel layouts (level-sliced default / flat full-S)
    pin to the oracle; the trunk default is nonetheless the DENSE XLA
    formulation (hardware A/B, HW_VALIDATION.jsonl stage 'trunk_fwd')."""
    import importlib
    M = importlib.import_module('dvc_tpu.ops.ms_deform_attn')
    rng = np.random.default_rng(11)
    value, loc, attn = make_inputs(rng, D=16, shapes=(9, 5, 3), P=2)
    old = M._FWD_IMPL
    try:
        M._FWD_IMPL = fwd_impl
        got = ms_deform_attn_pallas(value, (9, 5, 3), loc, attn, mode, True)
    finally:
        M._FWD_IMPL = old
    want = ms_deform_attn_ref(value, (9, 5, 3), loc, attn, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_trunk_impl_resolution():
    """msda_impl='auto' resolves the TRUNK to dense (HW-validated) while
    explicit choices and msda_trunk_impl overrides are honored."""
    from dvc_tpu.models.pdvc import resolve_trunk_impl
    for msda_impl, trunk_override, want in [
            ('auto', '', 'dense'),
            ('pallas', '', 'pallas'),
            ('dense', '', 'dense'),
            ('ref', '', 'ref'),
            ('auto', 'pallas', 'pallas'),
            ('dense', 'pallas_interpret', 'pallas_interpret'),
    ]:
        assert resolve_trunk_impl(trunk_override, msda_impl) == want
