"""Fused additive attention over deformable sample taps (LSTM-DSA).

Reference: ``pdvc/CaptioningHead/LSTM_DSA.py:245-257`` — at every word step
the caption LSTM attends over its deformable sample taps with a small
additive (Bahdanau) attention:

    u[n,h,p,:] = taps[n,h,p,:] @ Wc + bc + hvec[n,:]
    a          = tanh(u)
    dot[n,h,p] = a[n,h,p,:] @ alpha + alpha_b
    w          = softmax_p(dot)
    ctx[n,h,:] = sum_p w[n,h,p] * taps[n,h,p,:]

The hidden intermediate ``a`` is (N, H, P, A) — with A=512 that is ~100 MB
per word step at the flagship batch, and the XLA backward stores it for
every step of the word scan (HBM traffic dominates the caption backward).
The Pallas path fuses the whole block per (row-block, head) grid cell so
``u``/``a`` live only in VMEM, and the custom VJP recomputes them in the
backward kernel instead of storing them (residuals shrink to taps + hvec).

``hvec = h_top @ h2att_w + h2att_b`` stays outside the op: it is a plain
MXU matmul whose gradient XLA already handles well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------------
# reference (pure jnp) implementation — also the custom-VJP primal for 'ref'
# ----------------------------------------------------------------------------

def dsa_additive_attention_ref(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b):
    """taps: (N, H, P, Dh); hvec: (N, A); ctx_w: (Dh, A); ctx_b: (A,);
    alpha_w: (A,); alpha_b: scalar ().  Returns ctx (N, H, Dh)."""
    a = jnp.tanh(taps @ ctx_w + ctx_b + hvec[:, None, None, :])
    dot = a @ alpha_w + alpha_b                      # (N, H, P)
    w = jax.nn.softmax(dot, axis=-1)
    return jnp.einsum('nhp,nhpd->nhd', w, taps)


# ----------------------------------------------------------------------------
# Pallas kernels
# ----------------------------------------------------------------------------

def _fwd_kernel(taps_ref, hvec_ref, cw_ref, cb_ref, aw_ref, ab_ref, out_ref):
    """One (row-block, head) cell: taps (1,bn,P,Dh), hvec (bn,A) -> (1,bn,Dh).
    Head-major layout keeps every block's trailing two dims TPU-tileable."""
    t = taps_ref[0]                                   # (bn, P, Dh)
    bn, P, Dh = t.shape
    A = hvec_ref.shape[-1]
    u = (jnp.dot(t.reshape(bn * P, Dh), cw_ref[:],
                 preferred_element_type=jnp.float32).reshape(bn, P, A)
         + cb_ref[0][None, None, :] + hvec_ref[:][:, None, :])
    a = jnp.tanh(u)
    dot = jnp.sum(a * aw_ref[0][None, None, :], axis=-1) + ab_ref[0, 0]
    dot = dot - jnp.max(dot, axis=-1, keepdims=True)
    e = jnp.exp(dot)
    w = e / jnp.sum(e, axis=-1, keepdims=True)        # (bn, P)
    out_ref[0] = jnp.sum(w[:, :, None] * t, axis=1)


def _bwd_kernel(taps_ref, hvec_ref, cw_ref, cb_ref, aw_ref, ab_ref, g_ref,
                dtaps_ref, dhvec_ref, dcw_ref, dcb_ref, daw_ref, dab_ref):
    """Recompute u/a/w in VMEM, emit input grads; weight grads accumulate
    across the sequential TPU grid (zero-initialized on the first cell)."""
    i, h = pl.program_id(0), pl.program_id(1)
    t = taps_ref[0]                                   # (bn, P, Dh)
    bn, P, Dh = t.shape
    A = hvec_ref.shape[-1]
    g = g_ref[0]                                      # (bn, Dh)

    u = (jnp.dot(t.reshape(bn * P, Dh), cw_ref[:],
                 preferred_element_type=jnp.float32).reshape(bn, P, A)
         + cb_ref[0][None, None, :] + hvec_ref[:][:, None, :])
    a = jnp.tanh(u)
    dot = jnp.sum(a * aw_ref[0][None, None, :], axis=-1) + ab_ref[0, 0]
    dot = dot - jnp.max(dot, axis=-1, keepdims=True)
    e = jnp.exp(dot)
    w = e / jnp.sum(e, axis=-1, keepdims=True)        # (bn, P)

    # ctx = sum_p w_p * t_p
    dw = jnp.sum(t * g[:, None, :], axis=-1)          # (bn, P)
    dtaps = w[:, :, None] * g[:, None, :]             # (bn, P, Dh)
    ddot = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
    da = ddot[:, :, None] * aw_ref[0][None, None, :]  # (bn, P, A)
    du = da * (1.0 - a * a)
    dtaps = dtaps + jnp.dot(du.reshape(bn * P, A), cw_ref[:].T,
                            preferred_element_type=jnp.float32
                            ).reshape(bn, P, Dh)
    dtaps_ref[0] = dtaps

    # hvec is shared across heads: accumulate over the (inner) head axis
    @pl.when(h == 0)
    def _():
        dhvec_ref[:] = jnp.zeros_like(dhvec_ref)
    dhvec_ref[:] += jnp.sum(du, axis=1)

    @pl.when((i == 0) & (h == 0))
    def _():
        dcw_ref[:] = jnp.zeros_like(dcw_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)
        daw_ref[:] = jnp.zeros_like(daw_ref)
        dab_ref[:] = jnp.zeros_like(dab_ref)
    dcw_ref[:] += jnp.dot(t.reshape(bn * P, Dh).T, du.reshape(bn * P, A),
                          preferred_element_type=jnp.float32)
    dcb_ref[:] += jnp.sum(du, axis=(0, 1))[None, :]
    daw_ref[:] += jnp.sum(a * ddot[:, :, None], axis=(0, 1))[None, :]
    dab_ref[:] += jnp.sum(ddot)[None, None]


def _pad_rows(x, n_pad):
    return jnp.pad(x, ((0, n_pad - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _block_n(N, H, P, A):
    """Row-block size: keep the (bn, P, A) VMEM tensors around ~2-4 MB."""
    budget = max(1, (3 * 1024 * 1024) // max(P * A * 4, 1))
    bn = 1
    while bn * 2 <= budget:
        bn *= 2
    return max(8, min(bn, 256))


def _fwd_pallas(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b, interpret):
    N, H, P, Dh = taps.shape
    A = hvec.shape[-1]
    bn = _block_n(N, H, P, A)
    N_pad = _round_up(N, bn)
    f32 = jnp.float32
    taps_p = jnp.moveaxis(_pad_rows(taps.astype(f32), N_pad), 1, 0)
    hvec_p = _pad_rows(hvec.astype(f32), N_pad)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(N_pad // bn, H),
        in_specs=[
            pl.BlockSpec((1, bn, P, Dh), lambda i, h: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, A), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, h: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, Dh), lambda i, h: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, N_pad, Dh), f32),
        interpret=interpret,
    )(taps_p, hvec_p, ctx_w.astype(f32), ctx_b.astype(f32)[None, :],
      alpha_w.astype(f32)[None, :], jnp.asarray(alpha_b, f32).reshape(1, 1))
    return jnp.moveaxis(out, 0, 1)[:N].astype(taps.dtype)


def _bwd_pallas(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b, g, interpret):
    N, H, P, Dh = taps.shape
    A = hvec.shape[-1]
    bn = _block_n(N, H, P, A)
    N_pad = _round_up(N, bn)
    f32 = jnp.float32
    taps_p = jnp.moveaxis(_pad_rows(taps.astype(f32), N_pad), 1, 0)
    hvec_p = _pad_rows(hvec.astype(f32), N_pad)
    g_p = jnp.moveaxis(_pad_rows(g.astype(f32), N_pad), 1, 0)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(N_pad // bn, H),
        in_specs=[
            pl.BlockSpec((1, bn, P, Dh), lambda i, h: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, A), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, h: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn, Dh), lambda i, h: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, P, Dh), lambda i, h: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, A), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, N_pad, P, Dh), f32),
            jax.ShapeDtypeStruct((N_pad, A), f32),
            jax.ShapeDtypeStruct((Dh, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        interpret=interpret,
    )(taps_p, hvec_p, ctx_w.astype(f32), ctx_b.astype(f32)[None, :],
      alpha_w.astype(f32)[None, :], jnp.asarray(alpha_b, f32).reshape(1, 1),
      g_p)
    dtaps, dhvec, dcw, dcb, daw, dab = outs
    dtaps = jnp.moveaxis(dtaps, 0, 1)
    return (dtaps[:N].astype(taps.dtype), dhvec[:N].astype(hvec.dtype),
            dcw.astype(ctx_w.dtype), dcb[0].astype(ctx_b.dtype),
            daw[0].astype(alpha_w.dtype),
            dab[0, 0].astype(jnp.asarray(alpha_b).dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _dsa_attention_pallas(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
                          interpret=False):
    return _fwd_pallas(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b, interpret)


def _dsa_fwd(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b, interpret):
    out = _fwd_pallas(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b, interpret)
    return out, (taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b)


def _dsa_bwd(interpret, res, g):
    return _bwd_pallas(*res, g, interpret)


_dsa_attention_pallas.defvjp(_dsa_fwd, _dsa_bwd)


# ----------------------------------------------------------------------------
# dispatcher
# ----------------------------------------------------------------------------

def dsa_additive_attention(taps, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
                           impl='auto'):
    """Fused additive attention over sample taps (see module docstring).

    impl: 'auto' (pallas on TPU, ref elsewhere), 'ref', 'pallas',
    'pallas_interpret' (for CPU tests of the kernel path).
    """
    if impl == 'auto':
        impl = ('pallas' if jax.default_backend() == 'tpu' else 'ref')
    if impl == 'ref':
        return dsa_additive_attention_ref(taps, hvec, ctx_w, ctx_b,
                                          alpha_w, alpha_b)
    if impl in ('pallas', 'pallas_interpret'):
        return _dsa_attention_pallas(taps, hvec, ctx_w, ctx_b, alpha_w,
                                     alpha_b, impl == 'pallas_interpret')
    raise ValueError(f'unknown dsa attention impl {impl!r}')
