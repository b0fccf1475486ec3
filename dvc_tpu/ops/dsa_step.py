"""Fused caption-step ops: deformable tap sampling + additive attention,
optionally including the caption LSTM cell (``dsa_lstm_step``).

Reference: the LSTM-DSA word step (``pdvc/CaptioningHead/LSTM_DSA.py:233-257``
+ ``ms_deform_attn_for_caption.py:102-123``): at every word the caption LSTM
samples H·L·P value taps at hidden-state-dependent locations and attends
over them with a small additive attention.

The jnp composition (gather + one-hot-matmul VJP + fused attention op) runs
this as several HBM-bound ops per scan step; honest profiling puts the
sampling alone at ~20 ms of the 48 ms flagship train step (19 steps,
fwd+bwd).  This op fuses the whole block per batch-row grid cell:

    pos   = (ref[:, l] + offsets * scale) · T_l - 0.5            (outside)
    taps  = border-mode linear interp of value at pos      (one-hot matmuls)
    u     = tanh(taps @ Wc + bc + hvec)                    (additive attn)
    w     = softmax_lp(u @ alpha + ab)
    ctx   = sum_lp w * taps

so taps / one-hots / the (·, LP, A) tanh activation only ever live in VMEM.
The custom-VJP boundary sits at (value, pos, hvec, attention params): the
backward kernel recomputes everything in VMEM and emits analytic gradients
(validated against ``jax.vjp`` of the jnp composition); the offsets/ref/
scale -> pos chain stays outside under plain autodiff (tiny elementwise).

Level-merged layout (the round-3 restructure): the per-(level, head) loop
of tiny (Q·P, T_l) matmuls serialized ~100 sub-tile MXU ops per grid cell
and was the train step's largest backward slice.  Locations are now
pre-converted OUTSIDE the kernel to flat level-relative positions
(pos = loc·T_l - 0.5, flattened (q, l, p); per-element clamp bounds and
integer level starts baked from the static level table — the start shifts
the integer index only, so the f32 lerp weights are bit-identical to the
per-level formulation), and the kernel builds one vectorized (H, Q·L·P, S)
one-hot pair over the whole S axis and runs ONE well-shaped
(Q·L·P, S) @ (S, Dh) matmul per head — 8 MXU ops instead of 32, each 4x
larger.  The (q, l, p) flatten order means the per-head taps split straight
into the attention's (Q, L·P, Dh) layout with major-dim reshapes only
(lane-dim shape casts are unsupported on TPU).  Value rides as
(B, H, S, Dh) so per-head slices and per-head dvalue stores are contiguous.

Only ``mode='border'`` is implemented — the caption path always uses the
reference's grid_sample border semantics (``ms_deform_attn_func.py:58-59``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ms_deform_attn import _bounds_table_np, _lerp_onehot_pair

# the backward's per-cell working set ((H, LP, Q, A) attention
# intermediates plus the (H, QLP, S) one-hot pair) exceeds Mosaic's 16 MB
# default scoped-vmem budget at the flagship A=512, and the fused-LSTM eval
# path (Q=Nq=100 greedy queries) can brush past 64 MB; v5e has 128 MB of
# VMEM — allow 3/4 of it
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


# ----------------------------------------------------------------------------
# jnp reference (oracle; also the CPU path)
# ----------------------------------------------------------------------------

def dsa_sample_attend_ref(value, offsets, ref_center, offset_scale, hvec,
                          ctx_w, ctx_b, alpha_w, alpha_b, temporal_shapes):
    """value: (B, S, H, Dh); offsets: (B, Q, H, L, P); ref_center /
    offset_scale: (B, Q, L); hvec: (B, Q, A); ctx_w: (Dh, A); ctx_b: (A,);
    alpha_w: (A,); alpha_b: ().  Returns ctx (B, Q, H, Dh)."""
    from .ms_deform_attn import ms_deform_attn_sample_values
    loc = (ref_center[:, :, None, :, None]
           + offsets * offset_scale[:, :, None, :, None])
    taps = ms_deform_attn_sample_values(value, tuple(temporal_shapes), loc,
                                        mode='border')
    B, Q, H, L, P, Dh = taps.shape
    taps = taps.reshape(B, Q, H, L * P, Dh)
    u = jnp.tanh(taps @ ctx_w + ctx_b + hvec[:, :, None, None, :])
    dot = u @ alpha_w + alpha_b
    w = jax.nn.softmax(dot, axis=-1)                    # (B, Q, H, LP)
    return jnp.einsum('bqhp,bqhpd->bqhd', w, taps)


# ----------------------------------------------------------------------------
# in-kernel helpers
# ----------------------------------------------------------------------------

# Mosaic lowers jnp.tanh through an exp-based form (~30 VPU ops/element);
# the 'rational' impl is the 13/6-degree rational approximation
# (Eigen/XLA's float tanh: ~12 FMA + 1 divide); it matches tanh to 3.6e-7
# max abs error over the full range — below f32 ulp noise for this op, so
# the parity tests hold unchanged.  Select with
# DVC_DSA_TANH=native|rational|bf16 (read at trace time; the module
# variable overrides the env for tests).
# 'native' is the hardware-validated default: on the real v5e Mosaic's
# native tanh beat the rational form 4x on the fused forward
# (HW_VALIDATION.jsonl stage 'kernel').
# 'bf16' evaluates the transcendental on bf16 lanes (2 elements/lane;
# microbenched ~17-27% faster than f32 native at the scan's (HQ·LP, A)
# shape) and upcasts the result — |Δtanh| ≤ ~4e-3, a NUMERICS DEVIATION
# from the f32 attention scores the reference computes, so it is opt-in
# and never a default (HW_VALIDATION.jsonl stage 'tanh_bf16').
_TANH_IMPL = None
_TANH_DEFAULT = 'native'


def _kernel_tanh(x):
    impl = _TANH_IMPL or os.environ.get('DVC_DSA_TANH', _TANH_DEFAULT)
    if impl not in ('native', 'rational', 'bf16'):
        raise ValueError(
            f'DVC_DSA_TANH must be native|rational|bf16, got {impl!r}')
    if impl == 'native':
        return jnp.tanh(x)
    if impl == 'bf16':
        return jnp.tanh(x.astype(jnp.bfloat16)).astype(x.dtype)
    xc = jnp.clip(x, -7.90531110763549805, 7.90531110763549805)
    x2 = xc * xc
    num = jnp.float32(-2.76076847742355e-16)
    num = num * x2 + 2.00018790482477e-13
    num = num * x2 + -8.60467152213735e-11
    num = num * x2 + 5.12229709037114e-08
    num = num * x2 + 1.48572235717979e-05
    num = num * x2 + 6.37261928875436e-04
    num = num * x2 + 4.89352455891786e-03
    num = num * xc
    den = jnp.float32(1.19825839466702e-06)
    den = den * x2 + 1.18534705686654e-04
    den = den * x2 + 2.26843463243900e-03
    den = den * x2 + 4.89352518554385e-03
    return num / den


def _kernel_sigmoid(x):
    """Gate sigmoid through the same selectable formulation:
    sigmoid(x) = 0.5 + 0.5*tanh(x/2), so DVC_DSA_TANH=rational also lifts
    the LSTM gates off Mosaic's exp-based logistic.  'native' returns the
    stock op (bit-identical to the validated default path)."""
    impl = _TANH_IMPL or os.environ.get('DVC_DSA_TANH', _TANH_DEFAULT)
    if impl != 'rational':
        # 'bf16' keeps the gates in f32 too: the LSTM recurrence is far
        # more rounding-sensitive than the attention scores, and the gate
        # tensor (Q, 4R) is ~30x smaller than the attention's (HQ·LP, A)
        return jax.nn.sigmoid(x)
    return 0.5 + 0.5 * _kernel_tanh(x * 0.5)


def _make_dot(precision):
    """MXU matmul in the requested multiply precision (f32 accumulate).
    'bfloat16' casts both operands — ~3-4x faster on the MXU (one pass vs
    the f32 multi-pass decomposition) at bf16 mantissa cost."""
    if precision == 'bfloat16':
        def dot(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return dot


def _bounds_np(temporal_shapes, Q, P):
    """Flat (Q*L*P,) view of the shared level-bounds table
    (:func:`ms_deform_attn._bounds_table_np` — single source of the
    boundary semantics for both fused-sampling kernel families)."""
    hib, s0v = _bounds_table_np(temporal_shapes, Q, P)
    return hib.reshape(-1), s0v.reshape(-1)


def _level_pos(loc, temporal_shapes):
    """loc: (B, Q, H, L, P) normalized per-level locations -> level-relative
    continuous positions (B, H, Q·L·P) in (q, l, p) order: pos = loc·T_l
    - 0.5 (the level start is applied to the integer index in-kernel).
    Computed in float32 regardless of loc.dtype: at bf16 a position near
    T~400 has absolute spacing ~2, destroying the lerp fraction."""
    B, Q, H, L, P = loc.shape
    t_vec = jnp.asarray(temporal_shapes, jnp.float32)
    pos = loc.astype(jnp.float32) * t_vec[None, None, None, :, None] - 0.5
    return pos.transpose(0, 2, 1, 3, 4).reshape(B, H, Q * L * P)


def _interp_onehots(pos, hib, s0v, S):
    """pos: (H, N) level-relative positions; hib: (1, N) relative clamp
    bound (T_l - 1); s0v: (1, N) int32 level starts.
    Returns (M, M_lo, M_hi), each (H, N, S): the lerp one-hot pair and
    their weighted sum.  Vectorized over heads — one iota/compare build
    for the whole cell."""
    _, w_lo, w_hi, M_lo, M_hi = _lerp_onehot_pair(pos, hib, s0v, S)
    M = w_lo[..., None] * M_lo + w_hi[..., None] * M_hi
    return M, M_lo, M_hi


def _taps_from_M(M, value, H, dot):
    """M: (H, N, S); value: (H, S, Dh).  One (N, S) @ (S, Dh) per head."""
    return jnp.stack([dot(M[h], value[h]) for h in range(H)])  # (H, N, Dh)


def _attention_fwd(taps4, hvec, cw_ref, cb_ref, aw_ref, ab, Q, H, LP, Dh,
                   A, dot):
    """taps4: (H, Q, LP, Dh); hvec: (Q, A).  Returns (a, w):
    a (H, Q, LP, A) tanh activations, w (H, Q, LP) softmax weights."""
    u = (dot(taps4.reshape(H * Q * LP, Dh), cw_ref[:])
         .reshape(H, Q, LP, A)
         + cb_ref[0][None, None, None, :]
         + hvec[None, :, None, :])
    a = _kernel_tanh(u)
    d = jnp.sum(a * aw_ref[0][None, None, None, :], axis=-1) + ab
    d = d - jnp.max(d, axis=-1, keepdims=True)
    e = jnp.exp(d)
    w = e / jnp.sum(e, axis=-1, keepdims=True)           # (H, Q, LP)
    return a, w


def _fwd_math(value, pos, hib, s0v, hvec, cw_ref, cb_ref, aw_ref, ab,
              S, Q, H, LP, Dh, A, dot):
    """Shared forward: interp one-hots + taps + additive attention + ctx.
    value: (H, S, Dh); pos: (H, Q·LP).  Returns (taps4, a, w, ctx, Ms)
    with ctx (H, Q, Dh) and Ms = (M, M_lo, M_hi) for backward reuse."""
    Ms = _interp_onehots(pos, hib, s0v, S)
    taps = _taps_from_M(Ms[0], value, H, dot)            # (H, QLP, Dh)
    taps4 = taps.reshape(H, Q, LP, Dh)
    a, w = _attention_fwd(taps4, hvec, cw_ref, cb_ref, aw_ref, ab,
                          Q, H, LP, Dh, A, dot)
    ctx = jnp.sum(w[..., None] * taps4, axis=2)          # (H, Q, Dh)
    return taps4, a, w, ctx, Ms


def _attn_bwd_from_g(value, taps4, a, w, Ms, cw_ref, aw_ref, g,
                     Q, H, LP, Dh, A, dot):
    """Backward of (sampling + attention) given g = d ctx (H, Q, Dh).

    Returns (dvalue (H, S, Dh), dpos (H, Q·LP), dhvec (Q, A)) plus the
    attention weight grads as plain values — callers own ref accumulation."""
    M, M_lo, M_hi = Ms

    # ---- attention backward (ctx = sum_p w_p t_p)
    dw = jnp.sum(taps4 * g[:, :, None, :], axis=-1)      # (H, Q, LP)
    dtaps = w[..., None] * g[:, :, None, :]              # (H, Q, LP, Dh)
    ddot = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
    da = ddot[..., None] * aw_ref[0][None, None, None, :]
    du = da * (1.0 - a * a)                              # (H, Q, LP, A)
    dtaps = dtaps + dot(
        du.reshape(H * Q * LP, A), cw_ref[:].T).reshape(H, Q, LP, Dh)
    dhvec = jnp.sum(du, axis=(0, 2))                     # (Q, A)
    dcw = dot(taps4.reshape(H * Q * LP, Dh).T,
              du.reshape(H * Q * LP, A))
    dcb = jnp.sum(du, axis=(0, 1, 2))[None, :]
    daw = jnp.sum(a * ddot[..., None], axis=(0, 1, 2))[None, :]
    dab = jnp.sum(ddot)

    # ---- sampling backward: per head, two well-shaped matmuls.
    # d tap / d pos = v[idx_hi] - v[idx_lo]  (border clamp -> 0 at edges);
    # dvalue_h = M_h^T @ dtaps_h rides the same one-hot pair.
    dtapsf = dtaps.reshape(H, Q * LP, Dh)
    dvalue = jnp.stack([dot(M[h].T, dtapsf[h]) for h in range(H)])
    diff = jnp.stack([dot(M_hi[h] - M_lo[h], value[h]) for h in range(H)])
    dpos = jnp.sum(dtapsf * diff, axis=-1)               # (H, QLP)
    return dvalue, dpos, dhvec, dcw, dcb, daw, dab


# ----------------------------------------------------------------------------
# LSTM-cell math (num_layers == 1, bias-free — torch nn.LSTM(bias=False))
# ----------------------------------------------------------------------------

def _gate_tanh(x):
    """Cell/gate tanh: follows 'rational' (formulation change, exact to
    f32 ulp) but NOT 'bf16' — rounding in the recurrent state compounds
    over the word scan, and the gate tensors are ~30x smaller than the
    attention's, so there is nothing to win there anyway."""
    impl = _TANH_IMPL or os.environ.get('DVC_DSA_TANH', _TANH_DEFAULT)
    if impl == 'rational':
        return _kernel_tanh(x)
    return jnp.tanh(x)


def _lstm_cell_fwd(z, c_prev):
    """z: (..., 4R) preactivation in torch gate order (i, f, g, o);
    c_prev: (..., R).  Returns (h_new, c_new)."""
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c_new = (_kernel_sigmoid(f) * c_prev
             + _kernel_sigmoid(i) * _gate_tanh(g))
    h_new = _kernel_sigmoid(o) * _gate_tanh(c_new)
    return h_new, c_new


def _lstm_cell_bwd(z, c_prev, gh, gc):
    """Backward of ``_lstm_cell_fwd`` recomputing gates from (z, c_prev).
    Returns (dz, dc_prev)."""
    i, f, g, o = jnp.split(z, 4, axis=-1)
    si = _kernel_sigmoid(i)
    sf = _kernel_sigmoid(f)
    so = _kernel_sigmoid(o)
    tg = _gate_tanh(g)
    c_new = sf * c_prev + si * tg
    th = _gate_tanh(c_new)
    dc_tot = gc + gh * so * (1.0 - th * th)
    do = gh * th * so * (1.0 - so)
    df = dc_tot * c_prev * sf * (1.0 - sf)
    di = dc_tot * tg * si * (1.0 - si)
    dg = dc_tot * si * (1.0 - tg * tg)
    dz = jnp.concatenate([di, df, dg, do], axis=-1)
    return dz, dc_tot * sf


# ----------------------------------------------------------------------------
# Pallas kernels (grid over B)
# ----------------------------------------------------------------------------

def _make_fwd_kernel(S, Q, H, LP, Dh, A, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, pos_ref, hib_ref, s0v_ref, hvec_ref, cw_ref,
               cb_ref, aw_ref, ab_ref, out_ref):
        _, _, _, ctx, _ = _fwd_math(value_ref[0], pos_ref[0], hib_ref[:],
                                    s0v_ref[:], hvec_ref[0], cw_ref, cb_ref,
                                    aw_ref, ab_ref[0, 0],
                                    S, Q, H, LP, Dh, A, dot)
        out_ref[0] = ctx                                 # (H, Q, Dh)
    return kernel


def _make_bwd_kernel(S, Q, H, LP, Dh, A, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, pos_ref, hib_ref, s0v_ref, hvec_ref, cw_ref,
               cb_ref, aw_ref, ab_ref, g_ref,
               dvalue_ref, dpos_ref, dhvec_ref, dcw_ref, dcb_ref, daw_ref,
               dab_ref):
        b = pl.program_id(0)
        value = value_ref[0]                             # (H, S, Dh)
        g = g_ref[0]                                     # (H, Q, Dh)

        taps4, a, w, _, Ms = _fwd_math(value, pos_ref[0], hib_ref[:],
                                       s0v_ref[:], hvec_ref[0], cw_ref,
                                       cb_ref, aw_ref, ab_ref[0, 0],
                                       S, Q, H, LP, Dh, A, dot)
        dvalue, dpos, dhvec, dcw, dcb, daw, dab = _attn_bwd_from_g(
            value, taps4, a, w, Ms, cw_ref, aw_ref, g, Q, H, LP, Dh, A, dot)
        dvalue_ref[0] = dvalue
        dpos_ref[0] = dpos
        dhvec_ref[0] = dhvec

        @pl.when(b == 0)
        def _():
            dcw_ref[:] = jnp.zeros_like(dcw_ref)
            dcb_ref[:] = jnp.zeros_like(dcb_ref)
            daw_ref[:] = jnp.zeros_like(daw_ref)
            dab_ref[:] = jnp.zeros_like(dab_ref)
        dcw_ref[:] += dcw
        dcb_ref[:] += dcb
        daw_ref[:] += daw
        dab_ref[:] += dab[None, None]
    return kernel


def _pallas_core(value_t, pos, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
                 temporal_shapes, Q, interpret, precision='float32',
                 backward=False, g=None):
    """value_t: (B, H, S, Dh) head-major value; pos: (B, H, Q·L·P) global
    flat positions.  Forward returns ctx (B, H, Q, Dh)."""
    B, H, S, Dh = value_t.shape
    N = pos.shape[-1]
    LP = N // Q
    A = hvec.shape[-1]
    f32 = jnp.float32
    hib_np, s0v_np = _bounds_np(temporal_shapes, Q, LP // len(temporal_shapes))
    args = (value_t.astype(f32), pos.astype(f32),
            jnp.asarray(hib_np)[None, :], jnp.asarray(s0v_np)[None, :],
            hvec.astype(f32),
            ctx_w.astype(f32), ctx_b.astype(f32)[None, :],
            alpha_w.astype(f32)[None, :],
            jnp.asarray(alpha_b, f32).reshape(1, 1))
    in_specs = [
        pl.BlockSpec((1, H, S, Dh), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, N), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, A), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Dh, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]
    if not backward:
        out = pl.pallas_call(
            _make_fwd_kernel(S, Q, H, LP, Dh, A, precision),
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, H, Q, Dh), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, Q, Dh), f32),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*args)
        return out.astype(value_t.dtype)

    outs = pl.pallas_call(
        _make_bwd_kernel(S, Q, H, LP, Dh, A, precision),
        grid=(B,),
        in_specs=in_specs + [
            pl.BlockSpec((1, H, Q, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, H, S, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, A), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, Dh), f32),
            jax.ShapeDtypeStruct((B, H, N), f32),
            jax.ShapeDtypeStruct((B, Q, A), f32),
            jax.ShapeDtypeStruct((Dh, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*args, g.astype(f32))
    dv, dpos, dhvec, dcw, dcb, daw, dab = outs
    return (dv.astype(value_t.dtype), dpos.astype(pos.dtype),
            dhvec.astype(hvec.dtype), dcw.astype(ctx_w.dtype),
            dcb[0].astype(ctx_b.dtype), daw[0].astype(alpha_w.dtype),
            dab[0, 0].astype(jnp.asarray(alpha_b).dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _dsa_core(value_t, pos, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
              temporal_shapes, Q, interpret, precision):
    return _pallas_core(value_t, pos, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
                        temporal_shapes, Q, interpret, precision)


def _dsa_core_fwd(value_t, pos, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
                  temporal_shapes, Q, interpret, precision):
    out = _pallas_core(value_t, pos, hvec, ctx_w, ctx_b, alpha_w, alpha_b,
                       temporal_shapes, Q, interpret, precision)
    return out, (value_t, pos, hvec, ctx_w, ctx_b, alpha_w, alpha_b)


def _dsa_core_bwd(temporal_shapes, Q, interpret, precision, res, g):
    return _pallas_core(*res, temporal_shapes, Q, interpret, precision,
                        backward=True, g=g)


_dsa_core.defvjp(_dsa_core_fwd, _dsa_core_bwd)


# ----------------------------------------------------------------------------
# dispatcher
# ----------------------------------------------------------------------------

def dsa_sample_attend(value, offsets, ref_center, offset_scale, hvec,
                      ctx_w, ctx_b, alpha_w, alpha_b, temporal_shapes,
                      impl='auto', precision='float32'):
    """Fused tap sampling + additive attention (see module docstring).

    impl: 'auto' (pallas on TPU, ref elsewhere), 'ref', 'pallas',
    'pallas_interpret'.
    precision: 'float32' (default) or 'bfloat16' — multiply precision of
    the in-kernel MXU matmuls (accumulation always f32).  bf16 runs the
    forward ~3-4x faster (one MXU pass vs the f32 multi-pass
    decomposition); follow the model's ``tpu_compute_dtype``.
    """
    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() == 'tpu' else 'ref'
    if impl == 'ref':
        return dsa_sample_attend_ref(value, offsets, ref_center,
                                     offset_scale, hvec, ctx_w, ctx_b,
                                     alpha_w, alpha_b, temporal_shapes)
    if impl in ('pallas', 'pallas_interpret'):
        from ..parallel.op_partition import partition_batched
        B, Q, H, L, P = offsets.shape
        loc = (ref_center[:, :, None, :, None]
               + offsets * offset_scale[:, :, None, :, None])
        pos = _level_pos(loc, temporal_shapes)           # (B, H, QLP)
        value_t = value.transpose(0, 2, 1, 3)            # (B, H, S, Dh)

        def core(v, p, hv, cw, cb, aw, ab):
            return _dsa_core(v, p, hv, cw, cb, aw, ab,
                             tuple(temporal_shapes), Q,
                             impl == 'pallas_interpret', precision)
        ctx = partition_batched(
            core, (value_t, pos, hvec),
            (ctx_w, ctx_b, alpha_w, jnp.asarray(alpha_b)))
        return ctx.transpose(0, 2, 1, 3)                 # (B, Q, H, Dh)
    raise ValueError(f'unknown dsa step impl {impl!r}')


# ----------------------------------------------------------------------------
# Fully fused word step: sampling + attention + LSTM cell
# ----------------------------------------------------------------------------
#
# The caption scan's remaining per-step HBM round trips after the
# sample+attend fusion are the LSTM glue: ctx -> ctx @ W_ctx, the recurrent
# h @ W_hh, and the gate chain (reference ``LSTM_DSA.py:259-261``).  This op
# extends the kernel with the (single-layer, bias-free) LSTM cell so one
# launch per word step reads (h, c, z0) and writes (h', c') — ctx, the gate
# preactivations, and the gate activations never reach HBM.  The tiny
# hidden-state projections that FEED the kernel (sampling offsets, h2att)
# stay outside in XLA: their operands are (N, R) @ (R, <=A) matmuls that XLA
# fuses with the loc/hvec elementwise prep, and keeping them outside lets
# plain autodiff route their gradient contributions into dh.
#
# Hardware-validated posture (HW_VALIDATION.jsonl stages 'lstm'/'ab_fuse*'):
# folding the LSTM's (N, 4R) recurrent matmuls into the launch LOSES
# ~2.3 ms/step end-to-end at the flagship width against XLA's own fusion of
# the surrounding scan, so this op is OFF by default (``dsa_lstm_fuse``) and
# kept oracle-pinned for wider-hidden configs where the balance could flip.

def dsa_lstm_step_ref(value, offsets, ref_center, offset_scale, hvec,
                      z0, h, c, ctx_w, w_hh,
                      ctx2att_w, ctx2att_b, alpha_w, alpha_b,
                      temporal_shapes):
    """Oracle: the jnp composition of sample+attend and the LSTM cell.

    z0: (B, Q, 4R) input preactivation (token embedding + event-query
    contributions, hoisted by the caller); h/c: (B, Q, R) LSTM state;
    ctx_w: (d, 4R) context input weight; w_hh: (R, 4R) recurrent weight.
    Returns (h_new, c_new), each (B, Q, R)."""
    ctx = dsa_sample_attend_ref(value, offsets, ref_center, offset_scale,
                                hvec, ctx2att_w, ctx2att_b, alpha_w, alpha_b,
                                temporal_shapes)
    B, Q, H, Dh = ctx.shape
    z = z0 + ctx.reshape(B, Q, H * Dh) @ ctx_w + h @ w_hh
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _make_lstm_fwd_kernel(S, Q, H, LP, Dh, A, R, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, pos_ref, hib_ref, s0v_ref, hvec_ref, z0_ref,
               h_ref, c_ref, cw3_ref, whh_ref, cw_ref, cb_ref, aw_ref,
               ab_ref, hout_ref, cout_ref):
        _, _, _, ctx, _ = _fwd_math(value_ref[0], pos_ref[0], hib_ref[:],
                                    s0v_ref[:], hvec_ref[0], cw_ref, cb_ref,
                                    aw_ref, ab_ref[0, 0],
                                    S, Q, H, LP, Dh, A, dot)
        z = z0_ref[0] + dot(h_ref[0], whh_ref[:])
        # ctx is (H, Q, Dh); merging (H, Dh) into the lane dim is an
        # unsupported shape cast, so contract head by head
        for hh in range(H):
            z = z + dot(ctx[hh], cw3_ref[hh])
        h_new, c_new = _lstm_cell_fwd(z, c_ref[0])
        hout_ref[0] = h_new
        cout_ref[0] = c_new
    return kernel


def _make_lstm_bwd_kernel(S, Q, H, LP, Dh, A, R, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, pos_ref, hib_ref, s0v_ref, hvec_ref, z0_ref,
               h_ref, c_ref, cw3_ref, whh_ref, cw_ref, cb_ref, aw_ref,
               ab_ref, gh_ref, gc_ref,
               dvalue_ref, dpos_ref, dhvec_ref, dz0_ref, dh_ref, dc_ref,
               dcw3_ref, dwhh_ref, dcw_ref, dcb_ref, daw_ref, dab_ref):
        b = pl.program_id(0)
        value = value_ref[0]
        h_prev = h_ref[0]                                # (Q, R)

        # recompute the forward entirely in VMEM
        taps4, a, w, ctx, Ms = _fwd_math(value, pos_ref[0], hib_ref[:],
                                         s0v_ref[:], hvec_ref[0], cw_ref,
                                         cb_ref, aw_ref, ab_ref[0, 0],
                                         S, Q, H, LP, Dh, A, dot)
        z = z0_ref[0] + dot(h_prev, whh_ref[:])
        for hh in range(H):
            z = z + dot(ctx[hh], cw3_ref[hh])

        # ---- LSTM cell backward
        dz, dc_prev = _lstm_cell_bwd(z, c_ref[0], gh_ref[0], gc_ref[0])
        dz0_ref[0] = dz
        dc_ref[0] = dc_prev
        dh_ref[0] = dot(dz, whh_ref[:].T)                # (Q, R)

        @pl.when(b == 0)
        def _():
            dcw3_ref[:] = jnp.zeros_like(dcw3_ref)
            dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
            dcw_ref[:] = jnp.zeros_like(dcw_ref)
            dcb_ref[:] = jnp.zeros_like(dcb_ref)
            daw_ref[:] = jnp.zeros_like(daw_ref)
            dab_ref[:] = jnp.zeros_like(dab_ref)
        dwhh_ref[:] += dot(h_prev.T, dz)

        # ---- d ctx via the per-head ctx_w blocks, then d ctx_w itself
        dctx_heads = []
        for hh in range(H):
            dctx_heads.append(dot(dz, cw3_ref[hh].T)[None])      # (1,Q,Dh)
            dcw3_ref[hh] += dot(ctx[hh].T, dz)
        dctx = jnp.concatenate(dctx_heads, axis=0)       # (H, Q, Dh)

        # ---- attention + sampling backward with g = d ctx
        dvalue, dpos, dhvec, dcw, dcb, daw, dab = _attn_bwd_from_g(
            value, taps4, a, w, Ms, cw_ref, aw_ref, dctx,
            Q, H, LP, Dh, A, dot)
        dvalue_ref[0] = dvalue
        dpos_ref[0] = dpos
        dhvec_ref[0] = dhvec
        dcw_ref[:] += dcw
        dcb_ref[:] += dcb
        daw_ref[:] += daw
        dab_ref[:] += dab[None, None]
    return kernel


def _pallas_lstm_core(value_t, pos, hvec, z0, h, c, ctx_w3, w_hh,
                      cw, cb, aw, ab, temporal_shapes, Q, interpret,
                      precision='float32', backward=False, g=None):
    B, H, S, Dh = value_t.shape
    N = pos.shape[-1]
    LP = N // Q
    A = hvec.shape[-1]
    R = h.shape[-1]
    f32 = jnp.float32
    hib_np, s0v_np = _bounds_np(temporal_shapes, Q, LP // len(temporal_shapes))
    args = (value_t.astype(f32), pos.astype(f32),
            jnp.asarray(hib_np)[None, :], jnp.asarray(s0v_np)[None, :],
            hvec.astype(f32),
            z0.astype(f32), h.astype(f32), c.astype(f32),
            ctx_w3.astype(f32), w_hh.astype(f32),
            cw.astype(f32), cb.astype(f32)[None, :], aw.astype(f32)[None, :],
            jnp.asarray(ab, f32).reshape(1, 1))
    in_specs = [
        pl.BlockSpec((1, H, S, Dh), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, N), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, A), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, 4 * R), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, Dh, 4 * R), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 4 * R), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Dh, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]
    if not backward:
        h_new, c_new = pl.pallas_call(
            _make_lstm_fwd_kernel(S, Q, H, LP, Dh, A, R, precision),
            grid=(B,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((B, Q, R), f32),
                       jax.ShapeDtypeStruct((B, Q, R), f32)],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*args)
        return h_new.astype(h.dtype), c_new.astype(c.dtype)

    gh, gc = g
    outs = pl.pallas_call(
        _make_lstm_bwd_kernel(S, Q, H, LP, Dh, A, R, precision),
        grid=(B,),
        in_specs=in_specs + [
            pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, H, S, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, 4 * R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Dh, 4 * R), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 4 * R), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, A), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, Dh), f32),
            jax.ShapeDtypeStruct((B, H, N), f32),
            jax.ShapeDtypeStruct((B, Q, A), f32),
            jax.ShapeDtypeStruct((B, Q, 4 * R), f32),
            jax.ShapeDtypeStruct((B, Q, R), f32),
            jax.ShapeDtypeStruct((B, Q, R), f32),
            jax.ShapeDtypeStruct((H, Dh, 4 * R), f32),
            jax.ShapeDtypeStruct((R, 4 * R), f32),
            jax.ShapeDtypeStruct((Dh, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*args, gh.astype(f32), gc.astype(f32))
    (dv, dpos, dhvec, dz0, dh, dc, dcw3, dwhh, dcw, dcb, daw, dab) = outs
    return (dv.astype(value_t.dtype), dpos.astype(pos.dtype),
            dhvec.astype(hvec.dtype), dz0.astype(z0.dtype),
            dh.astype(h.dtype), dc.astype(c.dtype),
            dcw3.astype(ctx_w3.dtype), dwhh.astype(w_hh.dtype),
            dcw.astype(cw.dtype), dcb[0].astype(cb.dtype),
            daw[0].astype(aw.dtype), dab[0, 0].astype(jnp.asarray(ab).dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _dsa_lstm_core(value_t, pos, hvec, z0, h, c, ctx_w3, w_hh, cw, cb, aw,
                   ab, temporal_shapes, Q, interpret, precision):
    return _pallas_lstm_core(value_t, pos, hvec, z0, h, c, ctx_w3, w_hh,
                             cw, cb, aw, ab, temporal_shapes, Q, interpret,
                             precision)


def _dsa_lstm_core_fwd(value_t, pos, hvec, z0, h, c, ctx_w3, w_hh, cw, cb,
                       aw, ab, temporal_shapes, Q, interpret, precision):
    out = _pallas_lstm_core(value_t, pos, hvec, z0, h, c, ctx_w3, w_hh,
                            cw, cb, aw, ab, temporal_shapes, Q, interpret,
                            precision)
    return out, (value_t, pos, hvec, z0, h, c, ctx_w3, w_hh, cw, cb, aw, ab)


def _dsa_lstm_core_bwd(temporal_shapes, Q, interpret, precision, res, g):
    return _pallas_lstm_core(*res, temporal_shapes, Q, interpret, precision,
                             backward=True, g=g)


_dsa_lstm_core.defvjp(_dsa_lstm_core_fwd, _dsa_lstm_core_bwd)


def dsa_lstm_step(value, offsets, ref_center, offset_scale, hvec, z0, h, c,
                  ctx_w, w_hh, ctx2att_w, ctx2att_b, alpha_w, alpha_b,
                  temporal_shapes, impl='auto', precision='float32'):
    """Fused DSA word step: tap sampling + additive attention + LSTM cell.

    See ``dsa_lstm_step_ref`` for shapes.  impl/precision as in
    ``dsa_sample_attend``.  Returns (h_new, c_new)."""
    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() == 'tpu' else 'ref'
    if impl == 'ref':
        return dsa_lstm_step_ref(value, offsets, ref_center, offset_scale,
                                 hvec, z0, h, c, ctx_w, w_hh, ctx2att_w,
                                 ctx2att_b, alpha_w, alpha_b, temporal_shapes)
    if impl in ('pallas', 'pallas_interpret'):
        from ..parallel.op_partition import partition_batched
        B, Q, H, L, P = offsets.shape
        Dh = value.shape[-1]
        R = h.shape[-1]
        loc = (ref_center[:, :, None, :, None]
               + offsets * offset_scale[:, :, None, :, None])
        pos = _level_pos(loc, temporal_shapes)           # (B, H, QLP)
        value_t = value.transpose(0, 2, 1, 3)            # (B, H, S, Dh)
        ctx_w3 = ctx_w.reshape(H, Dh, 4 * R)

        def core(v, p, hv, z0_, h_, c_, cw3, whh, cw, cb, aw, ab_):
            return _dsa_lstm_core(v, p, hv, z0_, h_, c_, cw3, whh, cw, cb,
                                  aw, ab_, tuple(temporal_shapes), Q,
                                  impl == 'pallas_interpret', precision)
        return partition_batched(
            core, (value_t, pos, hvec, z0, h, c),
            (ctx_w3, w_hh, ctx2att_w, ctx2att_b, alpha_w,
             jnp.asarray(alpha_b)))
    raise ValueError(f'unknown dsa lstm step impl {impl!r}')
