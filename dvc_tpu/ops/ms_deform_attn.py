"""1-D multi-scale deformable attention — the single hot custom op of PDVC.

The reference implements temporal deformable attention by faking a 2-D
problem (constant y=0.5 rows appended; see reference
``pdvc/ops/modules/ms_deform_attn.py:114-117``) so the unmodified 2-D
Deformable-DETR CUDA kernel (``pdvc/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-300``)
performs 1-D linear interpolation along time.  Here we implement the 1-D op
natively, three ways:

* ``ms_deform_attn_ref`` — pure-jnp gather/lerp oracle (the analogue of the
  reference's ``ms_deform_attn_core_pytorch``, ``pdvc/ops/functions/ms_deform_attn_func.py:41-68``).
* ``ms_deform_attn_dense`` — one-hot interpolation-matrix formulation: the
  scattered lerp coefficients form a dense (Q, S) matrix which is contracted
  against the value tensor on the MXU.  XLA fuses the coefficient build into
  the matmul; this is the fast path the Pallas kernel also uses.
* ``ms_deform_attn_pallas`` — Pallas TPU kernel of the dense formulation with
  a custom VJP (backward = VJP of the jnp oracle, guaranteeing consistency).

Boundary semantics
------------------
Sampling position for a normalized location ``loc`` in [0, 1] at a level of
length ``T`` is ``p = loc * T - 0.5`` and the sample is the linear
interpolation of ``value[floor(p)]`` and ``value[floor(p)+1]``:

* ``mode='zeros'`` — out-of-range taps contribute 0 (the CUDA kernel's
  semantics, ``ms_deform_im2col_cuda.cuh:286-295``).  Used by the encoder /
  decoder attention: released checkpoints were trained with this on GPU.
* ``mode='border'`` — taps clamp to the edge (the PyTorch
  ``F.grid_sample(padding_mode='border')`` fallback semantics,
  ``ms_deform_attn_func.py:58-59``).  Used by the caption head's
  ``return_value`` sampling path (``ms_deform_attn_for_caption.py:120-123``),
  which always runs the PyTorch implementation in the reference.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_starts(temporal_shapes: Sequence[int]) -> list[int]:
    starts, acc = [], 0
    for t in temporal_shapes:
        starts.append(acc)
        acc += int(t)
    return starts


def _bounds_table_np(temporal_shapes, Q, P):
    """Per-(q, l, p) tables (Q, L, P): level-relative clamp bound (T_l - 1,
    f32) and integer level start (i32) — static functions of the level
    table, baked at trace time.  Shared by the fused MSDA backward and the
    DSA caption-step kernels so their boundary semantics cannot diverge.
    Positions stay level-relative in f32 (floor/lerp exactly as the
    per-level formulation — adding the start before floor would cost ulps
    at large S); the start shifts the *integer* index only."""
    starts = _level_starts(temporal_shapes)
    L = len(temporal_shapes)
    hib = np.zeros((Q, L, P), np.float32)
    s0v = np.zeros((Q, L, P), np.int32)
    for l, (T, s0) in enumerate(zip(temporal_shapes, starts)):
        hib[:, l, :] = T - 1
        s0v[:, l, :] = s0
    return hib, s0v


def _lerp_onehot_pair(pos, hib, s0v, S):
    """Shared lerp/one-hot construction for the level-merged sampling
    layout (in-kernel).  pos: (..., N) level-relative continuous
    positions; hib/s0v broadcastable against pos (clamp bound T_l - 1 and
    integer level start from :func:`_bounds_table_np`).

    Returns ``(i_lo, w_lo, w_hi, M_lo, M_hi)``: floor tap, lerp weights,
    and the (..., N, S) one-hot pair over the flattened level axis, with
    out-of-range taps clamped to the level border (callers apply
    zeros-mode masking from ``i_lo`` when needed)."""
    i_lo = jnp.floor(pos)
    w_hi = pos - i_lo
    w_lo = 1.0 - w_hi
    idx_lo = jnp.clip(i_lo, 0.0, hib).astype(jnp.int32) + s0v
    idx_hi = jnp.clip(i_lo + 1.0, 0.0, hib).astype(jnp.int32) + s0v
    iota = jax.lax.broadcasted_iota(jnp.int32, pos.shape + (S,), pos.ndim)
    M_lo = (idx_lo[..., None] == iota).astype(jnp.float32)
    M_hi = (idx_hi[..., None] == iota).astype(jnp.float32)
    return i_lo, w_lo, w_hi, M_lo, M_hi


def _tap_indices_weights(loc, T, mode):
    """Linear-interp taps for normalized locations at a level of length T.

    loc: (...,) in [0, 1] (may exceed — offsets are unbounded).
    Returns (idx_lo, idx_hi, w_lo, w_hi) where idx_* are clamped in-range and
    w_* are zeroed for out-of-range taps under ``mode='zeros'``.
    """
    pos = loc * T - 0.5
    i_lo = jnp.floor(pos)
    w_hi = pos - i_lo
    w_lo = 1.0 - w_hi
    i_hi = i_lo + 1.0
    if mode == "zeros":
        ok_lo = (i_lo >= 0) & (i_lo <= T - 1)
        ok_hi = (i_hi >= 0) & (i_hi <= T - 1)
        w_lo = jnp.where(ok_lo, w_lo, 0.0)
        w_hi = jnp.where(ok_hi, w_hi, 0.0)
    elif mode == "border":
        pass  # clamped index below realizes border padding
    else:
        raise ValueError(f"unknown boundary mode: {mode}")
    idx_lo = jnp.clip(i_lo, 0, T - 1).astype(jnp.int32)
    idx_hi = jnp.clip(i_hi, 0, T - 1).astype(jnp.int32)
    return idx_lo, idx_hi, w_lo, w_hi


def ms_deform_attn_ref(value, temporal_shapes, sampling_locations,
                       attention_weights, mode="zeros"):
    """Gather/lerp oracle.

    value:               (B, S, H, D) with S = sum(temporal_shapes)
    temporal_shapes:     static python sequence of per-level lengths
    sampling_locations:  (B, Q, H, L, P) in [0, 1] per level
    attention_weights:   (B, Q, H, L, P), softmax-normalized over (L, P)
    returns:             (B, Q, H * D)
    """
    B, S, H, D = value.shape
    _, Q, _, L, P = sampling_locations.shape
    starts = _level_starts(temporal_shapes)
    out = jnp.zeros((B, Q, H, D), value.dtype)
    for l, (T, s0) in enumerate(zip(temporal_shapes, starts)):
        v_l = jax.lax.slice_in_dim(value, s0, s0 + T, axis=1)  # (B, T, H, D)
        loc = sampling_locations[:, :, :, l, :]                # (B, Q, H, P)
        idx_lo, idx_hi, w_lo, w_hi = _tap_indices_weights(loc, T, mode)
        a = attention_weights[:, :, :, l, :]                   # (B, Q, H, P)

        def gather(idx):  # idx: (B, Q, H, P) -> (B, Q, H, P, D)
            idx_f = idx.transpose(0, 1, 3, 2).reshape(B, Q * P, H)
            g = jnp.take_along_axis(v_l, idx_f[..., None], axis=1)
            return g.reshape(B, Q, P, H, D).transpose(0, 1, 3, 2, 4)

        samp = (gather(idx_lo) * w_lo[..., None]
                + gather(idx_hi) * w_hi[..., None])             # (B,Q,H,P,D)
        out = out + jnp.sum(samp * a[..., None], axis=3)
    return out.reshape(B, Q, H * D)


def _sample_values_gather(value, temporal_shapes, sampling_locations, mode):
    B, S, H, D = value.shape
    _, Q, _, L, P = sampling_locations.shape
    starts = _level_starts(temporal_shapes)
    samples = []
    for l, (T, s0) in enumerate(zip(temporal_shapes, starts)):
        v_l = jax.lax.slice_in_dim(value, s0, s0 + T, axis=1)
        loc = sampling_locations[:, :, :, l, :]
        idx_lo, idx_hi, w_lo, w_hi = _tap_indices_weights(loc, T, mode)

        def gather(idx):
            idx_f = idx.transpose(0, 1, 3, 2).reshape(B, Q * P, H)
            g = jnp.take_along_axis(v_l, idx_f[..., None], axis=1)
            return g.reshape(B, Q, P, H, D).transpose(0, 1, 3, 2, 4)

        samples.append(gather(idx_lo) * w_lo[..., None]
                       + gather(idx_hi) * w_hi[..., None])
    return jnp.stack(samples, axis=3)  # (B, Q, H, L, P, D)


def _sample_values_dense(value, temporal_shapes, sampling_locations, mode):
    """One-hot matmul formulation of the tap sampling (for its VJP)."""
    B, S, H, D = value.shape
    _, Q, _, L, P = sampling_locations.shape
    starts = _level_starts(temporal_shapes)
    samples = []
    for l, (T, s0) in enumerate(zip(temporal_shapes, starts)):
        v_l = jax.lax.slice_in_dim(value, s0, s0 + T, axis=1)
        loc = sampling_locations[:, :, :, l, :]
        idx_lo, idx_hi, w_lo, w_hi = _tap_indices_weights(loc, T, mode)
        iota = jnp.arange(T, dtype=jnp.int32)
        W = (w_lo[..., None] * (idx_lo[..., None] == iota)
             + w_hi[..., None] * (idx_hi[..., None] == iota))  # (B,Q,H,P,T)
        samples.append(jnp.einsum('bqhpt,bthd->bqhpd',
                                  W.astype(value.dtype), v_l,
                                  preferred_element_type=jnp.float32
                                  ).astype(value.dtype))
    return jnp.stack(samples, axis=3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def ms_deform_attn_sample_values(value, temporal_shapes, sampling_locations,
                                 mode="border"):
    """``return_value=True`` path of the caption head's deformable attention.

    Returns the raw sampled taps, shaped (B, Q, H, L, P, D) — no attention
    reduction (reference ``ms_deform_attn_func.py:64-65`` stacked per level).
    Border padding matches the grid_sample fallback the reference always uses
    for this path.  Forward is gather-based; backward goes through the
    one-hot matmul formulation (MXU instead of TPU scatters) — this op runs
    inside the caption word scan, so its backward is on the hot path.
    """
    return _sample_values_gather(value, temporal_shapes,
                                 sampling_locations, mode)


def _sample_values_fwd(value, temporal_shapes, sampling_locations, mode):
    out = _sample_values_gather(value, temporal_shapes, sampling_locations,
                                mode)
    return out, (value, sampling_locations)


def _sample_values_bwd(temporal_shapes, mode, residuals, g):
    value, sampling_locations = residuals
    _, vjp = jax.vjp(
        lambda v, s: _sample_values_dense(v, temporal_shapes, s, mode),
        value, sampling_locations)
    return vjp(g.astype(value.dtype))


ms_deform_attn_sample_values.defvjp(_sample_values_fwd, _sample_values_bwd)


def _interp_matrix(temporal_shapes, sampling_locations, attention_weights,
                   mode, S, dtype):
    """Dense interpolation-weight matrix W: out = W @ value.

    W[b, q, h, s] = sum over (l, p) taps landing on flat position s of
    attention_weight * lerp_coefficient.  Built per level with one-hot
    comparisons against an iota over the level's positions — pure VPU work
    XLA fuses into the downstream matmul.
    Returns (B, Q, H, S).
    """
    B, Q, H, L, P = sampling_locations.shape
    starts = _level_starts(temporal_shapes)
    w_parts = []
    for l, (T, s0) in enumerate(zip(temporal_shapes, starts)):
        loc = sampling_locations[:, :, :, l, :]
        idx_lo, idx_hi, w_lo, w_hi = _tap_indices_weights(loc, T, mode)
        a = attention_weights[:, :, :, l, :]
        iota = jnp.arange(T, dtype=jnp.int32)
        onehot_lo = (idx_lo[..., None] == iota).astype(dtype)  # (B,Q,H,P,T)
        onehot_hi = (idx_hi[..., None] == iota).astype(dtype)
        w_l = jnp.einsum("bqhp,bqhpt->bqht", (a * w_lo).astype(dtype), onehot_lo)
        w_l = w_l + jnp.einsum("bqhp,bqhpt->bqht", (a * w_hi).astype(dtype), onehot_hi)
        w_parts.append(w_l)
    return jnp.concatenate(w_parts, axis=-1)  # (B, Q, H, S)


def ms_deform_attn_dense(value, temporal_shapes, sampling_locations,
                         attention_weights, mode="zeros"):
    """One-hot interpolation-matrix formulation (MXU-friendly, pure XLA)."""
    B, S, H, D = value.shape
    W = _interp_matrix(temporal_shapes, sampling_locations, attention_weights,
                       mode, S, value.dtype)
    out = jnp.einsum("bqhs,bshd->bqhd", W, value,
                     preferred_element_type=jnp.float32)
    return out.astype(value.dtype).reshape(B, -1, H * D)


# ----------------------------------------------------------------------------
# Pallas TPU kernel
# ----------------------------------------------------------------------------

def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _msda_kernel(loc_ref, attn_ref, value_ref, out_ref, w_scratch, *,
                 temporal_shapes, n_points, mode):
    """Per-(batch, head) grid cell: build W (Q, S) then out = W @ value.

    loc_ref/attn_ref: (Q, L*P) for this (b, h); value_ref: (S, D); out (Q, D).
    The (Q, S) coefficient matrix is accumulated level-by-level, tap-by-tap
    with one-hot comparisons on the VPU, then a single MXU matmul contracts
    it with the value level.  S is padded to lanes by the wrapper; padded
    positions never match a clamped index < T so their coefficients are 0.
    """
    Q, S_pad = w_scratch.shape
    w_scratch[:] = jnp.zeros_like(w_scratch)
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, S_pad), 1)
    starts = _level_starts(temporal_shapes)
    for l, (T, s0) in enumerate(zip(temporal_shapes, starts)):
        for p in range(n_points):
            k = l * n_points + p
            loc = loc_ref[0, 0, :, k]      # (Q,)
            a = attn_ref[0, 0, :, k]       # (Q,)
            pos = loc * T - 0.5
            i_lo = jnp.floor(pos)
            w_hi = pos - i_lo
            w_lo = 1.0 - w_hi
            i_hi = i_lo + 1.0
            if mode == "zeros":
                w_lo = jnp.where((i_lo >= 0) & (i_lo <= T - 1), w_lo, 0.0)
                w_hi = jnp.where((i_hi >= 0) & (i_hi <= T - 1), w_hi, 0.0)
            idx_lo = s0 + jnp.clip(i_lo, 0, T - 1).astype(jnp.int32)
            idx_hi = s0 + jnp.clip(i_hi, 0, T - 1).astype(jnp.int32)
            c_lo = (a * w_lo)[:, None]
            c_hi = (a * w_hi)[:, None]
            w_scratch[:] = (w_scratch[:]
                            + jnp.where(col == idx_lo[:, None], c_lo, 0.0)
                            + jnp.where(col == idx_hi[:, None], c_hi, 0.0))
    out_ref[0, 0] = jnp.dot(w_scratch[:], value_ref[0, 0],
                            preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def _msda_ls_kernel(loc_ref, attn_ref, value_ref, out_ref, *,
                    temporal_shapes, padded_shapes, n_points, mode):
    """Level-sliced W build (per-(b, h) grid cell).

    The flat-W kernel (``_msda_kernel``) compares every tap's index against
    ALL S_pad columns — 16 taps x S_pad lanes of compare/select/add per
    query row, which the device profile (tools/profile_step.py) showed is
    the dominant cost of the trunk forward (~0.92 ms per encoder layer at
    T=200 shapes).  A tap at level l can only land inside level l's columns,
    so here the coefficient matrix is built and contracted PER LEVEL: the
    compare domain shrinks from n_levels*P*S_pad to P*sum(Tpad_l) lane
    columns (~2.4x less VPU work at T=200), at the cost of one (Q, Tpad_l)
    @ (Tpad_l, D) MXU matmul per level instead of one (Q, S_pad) @
    (S_pad, D).  Value arrives level-padded ((B, H, sum(Tpad_l), D), each
    level 128-lane aligned) and D stays the natural head dim (no 128 pad).
    """
    Q = out_ref.shape[2]
    acc = None
    off = 0
    for l, (T, Tpad) in enumerate(zip(temporal_shapes, padded_shapes)):
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, Tpad), 1)
        w = jnp.zeros((Q, Tpad), jnp.float32)
        for p in range(n_points):
            k = l * n_points + p
            loc = loc_ref[0, 0, :, k]      # (Q,)
            a = attn_ref[0, 0, :, k]       # (Q,)
            pos = loc * T - 0.5
            i_lo = jnp.floor(pos)
            w_hi = pos - i_lo
            w_lo = 1.0 - w_hi
            i_hi = i_lo + 1.0
            if mode == "zeros":
                w_lo = jnp.where((i_lo >= 0) & (i_lo <= T - 1), w_lo, 0.0)
                w_hi = jnp.where((i_hi >= 0) & (i_hi <= T - 1), w_hi, 0.0)
            # level-relative indices: padded columns (>= T) never match
            idx_lo = jnp.clip(i_lo, 0, T - 1).astype(jnp.int32)
            idx_hi = jnp.clip(i_hi, 0, T - 1).astype(jnp.int32)
            w = (w + jnp.where(col == idx_lo[:, None], (a * w_lo)[:, None], 0.0)
                   + jnp.where(col == idx_hi[:, None], (a * w_hi)[:, None], 0.0))
        part = jnp.dot(w, value_ref[0, 0, off:off + Tpad, :],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
        off += Tpad
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _msda_pallas_ls_fwd_impl(value, temporal_shapes, sampling_locations,
                             attention_weights, mode, interpret):
    B, S, H, D = value.shape
    _, Q, _, L, P = sampling_locations.shape
    Q_pad = _round_up(Q, 8)
    padded_shapes = tuple(_round_up(int(t), 128) for t in temporal_shapes)
    S_ls = sum(padded_shapes)

    f32 = jnp.float32
    loc = sampling_locations.astype(f32).reshape(B, Q, H, L * P)
    loc = jnp.moveaxis(loc, 2, 1)    # (B, H, Q, L*P)
    attn = attention_weights.astype(f32).reshape(B, Q, H, L * P)
    attn = jnp.moveaxis(attn, 2, 1)
    loc = jnp.pad(loc, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
    attn = jnp.pad(attn, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
    # level-padded flat value, head-major: (B, H, S_ls, D), D unpadded
    starts = _level_starts(temporal_shapes)
    parts = []
    for (T, Tpad, s0) in zip(temporal_shapes, padded_shapes, starts):
        v_l = jax.lax.slice_in_dim(value, s0, s0 + int(T), axis=1)
        parts.append(jnp.pad(v_l.astype(f32),
                             ((0, 0), (0, Tpad - int(T)), (0, 0), (0, 0))))
    val = jnp.moveaxis(jnp.concatenate(parts, axis=1), 2, 1)  # (B,H,S_ls,D)

    kernel = functools.partial(_msda_ls_kernel,
                               temporal_shapes=tuple(int(t) for t in temporal_shapes),
                               padded_shapes=padded_shapes,
                               n_points=P, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Q_pad, L * P), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Q_pad, L * P), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_ls, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Q_pad, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Q_pad, D), f32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Q_pad * S_ls * D,
            bytes_accessed=4 * B * H * (Q_pad * L * P * 2 + S_ls * D + Q_pad * D),
            transcendentals=0),
        interpret=interpret,
    )(loc, attn, val)
    out = out[:, :, :Q, :]                       # (B, H, Q, D)
    out = jnp.moveaxis(out, 1, 2).reshape(B, Q, H * D)
    return out.astype(value.dtype)


# DVC_MSDA_FWD=flat selects the original full-S tap-loop kernel; 'level'
# (default) is the level-sliced build above.  Module variable overrides the
# env for tests.
_FWD_IMPL = None


def _fwd_impl():
    impl = _FWD_IMPL or os.environ.get('DVC_MSDA_FWD', 'level')
    if impl not in ('level', 'flat'):
        raise ValueError(f'DVC_MSDA_FWD must be level|flat, got {impl!r}')
    return impl


def _msda_pallas_fwd_impl(value, temporal_shapes, sampling_locations,
                          attention_weights, mode, interpret):
    if _fwd_impl() == 'level':
        return _msda_pallas_ls_fwd_impl(value, temporal_shapes,
                                        sampling_locations,
                                        attention_weights, mode, interpret)
    return _msda_pallas_flat_fwd_impl(value, temporal_shapes,
                                      sampling_locations, attention_weights,
                                      mode, interpret)


def _msda_pallas_flat_fwd_impl(value, temporal_shapes, sampling_locations,
                               attention_weights, mode, interpret):
    B, S, H, D = value.shape
    _, Q, _, L, P = sampling_locations.shape
    S_pad = _round_up(S, 128)
    Q_pad = _round_up(Q, 8)
    D_pad = _round_up(D, 128)

    f32 = jnp.float32
    loc = sampling_locations.astype(f32).reshape(B, Q, H, L * P)
    loc = jnp.moveaxis(loc, 2, 1)    # (B, H, Q, L*P)
    attn = attention_weights.astype(f32).reshape(B, Q, H, L * P)
    attn = jnp.moveaxis(attn, 2, 1)
    val = jnp.moveaxis(value.astype(f32), 2, 1)  # (B, H, S, D)
    loc = jnp.pad(loc, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
    attn = jnp.pad(attn, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
    val = jnp.pad(val, ((0, 0), (0, 0), (0, S_pad - S), (0, D_pad - D)))

    kernel = functools.partial(_msda_kernel, temporal_shapes=tuple(temporal_shapes),
                               n_points=P, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Q_pad, L * P), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Q_pad, L * P), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad, D_pad), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Q_pad, D_pad), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Q_pad, D_pad), f32),
        scratch_shapes=[pltpu.VMEM((Q_pad, S_pad), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Q_pad * S_pad * D_pad,
            bytes_accessed=4 * B * H * (Q_pad * L * P * 2 + S_pad * D_pad + Q_pad * D_pad),
            transcendentals=0),
        interpret=interpret,
    )(loc, attn, val)
    out = out[:, :, :Q, :D]                      # (B, H, Q, D)
    out = jnp.moveaxis(out, 1, 2).reshape(B, Q, H * D)
    return out.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_pallas(value, temporal_shapes, sampling_locations,
                          attention_weights, mode="zeros", interpret=False):
    """Pallas TPU kernel; backward is the VJP of the jnp oracle."""
    return _msda_pallas_fwd_impl(value, temporal_shapes, sampling_locations,
                                 attention_weights, mode, interpret)


def _msda_pallas_fwd(value, temporal_shapes, sampling_locations,
                     attention_weights, mode, interpret):
    out = _msda_pallas_fwd_impl(value, temporal_shapes, sampling_locations,
                                attention_weights, mode, interpret)
    return out, (value, sampling_locations, attention_weights)


# ----------------------------------------------------------------------------
# analytic Pallas backward (level-merged layout)
# ----------------------------------------------------------------------------
#
# The XLA dense-VJP backward materializes per-level (B, Q, H, P, T) one-hot
# intermediates in HBM; the trunk layer ablation (BENCHMARKS.md) put the
# encoder MSDA backward at the top of the train-step profile.  This kernel
# applies the ``ops/dsa_step.py`` treatment to the trunk op: per (b, h) grid
# cell it rebuilds the lerp one-hot pair over the WHOLE flat S axis once
# (positions enter pre-flattened level-relative in (q, l, p) order — the
# integer level start shifts the index only, so lerp weights are
# bit-identical to the per-level formulation) and emits all three gradients
# from VMEM:
#
# Hardware-validated posture (HW_VALIDATION.jsonl stage 'msda_bwd'): at the
# flagship trunk shapes (Q = S ~ 375, 128 (b, h) cells) this kernel LOSES to
# the XLA dense-formulation VJP — 40.9 vs 31.3 ms end-to-end train step —
# because the three per-cell (Q, LP, S) one-hot-sized matrices cost more
# VPU/VMEM traffic than XLA's fused per-level einsum builds, which
# additionally parallelize across (b, h).  Unlike the caption step (tiny
# per-step shapes, launch-bound, 19 sequential launches), the trunk runs
# ONCE per layer at large shapes where XLA's fusion is already good.  The
# default is therefore 'dense'; the kernel stays parity-tested
# (DVC_MSDA_BWD=pallas) for shapes where the balance could flip.
#
#     W       = sum_lp attn * M            (Q, S)   lerp/attn coefficients
#     dvalue  = W^T @ g                    (S, D)   one MXU matmul
#     gv      = g @ value^T                (Q, S)   one MXU matmul
#     dattn   = sum_s M  * gv              (Q, LP)
#     dpos    = attn * sum_s Md * gv       (Q, LP), Md = d tap / d pos
#
# and d loc = d pos * T_l chains outside (pos = loc * T_l - 0.5).
# The backward's per-cell working set (three (Q*L*P, S) one-hot-sized
# matrices) exceeds Mosaic's 16 MB default scoped-vmem budget at encoder
# shapes (Q = S ~ 384); v5e has 128 MB of VMEM — allow 3/4 of it.
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=96 * 1024 * 1024)

# DVC_MSDA_BWD=pallas selects the analytic kernel (read at trace time; the
# module variable overrides the env for tests); 'dense' is the
# hardware-validated default — see the posture note above
_BWD_IMPL = None


def _bwd_impl():
    impl = _BWD_IMPL or os.environ.get('DVC_MSDA_BWD', 'dense')
    if impl not in ('pallas', 'dense'):
        raise ValueError(f'DVC_MSDA_BWD must be pallas|dense, got {impl!r}')
    return impl


def _flat_bounds_np(temporal_shapes, Q, P):
    """(Q, L*P) view of :func:`_bounds_table_np` for the bwd kernel."""
    hib, s0v = _bounds_table_np(temporal_shapes, Q, P)
    L = len(temporal_shapes)
    return hib.reshape(Q, L * P), s0v.reshape(Q, L * P)


def _msda_bwd_kernel(value_ref, pos_ref, attn_ref, hib_ref, s0v_ref, g_ref,
                     dvalue_ref, dpos_ref, dattn_ref, *, Q, LP, S, mode):
    """Per-(b, h) cell.  value (S, D); pos/attn/hib/s0v (Q, LP) with pos
    level-relative; g (Q, D).  All tap tensors stay in (Q, LP[, S]) layout —
    Mosaic requires the trailing two block dims be 8/128-aligned or cover
    the array, which (Q_pad, LP) satisfies and a flat (N,) does not."""
    pos = pos_ref[0, 0]                                  # (Q, LP)
    hib = hib_ref[:]
    s0v = s0v_ref[:]
    attn = attn_ref[0, 0]                                # (Q, LP)
    value = value_ref[0, 0]                              # (S, D)
    g = g_ref[0, 0]                                      # (Q, D)

    i_lo, w_lo, w_hi, M_lo, M_hi = _lerp_onehot_pair(pos, hib, s0v, S)
    if mode == "zeros":
        # masked weights: out-of-range taps contribute 0 and their lerp
        # weight's pos-derivative is 0 (matches autodiff of the dense form)
        ok_lo = ((i_lo >= 0.0) & (i_lo <= hib)).astype(jnp.float32)
        ok_hi = ((i_lo + 1.0 >= 0.0) & (i_lo + 1.0 <= hib)).astype(jnp.float32)
        M = ((w_lo * ok_lo)[..., None] * M_lo
             + (w_hi * ok_hi)[..., None] * M_hi)         # (Q, LP, S)
        Md = ok_hi[..., None] * M_hi - ok_lo[..., None] * M_lo
    else:  # border: clamped indices collapse the edge difference to 0
        M = w_lo[..., None] * M_lo + w_hi[..., None] * M_hi
        Md = M_hi - M_lo

    W = jnp.sum(attn[..., None] * M, axis=1)             # (Q, S)
    dvalue_ref[0, 0] = jnp.dot(W.T, g, preferred_element_type=jnp.float32)
    gv = jnp.dot(g, value.T, preferred_element_type=jnp.float32)  # (Q, S)
    gv3 = gv[:, None, :]
    dattn_ref[0, 0] = jnp.sum(M * gv3, axis=-1)
    dpos_ref[0, 0] = attn * jnp.sum(Md * gv3, axis=-1)


def _msda_pallas_bwd_impl(value, temporal_shapes, sampling_locations,
                          attention_weights, mode, interpret, g):
    """Analytic gradients (dvalue, dloc, dattn) via one Pallas launch."""
    B, S, H, D = value.shape
    _, Q, _, L, P = sampling_locations.shape
    S_pad = _round_up(S, 128)
    Q_pad = _round_up(Q, 8)
    D_pad = _round_up(D, 128)
    LP = L * P
    f32 = jnp.float32

    t_vec = jnp.asarray(temporal_shapes, f32)
    loc = sampling_locations.astype(f32)
    loc = jnp.pad(loc, ((0, 0), (0, Q_pad - Q), (0, 0), (0, 0), (0, 0)))
    # level-relative positions, head-major, (q, l, p) order kept as (Q, LP)
    pos = loc * t_vec[None, None, None, :, None] - 0.5
    pos = pos.transpose(0, 2, 1, 3, 4).reshape(B, H, Q_pad, LP)
    attn = attention_weights.astype(f32)
    attn = jnp.pad(attn, ((0, 0), (0, Q_pad - Q), (0, 0), (0, 0), (0, 0)))
    attn_t = attn.transpose(0, 2, 1, 3, 4).reshape(B, H, Q_pad, LP)
    val_t = jnp.moveaxis(value.astype(f32), 2, 1)        # (B, H, S, D)
    val_t = jnp.pad(val_t, ((0, 0), (0, 0), (0, S_pad - S), (0, D_pad - D)))
    g_t = g.astype(f32).reshape(B, Q, H, D).transpose(0, 2, 1, 3)
    g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, Q_pad - Q), (0, D_pad - D)))
    hib_np, s0v_np = _flat_bounds_np(temporal_shapes, Q_pad, P)

    kernel = functools.partial(_msda_bwd_kernel, Q=Q_pad, LP=LP,
                               S=S_pad, mode=mode)
    qlp_spec = pl.BlockSpec((1, 1, Q_pad, LP), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    dval, dpos, dattn = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, S_pad, D_pad), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            qlp_spec,
            qlp_spec,
            pl.BlockSpec((Q_pad, LP), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_pad, LP), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Q_pad, D_pad), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S_pad, D_pad), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            qlp_spec,
            qlp_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S_pad, D_pad), f32),
            jax.ShapeDtypeStruct((B, H, Q_pad, LP), f32),
            jax.ShapeDtypeStruct((B, H, Q_pad, LP), f32),
        ],
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(val_t, pos, attn_t, jnp.asarray(hib_np), jnp.asarray(s0v_np), g_t)

    dvalue = jnp.moveaxis(dval[:, :, :S, :D], 1, 2)      # (B, S, H, D)
    dpos = dpos.reshape(B, H, Q_pad, L, P)[:, :, :Q]
    # chain pos = loc * T_l - 0.5  ->  dloc = dpos * T_l
    dloc = (dpos * t_vec[None, None, None, :, None]).transpose(0, 2, 1, 3, 4)
    dattn = (dattn.reshape(B, H, Q_pad, L, P)[:, :, :Q]
             .transpose(0, 2, 1, 3, 4))
    return (dvalue.astype(value.dtype),
            dloc.astype(sampling_locations.dtype),
            dattn.astype(attention_weights.dtype))


def _msda_pallas_bwd(temporal_shapes, mode, interpret, residuals, g):
    value, sampling_locations, attention_weights = residuals
    if _bwd_impl() == 'pallas':
        return _msda_pallas_bwd_impl(value, temporal_shapes,
                                     sampling_locations, attention_weights,
                                     mode, interpret, g)
    # dense fallback: backward through the one-hot matmul formulation — its
    # VJP is matmuls on the MXU, whereas the gather oracle's VJP lowers to
    # TPU scatters (slow). The two are mathematically identical.
    _, vjp = jax.vjp(
        lambda v, s, a: ms_deform_attn_dense(v, temporal_shapes, s, a,
                                             mode=mode),
        value, sampling_locations, attention_weights)
    return vjp(g.astype(value.dtype))


ms_deform_attn_pallas.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)


def ms_deform_attn(value, temporal_shapes, sampling_locations,
                   attention_weights, mode="zeros", impl="auto"):
    """Dispatching entry point.

    impl: 'auto' (pallas on TPU, dense elsewhere), 'ref', 'dense', 'pallas',
    or 'pallas_interpret' (for CPU tests of the kernel itself).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "dense"
    if impl == "ref":
        return ms_deform_attn_ref(value, temporal_shapes, sampling_locations,
                                  attention_weights, mode)
    if impl == "dense":
        return ms_deform_attn_dense(value, temporal_shapes, sampling_locations,
                                    attention_weights, mode)
    if impl in ("pallas", "pallas_interpret"):
        from ..parallel.op_partition import partition_batched
        interpret = impl == "pallas_interpret"

        def core(v, s, a):
            return ms_deform_attn_pallas(v, tuple(temporal_shapes), s, a,
                                         mode, interpret)
        return partition_batched(
            core, (value, sampling_locations, attention_weights))
    raise ValueError(f"unknown impl: {impl}")


def _sample_values_gather_mode(value, temporal_shapes, sampling_locations,
                               mode="border"):
    """Plain-autodiff gather variant (A/B testing of the custom VJP)."""
    return _sample_values_gather(value, temporal_shapes, sampling_locations,
                                 mode)
