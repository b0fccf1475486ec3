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
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_starts(temporal_shapes: Sequence[int]) -> list[int]:
    starts, acc = [], 0
    for t in temporal_shapes:
        starts.append(acc)
        acc += int(t)
    return starts


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


def _msda_pallas_fwd_impl(value, temporal_shapes, sampling_locations,
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


def _msda_pallas_bwd(temporal_shapes, mode, interpret, residuals, g):
    # backward through the dense (one-hot matmul) formulation: its VJP is
    # matmuls on the MXU, whereas the gather oracle's VJP lowers to TPU
    # scatters (slow). The two are mathematically identical.
    value, sampling_locations, attention_weights = residuals
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
