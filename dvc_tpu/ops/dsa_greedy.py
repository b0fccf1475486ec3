"""Cross-step fused GREEDY decode: the whole eval-time caption loop in
one Pallas launch.

The eval step's dominant slice is the greedy word loop of the LSTM-DSA
caption head (reference ``LSTM_DSA.py:118-186`` / ``LSTM.py:94-139``):
per word step, deformable tap sampling + additive attention
(``ops/dsa_step.py``), the LSTM cell, the vocab projection, an argmax,
and the winner's embedding fed back as the next input.  The stepwise
``lax.scan`` costs ~0.6 ms per step at flagship shapes (~12 ms of the
23.8 ms eval step) — latency-bound on the serial dependency, 3% MXU.

This op runs all K steps inside ONE ``pallas_call``:

* grid = (B, K) with the word step k as the MINOR grid dimension (TPU
  grid iteration is sequential, so k is a scan); the LSTM state (h, c)
  AND the fed-back token (kept as its one-hot row, which the next
  step's embedding matmul needs anyway) live in VMEM scratch;
* ``value`` and every weight table — including the (V+1, E) token
  embedding, its (E, 4R) LSTM input-weight slice and the (R, V+1)
  vocab projection — are blocked per b (or grid-constant), so Mosaic
  keeps them VMEM-resident across all K steps: one HBM read per video
  instead of K;
* the per-step argmax is computed with the iota-min trick
  (first-max-index, exactly ``jnp.argmax`` semantics) and the winner's
  logprob as ``max - logsumexp`` — the full (Q, V+1) log-softmax is
  never materialized, matching the stepwise path's restructure
  (``caption_heads._greedy_sample``).

Forward-only (no VJP): greedy decode is an eval/serving path.

Sampling/boundary semantics are single-sourced from
``ms_deform_attn._lerp_onehot_pair`` / ``_flat_bounds_np`` and the
step math from ``dsa_scan.scan_fwd_math`` — the same helpers the
teacher-forcing scan kernel uses, so the formulations cannot diverge.

EOS/finished masking (tokens zeroed once a query emits EOS=0,
reference ``LSTM.py:132-136``) is cheap (K, N) integer work applied
OUTSIDE the kernel by the caller — the kernel emits the raw per-step
argmax stream, which is what the feedback path needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dsa_step import _COMPILER_PARAMS, _lstm_cell_fwd, _make_dot
from .dsa_scan import scan_fwd_math
from .ms_deform_attn import _flat_bounds_np, _lerp_onehot_pair, _round_up

# padded vocab columns get this bias so they can never win the argmax
# and contribute exactly 0 to the logsumexp (exp(-1e30 - m) == 0 in f32)
_NEG_INF = -1e30


# ----------------------------------------------------------------------------
# jnp reference (oracle; CPU path)
# ----------------------------------------------------------------------------

def dsa_greedy_scan_ref(value_t, base_pos, scale_t, const_z, embed,
                        token_w, logit_w, logit_b, off_w_h, h2att_w,
                        h2att_b, cw, cb, aw, ab, ctx_w3, w_hh,
                        temporal_shapes, K):
    """Oracle composition of the K-step greedy loop.

    value_t: (B, H, S, Dh) head-major projected memory;
    base_pos: (B, H, Q, LP) level-relative base positions;
    scale_t: (B, Q, LP); const_z: (B, Q, 4R) per-query constant LSTM
    preactivation (event-query share); embed: (V+1, E) token embedding
    table; token_w: (E, 4R) its LSTM input-weight slice (factored, NOT
    pre-multiplied: the in-kernel gather is (Q,Vp)@(Vp,E) then
    (Q,E)@(E,4R) — half the FLOPs and a third the VMEM of a fused
    (V+1, 4R) table at E = 4R/4); logit_w/(b):
    (R, V+1)/(V+1,); remaining weights as in ``dsa_teacher_scan_ref``.
    Returns (tok, lp): each (B, K, Q) — step t's argmax token (fed to
    step t+1; BOS=0 feeds step 0) and its logprob.
    """
    B, H, S, Dh = value_t.shape
    Q = const_z.shape[1]
    R = w_hh.shape[0]
    LP = scale_t.shape[-1]
    P = LP // len(temporal_shapes)
    hib, s0v = _flat_bounds_np(temporal_shapes, Q, P)     # (Q, LP)
    hib = jnp.asarray(hib)
    s0v = jnp.asarray(s0v)

    def step(carry, _):
        h, c, it = carry                                  # (B,Q,R) x2, (B,Q)
        hvec = h @ h2att_w + h2att_b                      # (B, Q, A)
        off = jnp.einsum('bqr,hrp->bhqp', h, off_w_h)     # (B, H, Q, LP)
        pos = base_pos + off * scale_t[:, None]
        _, w_lo, w_hi, M_lo, M_hi = _lerp_onehot_pair(pos, hib, s0v, S)
        M = w_lo[..., None] * M_lo + w_hi[..., None] * M_hi
        taps = jnp.einsum('bhqps,bhsd->bhqpd', M, value_t)
        u = jnp.tanh(taps @ cw + cb
                     + hvec[:, None, :, None, :])         # (B,H,Q,LP,A)
        d = u @ aw + ab
        wts = jax.nn.softmax(d, axis=-1)                  # (B, H, Q, LP)
        ctx = jnp.einsum('bhqp,bhqpd->bhqd', wts, taps)   # (B, H, Q, Dh)
        z = (const_z + jnp.take(embed, it, axis=0) @ token_w + h @ w_hh
             + jnp.einsum('bhqd,hdr->bqr', ctx, ctx_w3))
        h_new, c_new = _lstm_cell_fwd(z, c)
        logits = h_new @ logit_w + logit_b                # (B, Q, V+1)
        m = jnp.max(logits, axis=-1)
        nit = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))
        return (h_new, c_new, nit), (nit, m - lse)

    h0 = jnp.zeros((B, Q, R), jnp.float32)
    it0 = jnp.zeros((B, Q), jnp.int32)                    # BOS
    _, (tok, lp) = jax.lax.scan(step, (h0, h0, it0), None, length=K)
    return jnp.moveaxis(tok, 0, 1), jnp.moveaxis(lp, 0, 1)


def greedy_mask_outputs(tok, lp):
    """(B, K, Q) raw argmax stream -> (B, K, Q) masked seq + lps with the
    stepwise loop's emit semantics (``caption_heads._greedy_sample``):
    output step t emits the token chosen at step t-1 masked by "no EOS
    seen up to and including it", and that token's logprob unmasked."""
    prev = tok                                            # it_t == tok[t-1]
    unfinished = jnp.cumprod((prev > 0).astype(jnp.int32), axis=1)
    return prev * unfinished, lp


# ----------------------------------------------------------------------------
# forward kernel: grid (B, K), k minor (sequential greedy scan)
# ----------------------------------------------------------------------------

def _make_greedy_kernel(S, Q, H, LP, Dh, A, R, Vp, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, base_ref, scale_ref, hib_ref, s0v_ref, cz_ref,
               emb_ref, tw_ref, lw_ref, lb_ref, offw_ref, h2w_ref,
               h2b_ref, cw_ref, cb_ref, aw_ref, ab_ref, cw3_ref, whh_ref,
               tok_ref, lp_ref, h_scr, c_scr, oh_scr):
        k = pl.program_id(1)
        # Mosaic iota is integer-only; cast for the f32 min/compare ops
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (Q, Vp), 1).astype(
            jnp.float32)
        # branchless carry init (see dsa_scan note: conditional stores
        # give the scratch a replicated layout that real Mosaic rejects;
        # select on the READ instead).  BOS = token 0 -> its one-hot.
        h = jnp.where(k == 0, 0.0, h_scr[:])              # (Q, R)
        c_prev = jnp.where(k == 0, 0.0, c_scr[:])
        onehot = jnp.where(k == 0,
                           (iota_v == 0.0).astype(jnp.float32),
                           oh_scr[:])                     # (Q, Vp)
        *_, ctx = scan_fwd_math(
            h, value_ref[0], base_ref[0], scale_ref[0], hib_ref[:],
            s0v_ref[:], h2w_ref[:], h2b_ref[0], cw_ref[:], cb_ref[0],
            aw_ref[0], ab_ref[0, 0], offw_ref, S, Q, H, LP, Dh, A, dot)
        z = (cz_ref[0] + dot(dot(onehot, emb_ref[:]), tw_ref[:])
             + dot(h, whh_ref[:]))
        for hh in range(H):
            z = z + dot(ctx[hh], cw3_ref[hh])
        h_new, c_new = _lstm_cell_fwd(z, c_prev)
        logits = dot(h_new, lw_ref[:]) + lb_ref[0]        # (Q, Vp)
        m = jnp.max(logits, axis=-1, keepdims=True)
        # first-max-index == jnp.argmax tie semantics
        win = jnp.min(jnp.where(logits == m, iota_v, float(Vp)),
                      axis=-1, keepdims=True)             # (Q, 1) f32
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1,
                                  keepdims=True))
        h_scr[:] = h_new
        c_scr[:] = c_new
        oh_scr[:] = (iota_v == win).astype(jnp.float32)
        # per-query scalars ride a 128-lane broadcast: Mosaic requires the
        # last two output-block dims be 8/128-aligned or cover the array,
        # which (Q_pad, 1) cannot satisfy (r4 HW probe); sliced outside
        tok_ref[0, 0] = jnp.broadcast_to(win, (Q, 128))
        lp_ref[0, 0] = jnp.broadcast_to(m - lse, (Q, 128))
    return kernel


def _pallas_greedy(value_t, base_pos, scale_t, const_z, embed, token_w,
                   logit_w, logit_b, off_w_h, h2att_w, h2att_b, cw, cb,
                   aw, ab, ctx_w3, w_hh, temporal_shapes, K, interpret,
                   precision):
    B, H, S, Dh = value_t.shape
    Q = const_z.shape[1]
    R = w_hh.shape[0]
    LP = scale_t.shape[-1]
    A = h2att_w.shape[-1]
    V1, E = embed.shape
    f32 = jnp.float32
    Q_pad = _round_up(Q, 8)
    Vp = _round_up(V1, 128)
    if Q_pad != Q:
        base_pos = jnp.pad(base_pos, ((0, 0), (0, 0), (0, Q_pad - Q),
                                      (0, 0)))
        scale_t = jnp.pad(scale_t, ((0, 0), (0, Q_pad - Q), (0, 0)))
        const_z = jnp.pad(const_z, ((0, 0), (0, Q_pad - Q), (0, 0)))
    if Vp != V1:
        embed = jnp.pad(embed, ((0, Vp - V1), (0, 0)))
        logit_w = jnp.pad(logit_w, ((0, 0), (0, Vp - V1)))
        logit_b = jnp.pad(logit_b, ((0, Vp - V1)),
                          constant_values=_NEG_INF)
    P = LP // len(temporal_shapes)
    hib_np, s0v_np = _flat_bounds_np(temporal_shapes, Q_pad, P)

    args = (value_t.astype(f32), base_pos.astype(f32), scale_t.astype(f32),
            jnp.asarray(hib_np), jnp.asarray(s0v_np), const_z.astype(f32),
            embed.astype(f32), token_w.astype(f32), logit_w.astype(f32),
            logit_b.astype(f32)[None, :], off_w_h.astype(f32),
            h2att_w.astype(f32), h2att_b.astype(f32)[None, :],
            cw.astype(f32), cb.astype(f32)[None, :], aw.astype(f32)[None, :],
            jnp.asarray(ab, f32).reshape(1, 1), ctx_w3.astype(f32),
            w_hh.astype(f32))
    per_b = lambda b, k: (b, 0, 0, 0)                     # noqa: E731
    per_b3 = lambda b, k: (b, 0, 0)                       # noqa: E731
    const2 = lambda b, k: (0, 0)                          # noqa: E731
    const3 = lambda b, k: (0, 0, 0)                       # noqa: E731
    in_specs = [
        pl.BlockSpec((1, H, S, Dh), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Q_pad, LP), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q_pad, LP), per_b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Q_pad, LP), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Q_pad, LP), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q_pad, 4 * R), per_b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Vp, E), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 4 * R), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((R, Vp), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Vp), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, R, LP), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((R, A), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Dh, A), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), const2, memory_space=pltpu.SMEM),
        pl.BlockSpec((H, Dh, 4 * R), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 4 * R), const2, memory_space=pltpu.VMEM),
    ]
    tok, lp = pl.pallas_call(
        _make_greedy_kernel(S, Q_pad, H, LP, Dh, A, R, Vp, precision),
        grid=(B, K),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, Q_pad, 128), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Q_pad, 128), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, K, Q_pad, 128), f32),
                   jax.ShapeDtypeStruct((B, K, Q_pad, 128), f32)],
        scratch_shapes=[pltpu.VMEM((Q_pad, R), f32),
                        pltpu.VMEM((Q_pad, R), f32),
                        pltpu.VMEM((Q_pad, Vp), f32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return tok[:, :, :Q, 0].astype(jnp.int32), lp[:, :, :Q, 0]


def dsa_greedy_scan(value_t, base_pos, scale_t, const_z, embed, token_w,
                    logit_w, logit_b, off_w_h, h2att_w, h2att_b, cw, cb,
                    aw, ab, ctx_w3, w_hh, temporal_shapes, K, impl='auto',
                    precision='float32'):
    """Whole greedy decode in one launch (see module doc).

    Returns (tok, lp): (B, K, Q) int32 argmax stream + f32 logprobs (the
    caller applies :func:`greedy_mask_outputs`).  impl: 'auto' (pallas on
    TPU, ref elsewhere) | 'ref' | 'pallas' | 'pallas_interpret'."""
    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() == 'tpu' else 'ref'
    if impl == 'ref':
        return dsa_greedy_scan_ref(
            value_t, base_pos, scale_t, const_z, embed, token_w, logit_w,
            logit_b, off_w_h, h2att_w, h2att_b, cw, cb, aw, ab, ctx_w3,
            w_hh, temporal_shapes, K)
    if impl in ('pallas', 'pallas_interpret'):
        from ..parallel.op_partition import partition_batched
        return partition_batched(
            lambda v, bp, st, cz, *params: _pallas_greedy(
                v, bp, st, cz, *params, tuple(temporal_shapes), K,
                impl == 'pallas_interpret', precision),
            (value_t, base_pos, scale_t, const_z),
            (embed, token_w, logit_w, logit_b, off_w_h, h2att_w, h2att_b,
             cw, cb, aw, jnp.asarray(ab), ctx_w3, w_hh))
    raise ValueError(f'unknown dsa greedy impl {impl!r}')
