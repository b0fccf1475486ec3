"""Cross-step fused caption word scan: the WHOLE teacher-forcing loop in
one Pallas launch.

The flagship train step's largest slice is the K-step (K = max_caption_len
- 1, 19 at flagship) sequential word scan of the LSTM-DSA caption head
(reference hot loop ``LSTM_DSA.py:88-109``): per step, deformable tap
sampling + additive attention (``ops/dsa_step.py`` kernel) plus the LSTM
recurrence glue in XLA.  Even with the per-step fused kernel, each step
costs a kernel launch, reloads ``value`` from HBM, and round-trips h/c
and the sampling positions through XLA between launches.

This op runs all K steps inside ONE ``pallas_call``:

* grid = (B, K) with the word step k as the MINOR grid dimension — TPU
  grid iteration is sequential, so k is a scan; the LSTM state (h, c)
  lives in VMEM scratch across steps and never reaches HBM mid-scan.
* ``value`` (the event memory) is blocked per b only: Mosaic keeps the
  revisited block resident in VMEM for all K steps — one HBM read per
  video instead of K.
* the per-step token/query preactivations ``z_all[b, k]`` stream in
  through the normal Pallas pipeline (next step's DMA overlaps compute).
* the backward is the same grid with the k index map REVERSED (a
  backward-in-time scan): d h / d c carry in scratch, dvalue and the
  weight gradients accumulate in revisited VMEM blocks and are flushed
  once, eliminating the K per-step dvalue HBM round trips + the XLA
  reduction over them.

Position/boundary semantics are single-sourced from
``ms_deform_attn._lerp_onehot_pair`` / ``_flat_bounds_np`` (border mode,
level-relative f32 positions), and the LSTM cell math from
``dsa_step._lstm_cell_fwd/_bwd`` — the same helpers the per-step kernels
use, so the formulations cannot diverge.

Everything the steps share is hoisted by the caller (`caption_heads`):
the value projection, the query share of the offset projection folded
into ``base_pos`` (= (ref + off_const·scale)·T_l - 0.5), and the
token-embedding + query share of the LSTM preactivation (``z_all``).
Scheduled sampling feeds sampled tokens back between steps, so only the
``ss_enabled=False`` teacher-forcing fast path can use this op (the
reference's eval-time greedy loop likewise stays stepwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dsa_step import (_COMPILER_PARAMS, _kernel_tanh, _lstm_cell_bwd,
                       _lstm_cell_fwd, _make_dot)
from .ms_deform_attn import _flat_bounds_np, _lerp_onehot_pair, _round_up


# ----------------------------------------------------------------------------
# jnp reference (oracle; CPU path)
# ----------------------------------------------------------------------------

def dsa_teacher_scan_ref(value_t, base_pos, scale_t, z_all, off_w_h,
                         h2att_w, h2att_b, cw, cb, aw, ab, ctx_w3, w_hh,
                         temporal_shapes):
    """Oracle composition of the K-step teacher-forcing loop.

    value_t: (B, H, S, Dh) head-major projected memory;
    base_pos: (B, H, Q, LP) level-relative base positions
      (= (ref + off_const*scale)*T_l - 0.5, (l, p) flat);
    scale_t: (B, Q, LP) offset scale in level-relative units;
    z_all: (B, K, Q, 4R) per-step LSTM layer-0 preactivations (token
      embedding + query contributions, hoisted);
    off_w_h: (H, R, LP) hidden->offset weights per head;
    h2att_w/(b): (R, A)/(A,); cw/(cb): (Dh, A)/(A,); aw: (A,); ab: ();
    ctx_w3: (H, Dh, 4R); w_hh: (R, 4R).
    Returns (hs, cs): each (B, K, Q, R).
    """
    B, H, S, Dh = value_t.shape
    K, Q = z_all.shape[1], z_all.shape[2]
    R = w_hh.shape[0]
    LP = scale_t.shape[-1]
    P = LP // len(temporal_shapes)
    hib, s0v = _flat_bounds_np(temporal_shapes, Q, P)     # (Q, LP)
    hib = jnp.asarray(hib)
    s0v = jnp.asarray(s0v)

    def step(carry, z_k):
        h, c = carry                                      # (B, Q, R)
        hvec = h @ h2att_w + h2att_b                      # (B, Q, A)
        off = jnp.einsum('bqr,hrp->bhqp', h, off_w_h)     # (B, H, Q, LP)
        pos = base_pos + off * scale_t[:, None]
        _, w_lo, w_hi, M_lo, M_hi = _lerp_onehot_pair(pos, hib, s0v, S)
        M = w_lo[..., None] * M_lo + w_hi[..., None] * M_hi  # (B,H,Q,LP,S)
        taps = jnp.einsum('bhqps,bhsd->bhqpd', M, value_t)
        u = jnp.tanh(taps @ cw + cb
                     + hvec[:, None, :, None, :])         # (B,H,Q,LP,A)
        d = u @ aw + ab
        wts = jax.nn.softmax(d, axis=-1)                  # (B, H, Q, LP)
        ctx = jnp.einsum('bhqp,bhqpd->bhqd', wts, taps)   # (B, H, Q, Dh)
        z = (z_k + h @ w_hh
             + jnp.einsum('bhqd,hdr->bqr', ctx, ctx_w3))
        h_new, c_new = _lstm_cell_fwd(z, c)
        return (h_new, c_new), (h_new, c_new)

    h0 = jnp.zeros((B, Q, R), value_t.dtype)
    _, (hs, cs) = jax.lax.scan(step, (h0, h0),
                               jnp.moveaxis(z_all, 1, 0))
    return jnp.moveaxis(hs, 0, 1), jnp.moveaxis(cs, 0, 1)


# ----------------------------------------------------------------------------
# shared in-kernel step math
# ----------------------------------------------------------------------------

def scan_fwd_math(h, value, base_pos, scale_t, hib, s0v, h2att_w, h2att_b,
                  cw, cb, aw, ab, off_w_h, S, Q, H, LP, Dh, A, dot):
    """One step's sampling + attention from hidden state h (Q, R).

    Returns (pos_l, M_l: per-head lists of (pos, (M, M_lo, M_hi))), hvec,
    a, wts, ctx with a/wts (H, Q, LP, A)/(H, Q, LP) stacked and ctx
    (H, Q, Dh).  The raw one-hot pair rides along so the backward can
    reuse it for the d-pos difference matmul instead of rebuilding."""
    hvec = dot(h, h2att_w) + h2att_b                      # (Q, A)
    pos_l, M_l, taps_l = [], [], []
    for hh in range(H):
        off = dot(h, off_w_h[hh])                         # (Q, LP)
        pos = base_pos[hh] + off * scale_t
        _, w_lo, w_hi, M_lo, M_hi = _lerp_onehot_pair(pos, hib, s0v, S)
        M = w_lo[..., None] * M_lo + w_hi[..., None] * M_hi  # (Q, LP, S)
        taps = dot(M.reshape(Q * LP, S), value[hh]).reshape(Q, LP, Dh)
        pos_l.append(pos)
        M_l.append((M, M_lo, M_hi))
        taps_l.append(taps)
    taps4 = jnp.stack(taps_l)                             # (H, Q, LP, Dh)
    u = (dot(taps4.reshape(H * Q * LP, Dh), cw).reshape(H, Q, LP, A)
         + cb[None, None, None, :] + hvec[None, :, None, :])
    a = _kernel_tanh(u)
    d = jnp.sum(a * aw[None, None, None, :], axis=-1) + ab
    d = d - jnp.max(d, axis=-1, keepdims=True)
    e = jnp.exp(d)
    wts = e / jnp.sum(e, axis=-1, keepdims=True)          # (H, Q, LP)
    ctx = jnp.sum(wts[..., None] * taps4, axis=2)         # (H, Q, Dh)
    return pos_l, M_l, taps4, hvec, a, wts, ctx


# ----------------------------------------------------------------------------
# forward kernel: grid (B, K), k minor (sequential word scan)
# ----------------------------------------------------------------------------

def _make_scan_fwd_kernel(S, Q, H, LP, Dh, A, R, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, base_ref, scale_ref, hib_ref, s0v_ref, z_ref,
               offw_ref, h2w_ref, h2b_ref, cw_ref, cb_ref, aw_ref, ab_ref,
               cw3_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr):
        k = pl.program_id(1)
        # branchless carry init: a conditional splat-zeros STORE gives the
        # scratch a replicated Mosaic layout that conflicts with the
        # concrete h_new store ("invalid relayout" on real Mosaic, r4 HW
        # run) — select zeros on the READ instead (NaN-safe: select, not
        # multiply, so uninitialized VMEM at k==0 never propagates)
        h = jnp.where(k == 0, 0.0, h_scr[:])              # (Q, R)
        c_prev = jnp.where(k == 0, 0.0, c_scr[:])
        *_, ctx = scan_fwd_math(
            h, value_ref[0], base_ref[0], scale_ref[0], hib_ref[:],
            s0v_ref[:], h2w_ref[:], h2b_ref[0], cw_ref[:], cb_ref[0],
            aw_ref[0], ab_ref[0, 0], offw_ref, S, Q, H, LP, Dh, A, dot)
        z = z_ref[0, 0] + dot(h, whh_ref[:])
        for hh in range(H):
            z = z + dot(ctx[hh], cw3_ref[hh])
        h_new, c_new = _lstm_cell_fwd(z, c_prev)
        h_scr[:] = h_new
        c_scr[:] = c_new
        hs_ref[0, 0] = h_new
        cs_ref[0, 0] = c_new
    return kernel


# ----------------------------------------------------------------------------
# backward kernel: same grid, k index maps reversed (backward-in-time)
# ----------------------------------------------------------------------------

def _make_scan_bwd_kernel(S, Q, H, LP, Dh, A, R, precision):
    dot = _make_dot(precision)

    def kernel(value_ref, base_ref, scale_ref, hib_ref, s0v_ref, z_ref,
               offw_ref, h2w_ref, h2b_ref, cw_ref, cb_ref, aw_ref, ab_ref,
               cw3_ref, whh_ref, hprev_ref, cprev_ref, gh_ref, gc_ref,
               dvalue_ref, dbase_ref, dscale_ref, dz_ref, doffw_ref,
               dh2w_ref, dh2b_ref, dcw_ref, dcb_ref, daw_ref, dab_ref,
               dcw3_ref, dwhh_ref, dh_scr, dc_scr):
        b = pl.program_id(0)
        k = pl.program_id(1)                              # reverse index

        @pl.when(k == 0)
        def _():
            dvalue_ref[:] = jnp.zeros_like(dvalue_ref)
            dbase_ref[:] = jnp.zeros_like(dbase_ref)
            dscale_ref[:] = jnp.zeros_like(dscale_ref)

        @pl.when((b == 0) & (k == 0))
        def _():
            doffw_ref[:] = jnp.zeros_like(doffw_ref)
            dh2w_ref[:] = jnp.zeros_like(dh2w_ref)
            dh2b_ref[:] = jnp.zeros_like(dh2b_ref)
            dcw_ref[:] = jnp.zeros_like(dcw_ref)
            dcb_ref[:] = jnp.zeros_like(dcb_ref)
            daw_ref[:] = jnp.zeros_like(daw_ref)
            dab_ref[:] = jnp.zeros_like(dab_ref)
            dcw3_ref[:] = jnp.zeros_like(dcw3_ref)
            dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

        value = value_ref[0]                              # (H, S, Dh)
        h_prev = hprev_ref[0, 0]                          # (Q, R)
        c_prev = cprev_ref[0, 0]
        base_pos = base_ref[0]
        scale_t = scale_ref[0]

        # ---- recompute the step-t forward entirely in VMEM
        pos_l, M_l, taps4, hvec, a, wts, ctx = scan_fwd_math(
            h_prev, value, base_pos, scale_t, hib_ref[:], s0v_ref[:],
            h2w_ref[:], h2b_ref[0], cw_ref[:], cb_ref[0], aw_ref[0],
            ab_ref[0, 0], offw_ref, S, Q, H, LP, Dh, A, dot)
        z = z_ref[0, 0] + dot(h_prev, whh_ref[:])
        for hh in range(H):
            z = z + dot(ctx[hh], cw3_ref[hh])

        # ---- LSTM cell backward (carry in = cotangent of h_t, c_t);
        # branchless carry init as in the forward kernel (see note there)
        g_h = gh_ref[0, 0] + jnp.where(k == 0, 0.0, dh_scr[:])
        g_c = gc_ref[0, 0] + jnp.where(k == 0, 0.0, dc_scr[:])
        dz, dc_prev = _lstm_cell_bwd(z, c_prev, g_h, g_c)
        dz_ref[0, 0] = dz
        dwhh_ref[:] += dot(h_prev.T, dz)
        dh_prev = dot(dz, whh_ref[:].T)                   # (Q, R)

        # ---- d ctx through the per-head ctx_w blocks
        dctx_l = []
        for hh in range(H):
            dctx_l.append(dot(dz, cw3_ref[hh].T))         # (Q, Dh)
            dcw3_ref[hh] += dot(ctx[hh].T, dz)

        # ---- attention backward (ctx = sum_p wts_p taps_p)
        dctx = jnp.stack(dctx_l)                          # (H, Q, Dh)
        dwts = jnp.sum(taps4 * dctx[:, :, None, :], axis=-1)  # (H, Q, LP)
        dtaps = wts[..., None] * dctx[:, :, None, :]      # (H, Q, LP, Dh)
        ddot = wts * (dwts - jnp.sum(wts * dwts, axis=-1, keepdims=True))
        da = ddot[..., None] * aw_ref[0][None, None, None, :]
        du = da * (1.0 - a * a)                           # (H, Q, LP, A)
        dtaps = dtaps + dot(
            du.reshape(H * Q * LP, A), cw_ref[:].T).reshape(H, Q, LP, Dh)
        dhvec = jnp.sum(du, axis=(0, 2))                  # (Q, A)
        dcw_ref[:] += dot(taps4.reshape(H * Q * LP, Dh).T,
                          du.reshape(H * Q * LP, A))
        dcb_ref[:] += jnp.sum(du, axis=(0, 1, 2))[None, :]
        daw_ref[:] += jnp.sum(a * ddot[..., None], axis=(0, 1, 2))[None, :]
        dab_ref[:] += jnp.sum(ddot)[None, None]

        # ---- hvec chain.  dh2b comes from du directly (sum over
        # (H, Q, LP) — identical to summing dhvec over Q): summing dhvec
        # again over its sublane axis makes Mosaic demand an invalid
        # relayout of the (Q, A) vector it also feeds to the dh2w matmul
        # (r4 HW bisect; same error class as the scratch-init note above)
        dh_prev = dh_prev + dot(dhvec, h2w_ref[:].T)
        dh2w_ref[:] += dot(h_prev.T, dhvec)
        dh2b_ref[:] += jnp.sum(du, axis=(0, 1, 2))[None, :]

        # ---- sampling backward per head
        dscale_acc = jnp.zeros((Q, LP), jnp.float32)
        for hh in range(H):
            M, M_lo, M_hi = M_l[hh]                       # (Q, LP, S) x3
            dtaps_h = dtaps[hh].reshape(Q * LP, Dh)
            dvalue_ref[0, hh] += dot(M.reshape(Q * LP, S).T, dtaps_h)
            # d tap / d pos = v[hi] - v[lo] via the one-hot pair reused
            # from the forward recompute (no second iota/compare build)
            diff = dot((M_hi - M_lo).reshape(Q * LP, S),
                       value[hh])                         # (QLP, Dh)
            dpos = jnp.sum(dtaps_h * diff, axis=-1).reshape(Q, LP)
            dbase_ref[0, hh] += dpos
            off = dot(h_prev, offw_ref[hh])               # (Q, LP)
            dscale_acc = dscale_acc + dpos * off
            doff = dpos * scale_t                         # (Q, LP)
            dh_prev = dh_prev + dot(doff, offw_ref[hh].T)
            doffw_ref[hh] += dot(h_prev.T, doff)
        dscale_ref[0] += dscale_acc

        dh_scr[:] = dh_prev
        dc_scr[:] = dc_prev
    return kernel


# ----------------------------------------------------------------------------
# pallas_call plumbing
# ----------------------------------------------------------------------------

def _pallas_scan(value_t, base_pos, scale_t, z_all, off_w_h, h2att_w,
                 h2att_b, cw, cb, aw, ab, ctx_w3, w_hh, temporal_shapes,
                 interpret, precision, backward=False, residuals=None,
                 g=None):
    B, H, S, Dh = value_t.shape
    K, Q = z_all.shape[1], z_all.shape[2]
    R = w_hh.shape[0]
    LP = scale_t.shape[-1]
    A = h2att_w.shape[-1]
    f32 = jnp.float32
    Q_pad = _round_up(Q, 8)
    if Q_pad != Q:
        pq = ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0))
        base_pos = jnp.pad(base_pos, pq)
        scale_t = jnp.pad(scale_t, pq[1:])
        z_all = jnp.pad(z_all, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
        if backward:
            residuals = tuple(
                jnp.pad(r, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
                for r in residuals)
            g = tuple(
                jnp.pad(x, ((0, 0), (0, 0), (0, Q_pad - Q), (0, 0)))
                for x in g)
    P = LP // len(temporal_shapes)
    hib_np, s0v_np = _flat_bounds_np(temporal_shapes, Q_pad, P)

    args = (value_t.astype(f32), base_pos.astype(f32), scale_t.astype(f32),
            jnp.asarray(hib_np), jnp.asarray(s0v_np),
            z_all.astype(f32), off_w_h.astype(f32), h2att_w.astype(f32),
            h2att_b.astype(f32)[None, :], cw.astype(f32),
            cb.astype(f32)[None, :], aw.astype(f32)[None, :],
            jnp.asarray(ab, f32).reshape(1, 1), ctx_w3.astype(f32),
            w_hh.astype(f32))
    per_b = lambda b, k: (b, 0, 0, 0)                     # noqa: E731
    const2 = lambda b, k: (0, 0)                          # noqa: E731
    const3 = lambda b, k: (0, 0, 0)                       # noqa: E731
    in_specs = [
        pl.BlockSpec((1, H, S, Dh), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Q_pad, LP), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q_pad, LP), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Q_pad, LP), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Q_pad, LP), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Q_pad, 4 * R),
                     (lambda b, k: (b, K - 1 - k, 0, 0)) if backward
                     else (lambda b, k: (b, k, 0, 0)),
                     memory_space=pltpu.VMEM),
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
    scratch = [pltpu.VMEM((Q_pad, R), f32), pltpu.VMEM((Q_pad, R), f32)]

    if not backward:
        hs, cs = pl.pallas_call(
            _make_scan_fwd_kernel(S, Q_pad, H, LP, Dh, A, R, precision),
            grid=(B, K),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, Q_pad, R), lambda b, k: (b, k, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Q_pad, R), lambda b, k: (b, k, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((B, K, Q_pad, R), f32),
                       jax.ShapeDtypeStruct((B, K, Q_pad, R), f32)],
            scratch_shapes=scratch,
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*args)
        return hs[:, :, :Q], cs[:, :, :Q]

    hs_prev, cs_prev = residuals                          # shifted by one
    gh, gc = g
    rev = lambda b, k: (b, K - 1 - k, 0, 0)               # noqa: E731
    kqr_rev = pl.BlockSpec((1, 1, Q_pad, R), rev, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_scan_bwd_kernel(S, Q_pad, H, LP, Dh, A, R, precision),
        grid=(B, K),
        in_specs=in_specs + [kqr_rev, kqr_rev, kqr_rev, kqr_rev],
        out_specs=[
            pl.BlockSpec((1, H, S, Dh), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Q_pad, LP), per_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_pad, LP), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Q_pad, 4 * R), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, R, LP), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, A), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, A), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Dh, 4 * R), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 4 * R), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, Dh), f32),
            jax.ShapeDtypeStruct((B, H, Q_pad, LP), f32),
            jax.ShapeDtypeStruct((B, Q_pad, LP), f32),
            jax.ShapeDtypeStruct((B, K, Q_pad, 4 * R), f32),
            jax.ShapeDtypeStruct((H, R, LP), f32),
            jax.ShapeDtypeStruct((R, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((Dh, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, A), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((H, Dh, 4 * R), f32),
            jax.ShapeDtypeStruct((R, 4 * R), f32),
        ],
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*args, hs_prev.astype(f32), cs_prev.astype(f32),
      gh.astype(f32), gc.astype(f32))
    (dval, dbase, dscale, dz, doffw, dh2w, dh2b, dcw, dcb, daw, dab,
     dcw3, dwhh) = outs
    return (dval, dbase[:, :, :Q], dscale[:, :Q], dz[:, :, :Q], doffw,
            dh2w, dh2b[0], dcw, dcb[0], daw[0], dab[0, 0], dcw3, dwhh)


# ----------------------------------------------------------------------------
# custom VJP + dispatcher
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def _scan_core(value_t, base_pos, scale_t, z_all, off_w_h, h2att_w,
               h2att_b, cw, cb, aw, ab, ctx_w3, w_hh, temporal_shapes,
               interpret, precision):
    hs, _ = _pallas_scan(value_t, base_pos, scale_t, z_all, off_w_h,
                         h2att_w, h2att_b, cw, cb, aw, ab, ctx_w3, w_hh,
                         temporal_shapes, interpret, precision)
    return hs


def _scan_core_fwd(value_t, base_pos, scale_t, z_all, off_w_h, h2att_w,
                   h2att_b, cw, cb, aw, ab, ctx_w3, w_hh, temporal_shapes,
                   interpret, precision):
    hs, cs = _pallas_scan(value_t, base_pos, scale_t, z_all, off_w_h,
                          h2att_w, h2att_b, cw, cb, aw, ab, ctx_w3, w_hh,
                          temporal_shapes, interpret, precision)
    res = (value_t, base_pos, scale_t, z_all, off_w_h, h2att_w, h2att_b,
           cw, cb, aw, ab, ctx_w3, w_hh, hs, cs)
    return hs, res


def _scan_core_bwd(temporal_shapes, interpret, precision, res, g):
    (value_t, base_pos, scale_t, z_all, off_w_h, h2att_w, h2att_b,
     cw, cb, aw, ab, ctx_w3, w_hh, hs, cs) = res
    # step t's backward needs (h_{t-1}, c_{t-1}): shift by one, zeros first
    hs_prev = jnp.concatenate([jnp.zeros_like(hs[:, :1]), hs[:, :-1]], 1)
    cs_prev = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs[:, :-1]], 1)
    gc = jnp.zeros_like(g)
    (dval, dbase, dscale, dz, doffw, dh2w, dh2b, dcw, dcb, daw, dab,
     dcw3, dwhh) = _pallas_scan(
        value_t, base_pos, scale_t, z_all, off_w_h, h2att_w, h2att_b,
        cw, cb, aw, ab, ctx_w3, w_hh, temporal_shapes, interpret,
        precision, backward=True, residuals=(hs_prev, cs_prev),
        g=(g, gc))
    return (dval.astype(value_t.dtype), dbase.astype(base_pos.dtype),
            dscale.astype(scale_t.dtype), dz.astype(z_all.dtype),
            doffw.astype(off_w_h.dtype), dh2w.astype(h2att_w.dtype),
            dh2b.astype(h2att_b.dtype), dcw.astype(cw.dtype),
            dcb.astype(cb.dtype), daw.astype(aw.dtype),
            dab.astype(jnp.asarray(ab).dtype), dcw3.astype(ctx_w3.dtype),
            dwhh.astype(w_hh.dtype))


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def dsa_teacher_scan(value_t, base_pos, scale_t, z_all, off_w_h, h2att_w,
                     h2att_b, cw, cb, aw, ab, ctx_w3, w_hh,
                     temporal_shapes, impl='auto', precision='float32'):
    """Whole teacher-forcing word scan in one launch (see module doc).

    Returns hs (B, K, Q, R) — the per-step hidden states; the caller runs
    the (batched) vocab projection on them.  impl: 'auto' (pallas on TPU,
    ref elsewhere) | 'ref' | 'pallas' | 'pallas_interpret'."""
    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() == 'tpu' else 'ref'
    if impl == 'ref':
        hs, _ = dsa_teacher_scan_ref(value_t, base_pos, scale_t, z_all,
                                     off_w_h, h2att_w, h2att_b, cw, cb, aw,
                                     ab, ctx_w3, w_hh, temporal_shapes)
        return hs
    if impl in ('pallas', 'pallas_interpret'):
        from ..parallel.op_partition import partition_batched
        # params ride through partition_batched's replicated slot so
        # shard_map psums their cotangents
        return partition_batched(
            lambda v, bp, st, z, *params: _scan_core(
                v, bp, st, z, *params, tuple(temporal_shapes),
                impl == 'pallas_interpret', precision),
            (value_t, base_pos, scale_t, z_all),
            (off_w_h, h2att_w, h2att_b, cw, cb, aw, jnp.asarray(ab),
             ctx_w3, w_hh))
    raise ValueError(f'unknown dsa scan impl {impl!r}')
