#!/usr/bin/env python
"""Honest in-graph benchmark for the flagship train / eval steps.

On this box, `block_until_ready` through the remote-TPU tunnel does not
reliably wait for device completion, and repeated dispatches of an
identical (executable, args) pair can return early — wall-clock timings
built on either are artifacts (BENCHMARKS.md "Timing protocol").  The only
trustworthy protocol, implemented here:

* run N *dependent* iterations inside ONE jitted `lax.fori_loop` — each
  iteration perturbs its input with the previous result so XLA can neither
  hoist nor parallelize the body;
* fetch the result VALUE (a device-to-host transfer cannot complete before
  the computation);
* difference the wall times of an N1-iteration and an N2-iteration program
  to cancel dispatch/RPC latency and the transfer itself:
  ms/step = (t(N2) - t(N1)) / (N2 - N1).

    python tools/bench_honest.py [--what train,eval,post] [--batch 16]
                                 [--n1 8] [--n2 24]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (registration only — no backend init at import)


def _timed_value(fn, *args):
    t0 = time.perf_counter()
    v = jax.device_get(fn(*args))
    return time.perf_counter() - t0, v


def _pair(make_prog, n1, n2, *args):
    """Compile once (dynamic trip count -> while_loop) and time N1 vs N2;
    returns (ms_per_step, values)."""
    import jax.numpy as jnp
    f = make_prog
    a1 = (jnp.int32(n1),) + args
    a2 = (jnp.int32(n2),) + args
    _ = jax.device_get(f(*a1))             # compile + warm
    _ = jax.device_get(f(*a2))             # warm the N2 arg
    t1, v1 = _timed_value(f, *a1)
    t2, v2 = _timed_value(f, *a2)
    return (t2 - t1) / (n2 - n1) * 1e3, (v1, v2)


def bench_train(trainer, batch, B, n1, n2):
    import jax.numpy as jnp

    from dvc_tpu.train.trainer import step_prng_key
    state = trainer.init_state(batch)
    lr = jnp.float32(5e-5)
    ssp = jnp.float32(0.0)
    rng = step_prng_key(trainer.opt, 0)   # measure the default rng stream
    step = trainer._train_step_impl

    @jax.jit
    def make_prog(n, params, opt_state):
        if True:
            def body(i, carry):
                params, opt_state, acc = carry
                b = dict(batch)
                # dependence on the previous step's loss: not hoistable
                b['video_tensor'] = (batch['video_tensor']
                                     + jnp.sin(acc) * 1e-12)
                params, opt_state, losses = step(
                    params, opt_state, b, lr, ssp,
                    jax.random.fold_in(rng, i))
                return params, opt_state, losses['total_loss']
            carry = jax.lax.fori_loop(
                0, n, body, (params, opt_state, jnp.float32(0.0)))
            return carry[2]

    ms, _ = _pair(make_prog, n1, n2, state['params'], state['opt_state'])
    return {'train_step_ms': round(ms, 2),
            'train_videos_per_sec': round(B / ms * 1e3, 1)}


def bench_eval(trainer, batch, B, n1, n2):
    import jax.numpy as jnp
    state = trainer.init_state(batch)
    apply = trainer.model.apply

    @jax.jit
    def make_prog(n, params):
        def body(i, acc):
            b = dict(batch)
            b['video_tensor'] = (batch['video_tensor']
                                 + jnp.sin(acc) * 1e-12)
            out, _ = apply(params, b, eval_mode=True)
            return (jnp.sum(out['cap_prob_eval'])
                    + jnp.sum(out['pred_boxes'])) * 1e-6
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms, _ = _pair(make_prog, n1, n2, state['params'])
    return {'eval_step_ms': round(ms, 2),
            'eval_videos_per_sec': round(B / ms * 1e3, 1)}


def bench_post(trainer, batch, B, n1, n2):
    import jax.numpy as jnp

    from dvc_tpu.models.postprocess import postprocess
    state = trainer.init_state(batch)
    out, _ = jax.jit(lambda p, b: trainer.model.apply(
        p, b, eval_mode=True))(state['params'], batch)
    out = jax.device_get(out)
    out = {k: jnp.asarray(v) for k, v in out.items()
           if k in ('pred_logits', 'pred_count', 'pred_boxes', 'seq',
                    'cap_prob_eval')}
    durations = batch['video_length'][:, 1]

    @jax.jit
    def make_prog(n, out):
        def body(i, acc):
            o = dict(out)
            o['pred_logits'] = out['pred_logits'] + jnp.sin(acc) * 1e-12
            post = postprocess(o, durations)
            return (jnp.sum(post['scores'])
                    + jnp.sum(post['boxes'])) * 1e-6
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms, _ = _pair(make_prog, n1, n2, out)
    return {'postprocess_ms': round(ms, 3)}


def bench_tsp_train(B, n1, n2, backbone='mvit_v2_s', clip_len=16,
                    size=None, dtype='float32'):
    """TSP pretraining step (backbone fwd+bwd + two CE heads + per-group
    SGD) — the reference's only multi-GPU path (TSP/train/train.py).
    Same in-graph fori protocol as the PDVC step benches.  f32 master
    params always; dtype='bfloat16' runs the backbone compute in bf16
    (train_tsp.py --dtype bfloat16)."""
    import numpy as np

    import jax.numpy as jnp

    from dvc_tpu.train.tsp_trainer import TSPTrainer
    from dvc_tpu.utils.config import load_config
    size = size or (112 if backbone.startswith(('r2plus1d', 'r3d'))
                    else 224)
    opt = load_config(backbone_tsp=backbone, tsp_num_classes=(2, 2),
                      tsp_num_heads=2, loss_alphas=[1.0, 1.0],
                      backbone_lr=1e-4, fc_lr=1e-3, tsp_dtype=dtype)
    trainer = TSPTrainer(opt)
    rng = np.random.default_rng(0)
    batch = {
        'clip': jnp.asarray(rng.standard_normal(
            (B, clip_len, size, size, 3)).astype(np.float32)),
        'label0': jnp.asarray(rng.integers(0, 2, B), jnp.int32),
        'label1': jnp.asarray(rng.integers(0, 2, B), jnp.int32),
    }
    state = trainer.init_state(batch)
    step = trainer._step_impl
    lr_mult = state['lr_mult']

    @jax.jit
    def make_prog(n, variables, opt_state):
        def body(i, carry):
            variables, opt_state, acc = carry
            b = dict(batch)
            b['clip'] = batch['clip'] + jnp.sin(acc) * 1e-12
            variables, opt_state, metrics = step(
                variables, opt_state, lr_mult, b, jnp.float32(1.0))
            return variables, opt_state, metrics['total']
        carry = jax.lax.fori_loop(
            0, n, body, (variables, opt_state, jnp.float32(0.0)))
        return carry[2]

    ms, _ = _pair(make_prog, n1, n2, state['variables'],
                  state['opt_state'])
    key = f'tsp_train_{backbone}' + ('_bf16' if dtype != 'float32' else '')
    out = {f'{key}_step_ms': round(ms, 2),
           f'{key}_clips_per_sec': round(B / ms * 1e3, 1),
           f'{key}_ms_per_clip': round(ms / B, 3)}
    try:
        from dvc_tpu.utils.roofline import compiled_costs, roofline
        costs = compiled_costs(
            lambda v, o: step(v, o, lr_mult, batch, jnp.float32(1.0)),
            state['variables'], state['opt_state'])
        roof = roofline(costs, ms / 1e3)
        if roof:
            out[f'{key}_mfu'] = roof['mfu']
            out[f'{key}_gflop_per_clip'] = round(
                roof['flops_per_step'] / B / 1e9, 1)
    except Exception:
        pass
    return out


def bench_kernel(B, n1, n2, tanh_impls=('native', 'rational')):
    """Standalone fused caption-step kernel (dsa_sample_attend) at the
    flagship training shapes, fwd and fwd+bwd, per tanh formulation —
    the kernel chain is ~12 ms of the 33 ms step (19 word steps)."""
    import jax.numpy as jnp
    import numpy as np

    import dvc_tpu.ops.dsa_step as dsa_mod
    from dvc_tpu.ops.dsa_step import dsa_sample_attend

    Pq, H, L, P, A, Dh = 24, 8, 4, 4, 512, 64
    shapes = (200, 100, 50, 25)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    value = jax.random.normal(ks[0], (B, sum(shapes), H, Dh))
    offsets = jax.random.normal(ks[1], (B, Pq, H, L, P)) * 0.1
    ref_center = jax.random.uniform(ks[2], (B, Pq, L))
    offset_scale = jnp.full((B, Pq, L), 0.05)
    hvec = jax.random.normal(ks[3], (B, Pq, A)) * 0.1
    ctx_w = jax.random.normal(ks[4], (Dh, A)) * 0.05
    alpha_w = jax.random.normal(ks[5], (A,)) * 0.05

    results = {}
    outs = {}
    for impl in tanh_impls:
        dsa_mod._TANH_IMPL = impl

        def one(hv, off):
            return dsa_sample_attend(value, off, ref_center, offset_scale,
                                     hv, ctx_w, jnp.zeros((A,)), alpha_w,
                                     jnp.float32(0.0), shapes, impl='pallas')

        grad_fn = jax.grad(
            lambda hv, off: jnp.sum(one(hv, off) ** 2) * 1e-6,
            argnums=(0, 1))

        @jax.jit
        def prog_fwd(n, hv):
            def body(i, carry):
                hv, acc = carry
                out = one(hv + jnp.sin(acc) * 1e-12, offsets)
                return hv, jnp.sum(out) * 1e-9
            return jax.lax.fori_loop(0, n, body, (hv, jnp.float32(0.0)))[1]

        @jax.jit
        def prog_fwdbwd(n, hv):
            def body(i, carry):
                hv, acc = carry
                g_hv, g_off = grad_fn(hv + jnp.sin(acc) * 1e-12, offsets)
                return hv, jnp.sum(g_hv) + jnp.sum(g_off)
            return jax.lax.fori_loop(0, n, body, (hv, jnp.float32(0.0)))[1]

        ms_f, _ = _pair(prog_fwd, n1 * 4, n2 * 4, hvec)
        ms_fb, _ = _pair(prog_fwdbwd, n1 * 4, n2 * 4, hvec)
        results[f'kernel_fwd_ms_{impl}'] = round(ms_f, 3)
        results[f'kernel_fwdbwd_ms_{impl}'] = round(ms_fb, 3)
        outs[impl] = np.asarray(jax.device_get(one(hvec, offsets)))
    dsa_mod._TANH_IMPL = None
    if len(outs) == 2:
        a, b = outs.values()
        results['kernel_tanh_maxdiff'] = float(np.abs(a - b).max())
    return results


def bench_lstm_kernel(B, n1, n2, tanh_impls=('native', 'rational')):
    """Standalone fully-fused word step (dsa_lstm_step: sampling +
    attention + LSTM cell) at flagship training shapes, fwd and fwd+bwd,
    per tanh formulation — compare against bench_kernel to see what the
    in-kernel LSTM tail adds/saves."""
    import jax.numpy as jnp

    import dvc_tpu.ops.dsa_step as dsa_mod
    from dvc_tpu.ops.dsa_step import dsa_lstm_step

    Pq, H, L, P, A, Dh, R = 24, 8, 4, 4, 512, 64, 512
    d = H * Dh
    shapes = (200, 100, 50, 25)
    ks = jax.random.split(jax.random.PRNGKey(2), 11)
    value = jax.random.normal(ks[0], (B, sum(shapes), H, Dh))
    offsets = jax.random.normal(ks[1], (B, Pq, H, L, P)) * 0.1
    ref_center = jax.random.uniform(ks[2], (B, Pq, L))
    offset_scale = jnp.full((B, Pq, L), 0.05)
    hvec = jax.random.normal(ks[3], (B, Pq, A)) * 0.1
    cw = jax.random.normal(ks[4], (Dh, A)) * 0.05
    aw = jax.random.normal(ks[5], (A,)) * 0.05
    z0 = jax.random.normal(ks[6], (B, Pq, 4 * R)) * 0.1
    h = jax.random.normal(ks[7], (B, Pq, R)) * 0.1
    c = jax.random.normal(ks[8], (B, Pq, R)) * 0.1
    ctx_w = jax.random.normal(ks[9], (d, 4 * R)) * 0.05
    w_hh = jax.random.normal(ks[10], (R, 4 * R)) * 0.05

    results = {}
    for impl in tanh_impls:
        dsa_mod._TANH_IMPL = impl

        def one(h_, off):
            return dsa_lstm_step(value, off, ref_center, offset_scale,
                                 hvec, z0, h_, c, ctx_w, w_hh, cw,
                                 jnp.zeros((A,)), aw, jnp.float32(0.0),
                                 shapes, impl='pallas')

        grad_fn = jax.grad(
            lambda h_, off: sum(jnp.sum(o ** 2) for o in one(h_, off))
            * 1e-6, argnums=(0, 1))

        @jax.jit
        def prog_fwd(n, hv):
            def body(i, carry):
                hv, acc = carry
                hn, cn = one(hv + jnp.sin(acc) * 1e-12, offsets)
                return hv, (jnp.sum(hn) + jnp.sum(cn)) * 1e-9
            return jax.lax.fori_loop(0, n, body, (hv, jnp.float32(0.0)))[1]

        @jax.jit
        def prog_fwdbwd(n, hv):
            def body(i, carry):
                hv, acc = carry
                g_h, g_off = grad_fn(hv + jnp.sin(acc) * 1e-12, offsets)
                return hv, jnp.sum(g_h) + jnp.sum(g_off)
            return jax.lax.fori_loop(0, n, body, (hv, jnp.float32(0.0)))[1]

        ms_f, _ = _pair(prog_fwd, n1 * 4, n2 * 4, h)
        ms_fb, _ = _pair(prog_fwdbwd, n1 * 4, n2 * 4, h)
        results[f'lstm_kernel_fwd_ms_{impl}'] = round(ms_f, 3)
        results[f'lstm_kernel_fwdbwd_ms_{impl}'] = round(ms_fb, 3)
    dsa_mod._TANH_IMPL = None
    return results


def bench_trunk(trainer, batch, B, n1, n2):
    """Bisect the step: full vs forward-only vs fwd+bwd (no optimizer).
    Run with --caption none to isolate the non-caption trunk."""
    import jax.numpy as jnp

    from dvc_tpu.train.trainer import step_prng_key
    state = trainer.init_state(batch)
    rng = step_prng_key(trainer.opt, 0)
    lr = jnp.float32(5e-5)
    ssp = jnp.float32(0.0)
    step = trainer._train_step_impl

    @jax.jit
    def full(n, params, opt_state):
        def body(i, carry):
            params, opt_state, acc = carry
            b = dict(batch)
            b['video_tensor'] = batch['video_tensor'] + jnp.sin(acc) * 1e-12
            params, opt_state, losses = step(params, opt_state, b, lr, ssp,
                                             jax.random.fold_in(rng, i))
            return params, opt_state, losses['total_loss']
        return jax.lax.fori_loop(0, n, body, (params, opt_state,
                                              jnp.float32(0.0)))[2]

    def loss_only(p, b):
        out, losses = trainer.model.apply(p, b, eval_mode=False,
                                          ss_prob=0.0, ss_enabled=False,
                                          rngs={'dropout': rng,
                                                'sample': rng})
        return sum(losses[k] * w for k, w in trainer.weight_dict.items()
                   if k in losses and w)

    @jax.jit
    def fwd_only(n, params):
        def body(i, acc):
            b = dict(batch)
            b['video_tensor'] = batch['video_tensor'] + jnp.sin(acc) * 1e-12
            return loss_only(params, b)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def fwd_bwd(n, params):
        def body(i, acc):
            b = dict(batch)
            b['video_tensor'] = batch['video_tensor'] + jnp.sin(acc) * 1e-12
            total, grads = jax.value_and_grad(loss_only)(params, b)
            return total + jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(g) * 1e-12, grads,
                jnp.float32(0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    res = {}
    ms, _ = _pair(full, n1, n2, state['params'], state['opt_state'])
    res['trunk_full_ms'] = round(ms, 2)
    ms, _ = _pair(fwd_only, n1, n2, state['params'])
    res['trunk_fwd_ms'] = round(ms, 2)
    ms, _ = _pair(fwd_bwd, n1, n2, state['params'])
    res['trunk_fwdbwd_ms'] = round(ms, 2)
    return res


def bench_cost(trainer, batch, B, results):
    """XLA cost analysis of the single train/eval step + roofline fold
    against the measured ms (when train/eval ran in the same invocation).
    Emits per-slice FLOPs, HBM bytes, MFU and roofline-% — the analytic
    backing for any 'plateau reached' claim (VERDICT r3 weak #2)."""
    import jax.numpy as jnp

    from dvc_tpu.utils.roofline import compiled_costs, roofline
    state = trainer.init_state(batch)
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(5e-5)
    ssp = jnp.float32(0.0)
    step = trainer._train_step_impl
    out = {}

    def fold(tag, costs, ms):
        if not costs:
            out[f'{tag}_cost'] = None
            return
        out[f'{tag}_gflops_per_step'] = round(costs['flops'] / 1e9, 3)
        if costs.get('bytes'):
            out[f'{tag}_mbytes_per_step'] = round(costs['bytes'] / 1e6, 2)
        r = roofline(costs, ms * 1e-3 if ms else None)
        if r:
            out[f'{tag}_mfu'] = r['mfu']
            if 'hbm_util' in r:
                out[f'{tag}_hbm_util'] = r['hbm_util']
                out[f'{tag}_roofline_ms'] = r['roofline_ms']
                out[f'{tag}_roofline_pct'] = r['roofline_pct']

    fold('train',
         compiled_costs(lambda p, o, b: step(p, o, b, lr, ssp, rng),
                        state['params'], state['opt_state'], batch),
         results.get('train_step_ms'))

    def eval_fn(p, b):
        o, _ = trainer.model.apply(p, b, eval_mode=True)
        return o['seq'], o['cap_prob_eval'], o['pred_boxes']

    fold('eval', compiled_costs(eval_fn, state['params'], batch),
         results.get('eval_step_ms'))
    return out


def bench_matcher(B, n1, n2, G=8, Q=100, layers=4):
    """On-device JV assignment at flagship shapes: one vmapped solve over
    B*layers problems of (G, Q) — the per-step matching cost the reference
    pays as a GPU->CPU scipy sync."""
    import jax.numpy as jnp

    from dvc_tpu.ops.assignment import masked_assignment
    cost = jax.random.normal(jax.random.PRNGKey(0), (B * layers, G, Q))
    mask = jnp.ones((B * layers, G), bool)

    @jax.jit
    def prog(n, cost):
        def body(i, acc):
            c = cost + jnp.sin(acc) * 1e-9
            cols = jax.vmap(masked_assignment)(c, mask)
            return jnp.sum(cols).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms, _ = _pair(prog, n1, n2, cost)
    return {f'matcher_ms_{B}x{layers}layers': round(ms, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--what', default='train,eval')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--n1', type=int, default=8)
    ap.add_argument('--n2', type=int, default=24)
    ap.add_argument('--frames', type=int, default=200)
    ap.add_argument('--max-caption-len', type=int, default=20)
    ap.add_argument('--dtype', default='float32',
                    choices=['float32', 'bfloat16'],
                    help='tpu_compute_dtype for the trunk + fused kernels')
    ap.add_argument('--caption', default=None,
                    help='override caption_decoder_type (e.g. none, to '
                         'isolate the trunk with --what trunk)')
    ap.add_argument('--fuse', type=int, default=None,
                    help='override dsa_lstm_fuse (A/B the fused word step '
                         'end-to-end: --what train,eval --fuse 0|1)')
    ap.add_argument('--set', action='append', default=[], metavar='K=V',
                    help='arbitrary flagship-opt override (repeatable), '
                         'e.g. --set enc_layers=4 --set dec_layers=2 — '
                         'for ablation bisects of the trunk')
    args = ap.parse_args()

    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition('=')
        if v.lower() in ('true', 'false'):
            v = v.lower() == 'true'
        elif v.startswith('str:'):
            v = v[4:]          # explicit string override, e.g. str:dense
        else:
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    raise SystemExit(
                        f'--set {kv}: value must be int/float/true/false '
                        'or str:<value> (a bare string would silently '
                        'pass as truthy)')
        overrides[k] = v

    results = {'batch': args.batch, 'backend': jax.default_backend(),
               'protocol': 'in-graph fori diff '
                           f'N{args.n1}/N{args.n2}'}
    whats = [w.strip() for w in args.what.split(',')]
    if 'kernel' in whats:
        results.update(bench_kernel(args.batch, args.n1, args.n2))
        print(json.dumps(results))
        whats.remove('kernel')
    if 'lstm' in whats:
        results.update(bench_lstm_kernel(args.batch, args.n1, args.n2))
        print(json.dumps(results))
        whats.remove('lstm')
    if 'matcher' in whats:
        results.update(bench_matcher(args.batch, args.n1, args.n2))
        print(json.dumps(results))
        whats.remove('matcher')
    for w in [w for w in whats if w.startswith('tsp')]:
        # 'tsp' (mvit default), 'tsp:<backbone>', or 'tsp:<backbone>:bf16'
        # e.g. tsp:r2plus1d_34, tsp:mvit_v2_s:bf16
        parts = w.split(':')
        backbone = parts[1] if len(parts) > 1 and parts[1] else 'mvit_v2_s'
        dtype = 'bfloat16' if 'bf16' in parts[2:] else 'float32'
        results.update(bench_tsp_train(args.batch, args.n1, args.n2,
                                       backbone=backbone, dtype=dtype))
        print(json.dumps(results))
        whats.remove(w)
    if whats:
        from __graft_entry__ import _flagship_opt, _synthetic_batch
        from dvc_tpu.train import Trainer
        kw = dict(frame_embedding_num=args.frames,
                  max_caption_len=args.max_caption_len,
                  tpu_mesh_data=1, tpu_compute_dtype=args.dtype)
        if args.caption:
            kw['caption_decoder_type'] = args.caption
            if args.caption == 'none':
                kw['caption_loss_coef'] = 0.0
        if args.fuse is not None:
            kw['dsa_lstm_fuse'] = args.fuse
        kw.update(overrides)
        if overrides:
            results['overrides'] = overrides
        opt = _flagship_opt(**kw)
        trainer = Trainer(opt)
        batch = _synthetic_batch(opt, B=args.batch)
        run_cost = 'cost' in whats
        for what in whats:
            if what == 'cost':
                continue
            fn = {'train': bench_train, 'eval': bench_eval,
                  'post': bench_post, 'trunk': bench_trunk}[what]
            results.update(fn(trainer, batch, args.batch, args.n1, args.n2))
            print(json.dumps(results))
        if run_cost:
            results.update(bench_cost(trainer, batch, args.batch, results))
            print(json.dumps(results))
    print('FINAL', json.dumps(results))


if __name__ == '__main__':
    main()
