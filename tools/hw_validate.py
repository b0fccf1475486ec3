#!/usr/bin/env python
"""One-command hardware-validation run for the pending kernel decisions.

The TPU on this box is reached through a tunnel that can drop mid-run, so
every stage appends its own JSON line to the report file the moment it
finishes — a dropped tunnel preserves partial results.  Run it whenever
the tunnel is up:

    python tools/hw_validate.py [--out HW_VALIDATION.jsonl] [--batch 16]
                                [--stages kernel,lstm,ab,trunk,trunk_fwd,matcher,post]

Stages (all in one process; in-graph two-point protocol throughout):
  kernel   sample+attend kernel fwd / fwd+bwd, native vs rational tanh
  lstm     fully fused word step (dsa_lstm_step), native vs rational tanh
  ab       end-to-end train + eval step, lstm_fuse off vs on
  scan     end-to-end train step, cross-step fused word scan off vs on
  greedy   end-to-end eval step, cross-step fused greedy decode off vs on
  trunk    full vs fwd vs fwd+bwd bisect
  trunk_fwd  end-to-end train + eval step, trunk dense vs pallas sampling
  matcher  vmapped JV solves at flagship shapes
  post     device-side postprocess

Prints flip recommendations at the end:
  - _TANH_DEFAULT -> 'rational' in dvc_tpu/ops/dsa_step.py if it wins
  - --dsa_lstm_fuse / DSACaptionHead.lstm_fuse / PDVCConfig defaults -> on
    if the fused step wins end-to-end
Then update BENCHMARKS.md with the new table rows and re-run bench.py.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_backend(timeout):
    """Backend init hangs forever (GIL held) when the tunnel is down —
    probe in a subprocess first (same pattern as bench.py)."""
    try:
        subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices(); print("up")'],
            timeout=timeout, check=True, capture_output=True)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='HW_VALIDATION.jsonl')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--n1', type=int, default=8)
    ap.add_argument('--n2', type=int, default=24)
    ap.add_argument('--stages',
                    default='kernel,lstm,ab,scan,greedy,trunk,trunk_fwd,'
                            'matcher,post')
    ap.add_argument('--probe-timeout', type=float, default=600)
    args = ap.parse_args()

    if not probe_backend(args.probe_timeout):
        print(json.dumps({'error': 'TPU backend unreachable — tunnel down; '
                                   'nothing measured'}))
        return 3

    import jax
    from tools import bench_honest as bh

    def emit(stage, payload):
        line = {'stage': stage, 'backend': jax.default_backend(),
                'batch': args.batch,
                'protocol': f'in-graph fori diff N{args.n1}/N{args.n2}',
                **payload}
        with open(args.out, 'a') as f:
            f.write(json.dumps(line) + '\n')
        print(json.dumps(line), flush=True)
        return line

    stages = [s.strip() for s in args.stages.split(',')]
    results = {}
    t0 = time.time()

    def run_stage(name, fn):
        """A Mosaic compile rejection in one stage (the fused kernels'
        first real-hardware compile happens HERE) must not lose the
        others — record the error and keep going."""
        try:
            results[name] = emit(name, fn())
        except Exception as e:  # noqa: BLE001
            import traceback
            emit(name, {'error': f'{type(e).__name__}: {e}',
                        'traceback': traceback.format_exc()[-2000:]})

    if 'kernel' in stages:
        run_stage('kernel',
                  lambda: bh.bench_kernel(args.batch, args.n1, args.n2))
    if 'lstm' in stages:
        run_stage('lstm',
                  lambda: bh.bench_lstm_kernel(args.batch, args.n1, args.n2))

    if any(s in stages for s in ('ab', 'scan', 'greedy', 'trunk',
                                 'trunk_fwd', 'tanh', 'matcher', 'post')):
        from __graft_entry__ import _flagship_opt, _synthetic_batch
        from dvc_tpu.train import Trainer

        def build(fuse):
            opt = _flagship_opt(frame_embedding_num=200, max_caption_len=20,
                                tpu_mesh_data=1, dsa_lstm_fuse=fuse)
            tr = Trainer(opt)
            return tr, _synthetic_batch(opt, B=args.batch)

        if 'ab' in stages:
            for fuse in (0, 1):
                def ab():
                    tr, batch = build(fuse)
                    row = {}
                    row.update(bh.bench_train(tr, batch, args.batch,
                                              args.n1, args.n2))
                    row.update(bh.bench_eval(tr, batch, args.batch,
                                             args.n1, args.n2))
                    return row
                run_stage(f'ab_fuse{fuse}', ab)
        if 'scan' in stages:
            # cross-step fused word scan (ops/dsa_scan.py) A/B: the whole
            # teacher-forcing loop in one launch vs the stepwise kernels
            def scan_ab(fuse):
                def run():
                    opt = _flagship_opt(frame_embedding_num=200,
                                        max_caption_len=20,
                                        tpu_mesh_data=1,
                                        dsa_scan_fuse=fuse)
                    tr = Trainer(opt)
                    batch = _synthetic_batch(opt, B=args.batch)
                    return bh.bench_train(tr, batch, args.batch,
                                          args.n1, args.n2)
                return run
            for fuse in (0, 1):
                run_stage(f'scan_fuse{fuse}', scan_ab(fuse))
        if 'greedy' in stages:
            # cross-step fused greedy decode (ops/dsa_greedy.py) A/B on
            # the eval step: argmax feedback + vocab projection inside
            # one launch vs the stepwise lax.scan
            def greedy_ab(fuse):
                def run():
                    opt = _flagship_opt(frame_embedding_num=200,
                                        max_caption_len=20,
                                        tpu_mesh_data=1,
                                        dsa_greedy_fuse=fuse)
                    tr = Trainer(opt)
                    batch = _synthetic_batch(opt, B=args.batch)
                    return bh.bench_eval(tr, batch, args.batch,
                                         args.n1, args.n2)
                return run
            for fuse in (0, 1):
                run_stage(f'greedy_fuse{fuse}', greedy_ab(fuse))
        if 'trunk_fwd' in stages:
            # trunk sampling impl A/B: the dense XLA one-hot-matmul
            # formulation vs the Pallas kernel (the 'auto' default is
            # dense — models/pdvc.py::resolve_trunk_impl)
            def trunk_impl_ab(impl):
                def run():
                    opt = _flagship_opt(frame_embedding_num=200,
                                        max_caption_len=20,
                                        tpu_mesh_data=1,
                                        msda_trunk_impl=impl)
                    tr = Trainer(opt)
                    batch = _synthetic_batch(opt, B=args.batch)
                    row = {}
                    row.update(bh.bench_train(tr, batch, args.batch,
                                              args.n1, args.n2))
                    row.update(bh.bench_eval(tr, batch, args.batch,
                                             args.n1, args.n2))
                    return row
                return run
            for impl in ('dense', 'pallas'):
                run_stage(f'trunk_fwd_{impl}', trunk_impl_ab(impl))
        if 'tanh' in stages:
            # in-kernel tanh dtype A/B: the fused scans' additive-attention
            # tanh on bf16 lanes (DVC_DSA_TANH=bf16, a documented numerics
            # deviation) vs the f32 native default
            def tanh_ab(impl):
                def run():
                    import dvc_tpu.ops.dsa_step as dsa_mod
                    dsa_mod._TANH_IMPL = impl
                    try:
                        tr, batch = build(0)
                        row = {}
                        row.update(bh.bench_train(tr, batch, args.batch,
                                                  args.n1, args.n2))
                        row.update(bh.bench_eval(tr, batch, args.batch,
                                                 args.n1, args.n2))
                    finally:
                        dsa_mod._TANH_IMPL = None
                    return row
                return run
            for impl in ('native', 'bf16'):
                run_stage(f'tanh_{impl}', tanh_ab(impl))
        tr, batch = build(0)
        if 'trunk' in stages:
            run_stage('trunk', lambda: bh.bench_trunk(
                tr, batch, args.batch, args.n1, args.n2))
        if 'matcher' in stages:
            run_stage('matcher', lambda: bh.bench_matcher(
                args.batch, args.n1, args.n2))
        if 'post' in stages:
            run_stage('post', lambda: bh.bench_post(
                tr, batch, args.batch, args.n1, args.n2))

    # ---- recommendations
    rec = {}
    k = results.get('kernel', {})
    if 'kernel_fwdbwd_ms_rational' in k:
        rec['tanh_rational_wins'] = bool(
            k['kernel_fwdbwd_ms_rational'] < 0.95 *
            k['kernel_fwdbwd_ms_native'])
    a0 = results.get('ab_fuse0', {})
    a1 = results.get('ab_fuse1', {})
    if 'train_step_ms' in a0 and 'train_step_ms' in a1:
        rec['lstm_fuse_wins_train'] = bool(
            a1['train_step_ms'] < 0.97 * a0['train_step_ms'])
        rec['lstm_fuse_wins_eval'] = bool(
            a1['eval_step_ms'] < 0.97 * a0['eval_step_ms'])
    s0 = results.get('scan_fuse0', {})
    s1 = results.get('scan_fuse1', {})
    if 'train_step_ms' in s0 and 'train_step_ms' in s1:
        rec['scan_fuse_wins_train'] = bool(
            s1['train_step_ms'] < 0.97 * s0['train_step_ms'])
    g0 = results.get('greedy_fuse0', {})
    g1 = results.get('greedy_fuse1', {})
    if 'eval_step_ms' in g0 and 'eval_step_ms' in g1:
        rec['greedy_fuse_wins_eval'] = bool(
            g1['eval_step_ms'] < 0.97 * g0['eval_step_ms'])
    t0_ = results.get('tanh_native', {})
    t1_ = results.get('tanh_bf16', {})
    if 'train_step_ms' in t0_ and 'train_step_ms' in t1_:
        rec['tanh_bf16_wins_train'] = bool(
            t1_['train_step_ms'] < 0.97 * t0_['train_step_ms'])
    td = results.get('trunk_fwd_dense', {})
    tp = results.get('trunk_fwd_pallas', {})
    if 'train_step_ms' in td and 'train_step_ms' in tp:
        rec['trunk_dense_wins'] = bool(
            td['train_step_ms'] < 0.97 * tp['train_step_ms'])
    rec['wall_s'] = round(time.time() - t0, 1)
    emit('recommendations', rec)
    if rec.get('tanh_rational_wins'):
        print("FLIP: set _TANH_DEFAULT = 'rational' in dvc_tpu/ops/"
              "dsa_step.py")
    if rec.get('lstm_fuse_wins_train'):
        print('FLIP: default dsa_lstm_fuse on (config.py, PDVCConfig, '
              'DSACaptionHead.lstm_fuse)')
    if rec.get('scan_fuse_wins_train'):
        print('FLIP: default dsa_scan_fuse on (config.py, PDVCConfig, '
              'DSACaptionHead.scan_fuse)')
    if rec.get('greedy_fuse_wins_eval'):
        print('FLIP: default dsa_greedy_fuse on (config.py, PDVCConfig, '
              'DSACaptionHead.greedy_fuse)')
    if rec.get('trunk_dense_wins') is False:
        print('FLIP: trunk auto should resolve to pallas again '
              '(models/pdvc.py::resolve_trunk_impl)')
    print('Update BENCHMARKS.md with the new rows and re-run bench.py.')
    return 0


if __name__ == '__main__':
    sys.exit(main())
