#!/usr/bin/env python
"""Turnkey data-parallel scaling benchmark over a chip mesh.

Run as-is on a real multi-chip TPU slice:

    python tools/bench_scaling.py                  # sweep 1,2,4,... chips
    python tools/bench_scaling.py --chips 2 4 8    # explicit sweep
    python tools/bench_scaling.py --out BENCH_SCALING.json

Each sweep point jits the FULL flagship train step (FusionPDVC by default,
``--model pdvc`` for the bare model) over a ``Mesh`` with that many
devices on the data axis — same per-chip batch, so perfect scaling is a
flat step time; the psum gradient reduction over ICI is the only added
work.  Reported per point: step_ms, videos/s (global and per chip),
scaling efficiency vs the 1-chip point, and the psum overhead in ms.

No multi-chip hardware around?  ``--virtual 8`` runs the identical
plumbing on 8 virtual CPU devices (XLA host platform) at tiny shapes —
numbers are meaningless but the mesh/shard/collective path is the one a
real slice will execute (this mode is what the test suite pins).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--chips', type=int, nargs='+', default=None,
                   help='device counts to sweep (default: 1,2,4,... up to '
                        'the available devices)')
    p.add_argument('--batch-per-chip', type=int, default=16)
    p.add_argument('--model', choices=['fusion', 'pdvc'], default='fusion')
    p.add_argument('--virtual', type=int, default=0,
                   help='N>0: run on N virtual CPU devices (plumbing '
                        'validation; tiny shapes unless --full-shapes)')
    p.add_argument('--full-shapes', action='store_true',
                   help='with --virtual: keep the flagship shapes')
    p.add_argument('--n1', type=int, default=4)
    p.add_argument('--n2', type=int, default=12)
    p.add_argument('--out', type=str, default=None,
                   help='also write the sweep JSON here')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.virtual:
        flags = os.environ.get('XLA_FLAGS', '')
        if 'xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                flags +
                f' --xla_force_host_platform_device_count={args.virtual}'
            ).strip()
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
        import jax
        try:
            jax.config.update('jax_platforms', 'cpu')
        except Exception:
            pass
    else:
        import jax

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_opt, _synthetic_batch
    from dvc_tpu.parallel.mesh import make_mesh, shard_batch
    from dvc_tpu.train.trainer import (enable_compilation_cache,
                                       step_prng_key)

    enable_compilation_cache()
    devices = jax.devices()
    if args.chips is None:
        chips, n = [], 1
        while n <= len(devices):
            chips.append(n)
            n *= 2
    else:
        chips = args.chips
    if max(chips) > len(devices):
        raise SystemExit(f'asked for {max(chips)} devices, '
                         f'only {len(devices)} visible')

    shape_kw = dict(frame_embedding_num=200, max_caption_len=20)
    if args.virtual and not args.full_shapes:
        shape_kw = dict(frame_embedding_num=32, hidden_dim=128, nheads=8,
                        transformer_ff_dim=128, num_queries=16,
                        input_encoding_size=64, rnn_size=128,
                        att_hid_size=64, gt_proposal_sample_num=4,
                        max_caption_len=8, feature_dim=64, cap_nheads=8)
    # off real TPU cores the Pallas kernels can't compile — pin the
    # XLA-portable formulation (same policy as dryrun_multichip)
    impl_kw = dict(msda_impl='dense') if args.virtual else {}

    rows = []
    for n in chips:
        opt = _flagship_opt(tpu_mesh_data=n, **shape_kw, **impl_kw)
        mesh = make_mesh(n_data=n, devices=devices[:n])
        if args.model == 'fusion':
            from newTrain import make_fusion_trainer
            trainer = make_fusion_trainer(opt, mesh=mesh)
        else:
            from dvc_tpu.train import Trainer
            trainer = Trainer(opt, mesh=mesh)
        B = args.batch_per_chip * n
        batch = _synthetic_batch(opt, B=B,
                                 with_sound=args.model == 'fusion')
        state = trainer.init_state(batch)
        rng = step_prng_key(opt, 0)
        batch = shard_batch(batch, mesh)
        step = trainer._train_step_impl
        lr = jnp.float32(5e-5)
        ssp = jnp.float32(0.0)

        # two-point in-graph protocol (bench.py / BENCHMARKS.md "Timing
        # protocol"): dependent steps inside one fori_loop, differenced
        # trip counts cancel dispatch latency
        @jax.jit
        def prog(nsteps, params, opt_state):
            def body(i, carry):
                params, opt_state, acc = carry
                b = dict(batch)
                b['video_tensor'] = (batch['video_tensor']
                                     + jnp.sin(acc) * 1e-12)
                params, opt_state, losses = step(
                    params, opt_state, b, lr, ssp,
                    jax.random.fold_in(rng, i))
                return params, opt_state, losses['total_loss']
            return jax.lax.fori_loop(
                0, nsteps, body,
                (params, opt_state, jnp.float32(0.0)))[2]

        def timed(k):
            t0 = time.perf_counter()
            v = jax.device_get(prog(jnp.int32(k), state['params'],
                                    state['opt_state']))
            assert v == v, 'non-finite loss'
            return time.perf_counter() - t0

        timed(args.n1)
        timed(args.n2)
        dt = timed(args.n2) - timed(args.n1)
        step_ms = dt / (args.n2 - args.n1) * 1e3
        rows.append({'chips': n, 'batch_global': B,
                     'step_ms': round(step_ms, 3),
                     'videos_per_sec': round(B / step_ms * 1e3, 2),
                     'videos_per_sec_per_chip':
                         round(B / step_ms * 1e3 / n, 2)})
        print(json.dumps(rows[-1]), flush=True)

    # baseline = the 1-chip point when the sweep contains one; otherwise
    # the smallest sweep point, named explicitly so a --chips 2 4 8 run
    # cannot silently pass off 2-chip-rebased efficiencies as absolute
    base = next((r for r in rows if r['chips'] == 1), rows[0])
    for r in rows:
        r['scaling_efficiency'] = round(
            r['videos_per_sec_per_chip'] /
            base['videos_per_sec_per_chip'], 4)
        r['psum_overhead_ms'] = round(r['step_ms'] - base['step_ms'], 3)
    summary = {'metric': 'dp_scaling_sweep', 'model': args.model,
               'virtual': bool(args.virtual),
               'baseline_chips': base['chips'],
               'platform': jax.default_backend(), 'rows': rows}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(summary, f, indent=1)
    return summary


if __name__ == '__main__':
    main()
