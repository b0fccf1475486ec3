#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train step on the real chip.

Writes a TensorBoard-format trace (xplane.pb + trace.json.gz) under
``--out`` and, when the device plane is present, prints the top-N ops by
self time as JSON — the op-level decomposition that the in-graph A/B
bisects (tools/bench_honest.py) can only approximate subtractively.

On this box the TPU is reached through the axon tunnel; whether the PJRT
plugin exports a device plane is probed, not assumed — if only host planes
come back, the tool says so and the A/B protocol remains the arbiter.

    python tools/profile_step.py [--out /tmp/dvc_prof] [--steps 8] [--batch 16]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def capture(out_dir, steps, batch, frames, max_caption_len, what='train'):
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_opt, _synthetic_batch
    from dvc_tpu.train import Trainer
    from dvc_tpu.train.trainer import step_prng_key

    # the REAL flagship shapes (bench_honest.py defaults), not
    # _flagship_opt's reduced compile-check shapes
    opt = _flagship_opt(tpu_mesh_data=1, frame_embedding_num=frames,
                        max_caption_len=max_caption_len)
    batch_d = _synthetic_batch(opt, batch)
    trainer = Trainer(opt)
    state = trainer.init_state(batch_d)
    lr = jnp.float32(5e-5)
    ssp = jnp.float32(0.0)
    rng = step_prng_key(trainer.opt, 0)
    step = trainer._train_step_impl

    if what == 'train':
        @jax.jit
        def prog(n, params, opt_state):
            def body(i, carry):
                params, opt_state, acc = carry
                b = dict(batch_d)
                b['video_tensor'] = (batch_d['video_tensor']
                                     + jnp.sin(acc) * 1e-12)
                params, opt_state, losses = step(
                    params, opt_state, b, lr, ssp,
                    jax.random.fold_in(rng, i))
                return params, opt_state, losses['total_loss']
            return jax.lax.fori_loop(0, n, body,
                                     (params, opt_state, jnp.float32(0.0)))[2]
        args = (jnp.int32(steps), state['params'], state['opt_state'])
    elif what == 'eval':
        apply = trainer.model.apply

        @jax.jit
        def prog(n, params):
            def body(i, acc):
                b = dict(batch_d)
                b['video_tensor'] = (batch_d['video_tensor']
                                     + jnp.sin(acc) * 1e-12)
                out, _ = apply(params, b, eval_mode=True)
                return (jnp.sum(out['cap_prob_eval'])
                        + jnp.sum(out['pred_boxes'])) * 1e-6
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        args = (jnp.int32(steps), state['params'])
    else:
        raise SystemExit(f'--what must be train|eval, got {what!r}')

    v = jax.device_get(prog(*args))          # compile + warm outside trace
    print(f'warm value={v:.4f}', file=sys.stderr)
    with jax.profiler.trace(out_dir):
        v = jax.device_get(prog(*args))
    print(f'traced value={v:.4f}', file=sys.stderr)


def summarize(out_dir, top):
    """Best-effort parse of the trace.json.gz event dump."""
    traces = sorted(glob.glob(
        os.path.join(out_dir, '**', '*.trace.json.gz'), recursive=True))
    if not traces:
        return {'device_plane': False, 'note': 'no trace.json.gz produced'}
    with gzip.open(traces[-1], 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    # pid/tid name metadata tells us which lanes are device lanes
    names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            names[e['pid']] = e['args'].get('name', '')
    device_pids = {pid for pid, n in names.items()
                   if 'TPU' in n or 'tpu' in n.lower() or '/device' in n.lower()}
    by_name = {}
    for e in events:
        if e.get('ph') != 'X':
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        by_name.setdefault(e['name'], [0.0, 0])
        by_name[e['name']][0] += e.get('dur', 0) / 1e3     # us -> ms
        by_name[e['name']][1] += 1
    ranked = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:top]
    return {
        'device_plane': bool(device_pids),
        'planes': sorted(set(names.values())),
        'trace_file': traces[-1],
        'top_ops_ms': [
            {'name': n[:120], 'total_ms': round(t, 3), 'count': c}
            for n, (t, c) in ranked],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/dvc_prof')
    ap.add_argument('--steps', type=int, default=8)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--frames', type=int, default=200)
    ap.add_argument('--max-caption-len', type=int, default=20)
    ap.add_argument('--what', default='train', choices=['train', 'eval'])
    ap.add_argument('--summarize-only', action='store_true',
                    help='skip capture; parse an existing --out dir')
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.out, args.steps, args.batch, args.frames,
                args.max_caption_len, args.what)
    print(json.dumps(summarize(args.out, args.top), indent=1))


if __name__ == '__main__':
    main()
