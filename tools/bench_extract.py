#!/usr/bin/env python
"""Honest in-graph benchmark (+ optional device profile) of TSP feature
extraction — the backbone forward on (B, clip_len, H, W, 3) clips.

Same two-point dynamic-trip-count fori protocol as tools/bench_honest.py
(see BENCHMARKS.md "Timing protocol" for why wall-clock dispatch timing
lies on this box).  Reports ms/clip, clips/s and analytic MFU from XLA
cost analysis.

    python tools/bench_extract.py [--backbone mvit_v2_s] [--batch 8]
                                  [--dtype bfloat16] [--profile DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--backbone', default='mvit_v2_s')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--clip-len', type=int, default=16)
    ap.add_argument('--dtype', default='bfloat16',
                    choices=['float32', 'bfloat16'])
    ap.add_argument('--n1', type=int, default=8)
    ap.add_argument('--n2', type=int, default=24)
    ap.add_argument('--profile', default=None,
                    help='also capture a jax.profiler trace into this dir')
    ap.add_argument('--top', type=int, default=30)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from dvc_tpu.models.tsp import FeatureExtractor
    from dvc_tpu.train.trainer import enable_compilation_cache

    enable_compilation_cache()
    ex = FeatureExtractor(args.backbone, clip_len=args.clip_len,
                          dtype=args.dtype)
    hw = ex.input_hw
    rng = np.random.default_rng(0)
    # f32 input + in-graph cast, matching extract_video: a bf16 host
    # transfer measured 10.6 ms/clip vs 4.82 this way (the bf16 (2,1)
    # sub-tiled layout slows the patchify data-formatting passes far
    # more than the cast+transfer it saves)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, args.clip_len, hw, hw, 3)).astype(np.float32))

    def fwd(x):
        if args.dtype == 'bfloat16':
            x = x.astype(jnp.bfloat16)
        _, feats = ex.model.apply(ex.variables, x, return_features=True)
        return feats.astype(jnp.float32)

    @jax.jit
    def prog(n, x):
        def body(i, carry):
            acc, x = carry
            feats = fwd(x + jnp.sin(acc) * 1e-12)
            return jnp.sum(feats) * 1e-6, x
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), x))[0]

    def timed(n):
        t0 = time.perf_counter()
        v = jax.device_get(prog(jnp.int32(n), x))
        return time.perf_counter() - t0, v

    timed(args.n1)
    timed(args.n2)
    t1, _ = timed(args.n1)
    t2, _ = timed(args.n2)
    ms = (t2 - t1) / (args.n2 - args.n1) * 1e3
    row = {'backend': jax.default_backend(), 'backbone': args.backbone,
           'batch': args.batch, 'dtype': args.dtype,
           'protocol': f'in-graph fori diff N{args.n1}/N{args.n2}',
           'step_ms': round(ms, 2),
           'ms_per_clip': round(ms / args.batch, 2),
           'clips_per_sec': round(args.batch / ms * 1e3, 1)}

    # analytic FLOPs/bytes of the single compiled forward
    try:
        lowered = jax.jit(fwd).lower(x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
        peak = 197e12 if args.dtype == 'bfloat16' else 49e12
        row['gflops_per_clip'] = round(flops / args.batch / 1e9, 1)
        row['mfu'] = round(flops / (ms / 1e3) / peak, 4)
    except Exception as e:  # noqa: BLE001
        row['cost_error'] = str(e)
    print(json.dumps(row))

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.device_get(prog(jnp.int32(6), x))
        from tools.profile_step import summarize
        summary = summarize(args.profile, args.top)
        print(json.dumps(summary, indent=1))


if __name__ == '__main__':
    main()
