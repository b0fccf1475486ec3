#!/usr/bin/env python
"""Training-throughput benchmark on the flagship PDVC configuration.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: YC2-class training throughput, videos/sec/chip, on the
yc2_newModel_sound model (FusionPDVC: 32-head visual self-attention +
audio cross-attention over synthetic HuBERT features + 3-layer deformable
transformer, d=512, Nq=100, T=200 frames, 768-d features, LSTM-DSA caption
head) with synthetic data (feature-mode training is compute-bound on the
model, not the loader).  BENCH_MODEL=pdvc benches the bare PDVC at the
same shape (the round-1..4 headline surface) for a like-for-like delta.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.json's target is >=5x A100 training throughput; the reference's
torch loop is single-video (batch_size=1, reference opts.py:102) with a
per-step host sync for scipy Hungarian matching, which bounds it at roughly
NOMINAL_REF_VPS videos/sec on an A100-class GPU. vs_baseline is measured
against that documented estimate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NOMINAL_REF_VPS = 10.0  # documented A100-class estimate for the torch loop

def main():
    from dvc_tpu.train.trainer import ensure_cpu_backend
    ensure_cpu_backend()
    import jax

    # The axon backend blocks FOREVER inside backend init when the TPU
    # tunnel is down (observed: >570s, no error, GIL held — an in-process
    # watchdog thread cannot fire).  A hung bench would stall the whole
    # round-end pipeline, so probe backend init in a SUBPROCESS with a
    # timeout and bail with a diagnostic line if it never comes up.
    init_timeout = float(os.environ.get('BENCH_INIT_TIMEOUT', '900'))
    if (jax.config.jax_platforms or '').startswith('axon'):
        import subprocess
        try:
            subprocess.run(
                [sys.executable, '-c',
                 'import jax; jax.devices(); print("up")'],
                timeout=init_timeout, check=True, capture_output=True)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print(json.dumps({
                'metric': 'train_throughput_videos_per_sec_per_chip',
                'value': None, 'unit': 'videos/s', 'vs_baseline': None,
                'error': 'TPU backend init did not complete within '
                         f'{init_timeout:.0f}s (axon tunnel unreachable); '
                         'no measurement taken — see BENCHMARKS.md for the '
                         'last validated numbers',
            }), flush=True)
            sys.exit(3)

    from __graft_entry__ import _flagship_opt, _synthetic_batch
    from dvc_tpu.train import Trainer

    import jax.numpy as jnp

    from dvc_tpu.parallel.mesh import shard_batch

    B = int(os.environ.get('BENCH_BATCH', '16'))
    model_kind = os.environ.get('BENCH_MODEL', 'fusion')
    opt = _flagship_opt(frame_embedding_num=200, max_caption_len=20,
                        tpu_mesh_data=1)
    from dvc_tpu.train.trainer import step_prng_key

    if model_kind == 'fusion':
        from newTrain import make_fusion_trainer
        fd = os.environ.get('BENCH_FUSION_DTYPE')
        if fd:
            opt.fusion_dtype = fd
        trainer = make_fusion_trainer(opt)
    else:
        trainer = Trainer(opt)
    batch = _synthetic_batch(opt, B=B, with_sound=model_kind == 'fusion')
    state = trainer.init_state(batch)
    rng = step_prng_key(opt, 0)
    # device-resident input: the training pipeline prefetches/overlaps the
    # host->device copy (dvc_tpu/data/prefetch.py), so sustained throughput
    # is the compiled step rate, measured here on a pre-staged batch
    batch = shard_batch(batch, trainer.mesh)
    step = trainer._train_step_impl

    # Two-point in-graph protocol (BENCHMARKS.md "Timing protocol"): N
    # dependent optimizer steps inside ONE jitted fori_loop (each step's
    # input is perturbed by the previous loss, so XLA can neither hoist
    # nor parallelize the body), fetch the result VALUE, and difference
    # two trip counts to cancel the per-dispatch RPC latency of the
    # tunneled link (~30-45 ms, which a dispatch-loop timing would
    # otherwise book against the step).
    n1 = int(os.environ.get('BENCH_STEPS_N1', '8'))
    n2 = int(os.environ.get('BENCH_STEPS_N2', '38'))
    lr = jnp.float32(5e-5)
    ssp = jnp.float32(0.0)

    @jax.jit
    def prog(n, params, opt_state):
        def body(i, carry):
            params, opt_state, acc = carry
            b = dict(batch)
            b['video_tensor'] = (batch['video_tensor']
                                 + jnp.sin(acc) * 1e-12)
            params, opt_state, losses = step(
                params, opt_state, b, lr, ssp, jax.random.fold_in(rng, i))
            return params, opt_state, losses['total_loss']
        carry = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return carry[2]

    def timed(n):
        t0 = time.perf_counter()
        v = jax.device_get(prog(jnp.int32(n), state['params'],
                                state['opt_state']))
        assert v == v, 'non-finite loss'
        return time.perf_counter() - t0

    timed(n1)           # compile + warm
    timed(n2)           # warm the second trip count
    dt = timed(n2) - timed(n1)

    vps = (n2 - n1) * B / dt
    step_s = dt / (n2 - n1)

    # MFU / roofline: XLA cost analysis of the single compiled train step
    # against the chip's bf16 peak (judging criterion; BENCHMARKS.md
    # "Roofline" section).  Guarded — a missing cost-analysis impl or a
    # flaky tunnel must not lose the throughput number.
    roof = None
    if os.environ.get('BENCH_MFU', '1') != '0':
        try:
            from dvc_tpu.utils.roofline import compiled_costs, roofline
            costs = compiled_costs(
                lambda p, o, b: step(p, o, b, lr, ssp, rng),
                state['params'], state['opt_state'], batch)
            roof = roofline(costs, step_s)
        except Exception:
            roof = None

    # Eval-step throughput (greedy decode of all Nq queries + heads),
    # same in-graph two-point protocol.  Guarded: the headline train
    # number must survive any eval-side failure.
    eval_extra = {}
    if os.environ.get('BENCH_EVAL', '1') != '0':
        try:
            apply = trainer.model.apply

            @jax.jit
            def eprog(n, params):
                def body(i, acc):
                    b = dict(batch)
                    b['video_tensor'] = (batch['video_tensor']
                                         + jnp.sin(acc) * 1e-12)
                    out, _ = apply(params, b, eval_mode=True)
                    return (jnp.sum(out['cap_prob_eval'])
                            + jnp.sum(out['pred_boxes'])) * 1e-6
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            def etimed(n):
                t0 = time.perf_counter()
                v = jax.device_get(eprog(jnp.int32(n), state['params']))
                assert v == v, 'non-finite eval probe'
                return time.perf_counter() - t0

            etimed(n1)
            etimed(n2)
            edt = etimed(n2) - etimed(n1)
            eval_extra = {
                'eval_step_ms': round(edt / (n2 - n1) * 1e3, 3),
                'eval_videos_per_sec': round((n2 - n1) * B / edt, 3),
            }
        except Exception as e:
            # headline must survive, but a silent {} is indistinguishable
            # from BENCH_EVAL=0 — leave a trace (ADVICE r04)
            print(f'eval probe failed: {e!r}', file=sys.stderr)
            eval_extra = {}

    rec = {
        'metric': 'train_throughput_videos_per_sec_per_chip',
        'value': round(vps, 3),
        'unit': 'videos/s',
        'vs_baseline': round(vps / NOMINAL_REF_VPS, 3),
        'baseline_note': ('denominator is a documented nominal estimate of '
                          f'{NOMINAL_REF_VPS} videos/s for the reference '
                          'torch loop (no published throughput); see '
                          'BENCHMARKS.md'),
        'step_ms': round(step_s * 1e3, 3),
        'batch': B,
        'model': ('FusionPDVC (yc2_newModel_sound: visual self-attn + '
                  'audio cross-attn + PDVC)' if model_kind == 'fusion'
                  else 'PDVC (bare, fusion-recipe shape)'),
    }
    if roof:
        rec['mfu'] = roof['mfu']
        rec['flops_per_step'] = roof['flops_per_step']
        if 'hbm_util' in roof:
            rec['hbm_util'] = roof['hbm_util']
            rec['roofline_pct'] = roof['roofline_pct']
    rec.update(eval_extra)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
