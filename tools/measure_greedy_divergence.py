#!/usr/bin/env python
"""Measure the fused-greedy-decode token divergence on REAL hardware.

PARITY.md's deviation note: the on-device fused greedy decode
(``ops/dsa_greedy.py``, default on) can pick different tokens than a CPU
decode at argmax near-ties — chained platform matmul noise perturbs logits
at the ulp level, and ``--dsa_greedy_fuse 0`` restores the stepwise path.
This tool turns "rare" into a number: it decodes the SAME random
checkpoints/queries at flagship head shapes with

  * the fused Pallas kernel on the TPU (the default eval path), and
  * the stepwise reference formulation on the host CPU backend,

and reports the fraction of diverging tokens/sequences as one JSON line.
The CPU-only formulation cross-check lives in
``tests/test_greedy_divergence.py`` (slow lane).

    python tools/measure_greedy_divergence.py --seeds 10
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--seeds', type=int, default=10)
    p.add_argument('--queries', type=int, default=100)
    p.add_argument('--logit-bias-sigma', type=float, default=0.0,
                   help='add N(0, sigma) to the vocab-projection bias '
                        'after init. Random init gives near-uniform '
                        'logits (argmax ties everywhere — the worst '
                        'case); a per-token bias widens the top-1 gap '
                        'relative to the platform noise, emulating a '
                        'trained checkpoint\'s peaked logits. (A '
                        'multiplicative logit scale is provably inert '
                        'here: it scales the tie gaps and the noise by '
                        'the same factor.)')
    p.add_argument('--out', type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from dvc_tpu.models.caption_heads import DSACaptionHead
    from dvc_tpu.train.trainer import enable_compilation_cache

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tests'))
    from test_greedy_divergence import flagship_head_cfg, make_head_inputs

    enable_compilation_cache()
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend='cpu')[0]
    on_tpu = dev.platform != 'cpu'
    cfg = flagship_head_cfg()
    ts = (32, 16, 8, 4)
    # the default eval path on device ('auto' resolves to the Pallas
    # kernel on TPU), vs the stepwise reference formulation on the host
    head_dev = DSACaptionHead(cfg, att_impl='auto', greedy_fuse=True)
    head_cpu = DSACaptionHead(cfg, att_impl='ref', greedy_fuse=False)

    def make_fn(h, device):
        @jax.jit
        def f(p, query, ref_c, scale, memory, pad_mask):
            return h.apply(p, query, ref_c, scale, memory, ts, pad_mask,
                           deterministic=True, mode='sample')
        return lambda p, *dyn: f(jax.device_put(p, device),
                                 *jax.device_put(dyn, device))

    run_dev = make_fn(head_dev, dev)
    run_cpu = make_fn(head_cpu, cpu)

    tokens = diverged = seqs = seq_div = 0
    for seed in range(args.seeds):
        rng = np.random.default_rng(1000 + seed)
        inputs = make_head_inputs(rng, cfg, Q=args.queries, ts=ts)
        with jax.default_device(cpu):
            params = head_cpu.init(jax.random.PRNGKey(seed), *inputs,
                                   deterministic=True, mode='sample')
        if args.logit_bias_sigma:
            def bias(path, x):
                if path and getattr(path[-1], 'key', '') == 'logit_b':
                    noise = jax.random.normal(
                        jax.random.PRNGKey(9000 + seed), x.shape)
                    return x + args.logit_bias_sigma * noise
                return x
            params = jax.tree_util.tree_map_with_path(bias, params)
        dyn = inputs[:4] + (inputs[5],)
        seq_c, _ = run_cpu(params, *dyn)
        seq_d, _ = run_dev(params, *dyn)
        a, b = np.asarray(seq_c), np.asarray(seq_d)
        mism = a != b
        tokens += a.size
        diverged += int(mism.sum())
        # a is (B, Q, K) — a "sequence" is one query's K-token decode:
        # reduce over the token axis
        assert a.shape[-1] == cfg.max_caption_len and \
            a.shape[-2] == args.queries, a.shape
        per_query = np.any(mism, axis=-1).reshape(-1)
        seqs += per_query.size
        seq_div += int(per_query.sum())
        print(f'seed {seed}: {int(mism.sum())}/{a.size} tokens diverged',
              file=sys.stderr)

    rec = {'metric': 'greedy_decode_token_divergence',
           'device': str(dev), 'device_is_tpu': on_tpu,
           'logit_bias_sigma': args.logit_bias_sigma,
           'seeds': args.seeds, 'queries_per_seed': args.queries,
           'tokens': tokens, 'tokens_diverged': diverged,
           'token_divergence_rate': diverged / max(tokens, 1),
           'sequences': seqs, 'sequences_diverged': seq_div,
           'sequence_divergence_rate': seq_div / max(seqs, 1)}
    print(json.dumps(rec))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(rec, f, indent=1)
    return rec


if __name__ == '__main__':
    main()
