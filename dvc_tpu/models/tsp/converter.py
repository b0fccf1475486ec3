"""Torch-checkpoint -> flax parameter conversion for the TSP backbones.

The reference loads torchvision/IG65M ``.pth`` state dicts
(``video_backbone/TSP/models/backbone.py:31-37``, ``extract_features.py:203-211``);
users migrating to this framework bring those files.  This maps torch
parameter names/layouts onto the flax trees of ``backbones.py``:

* conv weights: torch (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)
* linear weights: torch (O, I) -> flax (I, O)
* batch norm: weight/bias -> scale/bias; running stats -> batch_stats

Two families are mapped name-for-name:

* ``convert_videoresnet`` — torchvision VideoResNet state dicts (r3d_18,
  r2plus1d_18/34, IG65M).
* ``convert_mvit`` — torchvision ``mvit_v2_s`` state dicts (Kinetics-400
  weights, reference backbone.py:46-50) and TSP fine-tune ``.pth``
  checkpoints whose backbone keys carry a ``features.`` prefix
  (reference TSPmodel.py:31, e.g. the author's ``mvit_tsp.pth``).  Every
  mapped tensor's shape is validated against the flax init tree when one
  is provided; mismatches raise with the offending names rather than
  producing silently-garbage features.
"""

from __future__ import annotations

import numpy as np


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _t_lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_videoresnet(state_dict, layers=(3, 4, 6, 3),
                        conv_type='r2plus1d'):
    """torchvision VideoResNet state dict -> (params, batch_stats) trees."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def bn(dst, src):
        put(params, dst + ('scale',), sd[src + '.weight'])
        put(params, dst + ('bias',), sd[src + '.bias'])
        put(stats, dst + ('mean',), sd[src + '.running_mean'])
        put(stats, dst + ('var',), sd[src + '.running_var'])

    if conv_type == 'r2plus1d':
        put(params, ('stem_conv_s', 'kernel'), _t_conv(sd['stem.0.weight']))
        bn(('stem_bn_s',), 'stem.1')
        put(params, ('stem_conv_t', 'kernel'), _t_conv(sd['stem.3.weight']))
        bn(('stem_bn',), 'stem.4')
    else:
        put(params, ('stem_conv', 'kernel'), _t_conv(sd['stem.0.weight']))
        bn(('stem_bn',), 'stem.1')

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f'layer{stage + 1}.{b}'
            dst = f'layer{stage + 1}_{b}'
            for ci in (1, 2):
                if conv_type == 'r2plus1d':
                    put(params, (dst, f'conv{ci}', 'conv_s', 'kernel'),
                        _t_conv(sd[f'{src}.conv{ci}.0.0.weight']))
                    bn((dst, f'conv{ci}', 'bn_mid'), f'{src}.conv{ci}.0.1')
                    put(params, (dst, f'conv{ci}', 'conv_t', 'kernel'),
                        _t_conv(sd[f'{src}.conv{ci}.0.3.weight']))
                    bn((dst, f'bn{ci}'), f'{src}.conv{ci}.1')
                else:
                    put(params, (dst, f'conv{ci}', 'conv', 'kernel'),
                        _t_conv(sd[f'{src}.conv{ci}.0.weight']))
                    bn((dst, f'bn{ci}'), f'{src}.conv{ci}.1')
            if f'{src}.downsample.0.weight' in sd:
                put(params, (dst, 'downsample_conv', 'kernel'),
                    _t_conv(sd[f'{src}.downsample.0.weight']))
                bn((dst, 'downsample_bn'), f'{src}.downsample.1')
    return params, stats


def _t_pool(w):
    # depthwise conv3d weight (D, 1, 3, 3, 3) -> (3, 3, 3, D)
    w = np.asarray(w)
    return np.transpose(w[:, 0], (1, 2, 3, 0))


# torch keys that legitimately remain unconsumed by the backbone mapping
_MVIT_IGNORABLE = ('head.', 'num_batches_tracked')


def convert_mvit(state_dict, flax_params=None):
    """torchvision ``mvit_v2_s`` state dict -> flax ``MViTV2`` params.

    Handles both raw torchvision checkpoints (``conv_proj.*``,
    ``blocks.{i}.*``, ``norm.*``) and TSP fine-tunes where the backbone
    lives under ``features.`` (reference TSPmodel.py:31) or ``backbone.``.

    Returns ``(params, heads)`` where ``heads`` maps any TSP classifier
    weights found (``fc`` / ``fc1`` / ``fc2``) to flax Dense subtrees.

    If ``flax_params`` (the model's init param tree) is given, every mapped
    leaf is shape-checked against it and a ``ValueError`` naming each
    mismatch is raised — a wrong block table or a non-224/16 input size
    fails loudly instead of producing garbage features.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        sd[k] = np.asarray(v)

    prefix = ''
    for cand in ('features.', 'backbone.'):
        if any(k.startswith(cand + 'conv_proj.') for k in sd):
            prefix = cand
            break
    if not any(k.startswith(prefix + 'conv_proj.') for k in sd):
        raise ValueError(
            'convert_mvit: no MViT patch-embed (conv_proj.*) found in the '
            'state dict — is this really a torchvision mvit_v2_s / TSP-MViT '
            f'checkpoint?  First keys: {sorted(sd)[:5]}')

    used = set()

    def take(key):
        full = prefix + key
        if full not in sd:
            raise ValueError(
                f'convert_mvit: expected torch key "{full}" not found; the '
                'checkpoint layout does not match torchvision mvit_v2_s')
        used.add(full)
        return sd[full]

    def has(key):
        return (prefix + key) in sd

    params: dict = {}

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def lin(dst, src):
        put(dst + ('kernel',), _t_lin(take(src + '.weight')))
        put(dst + ('bias',), take(src + '.bias'))

    def ln(dst, src):
        put(dst + ('scale',), take(src + '.weight'))
        put(dst + ('bias',), take(src + '.bias'))

    put(('patch_embed', 'kernel'), _t_conv(take('conv_proj.weight')))
    put(('patch_embed', 'bias'), take('conv_proj.bias'))
    put(('cls_token',), take('pos_encoding.class_token').reshape(-1))

    n_blocks = 0
    while has(f'blocks.{n_blocks}.norm1.weight'):
        n_blocks += 1
    if n_blocks == 0:
        raise ValueError('convert_mvit: no transformer blocks found')

    # Golden-manifest insurance: a 16-block checkpoint trained at the
    # canonical 16x224x224 input (rel_pos_t of 2*8-1 rows) must carry
    # torchvision's exact mvit_v2_s layout (see mvit_manifest.py) — this
    # catches naming/layout drift that the flax-tree shape check cannot
    # (both sides of the tiny-model parity test share one transcription).
    if (n_blocks == 16 and has('blocks.0.attn.rel_pos_t')
            and sd[prefix + 'blocks.0.attn.rel_pos_t'].shape[0] == 15):
        from .mvit_manifest import validate_against_manifest
        deviations = validate_against_manifest(sd, prefix)
        if deviations:
            raise ValueError(
                'convert_mvit: checkpoint deviates from the torchvision '
                'mvit_v2_s golden manifest:\n  '
                + '\n  '.join(deviations[:12]))

    for i in range(n_blocks):
        src = f'blocks.{i}'
        dst = f'block_{i}'
        ln((dst, 'norm1'), f'{src}.norm1')
        ln((dst, 'norm2'), f'{src}.norm2')
        lin((dst, 'attn', 'qkv'), f'{src}.attn.qkv')
        lin((dst, 'attn', 'proj'), f'{src}.attn.project.0')
        for p in ('pool_q', 'pool_k', 'pool_v'):
            put((dst, 'attn', p, 'kernel'),
                _t_pool(take(f'{src}.attn.{p}.pool.weight')))
            ln((dst, 'attn', p, 'norm'), f'{src}.attn.{p}.norm_act.0')
        for r in ('rel_pos_t', 'rel_pos_h', 'rel_pos_w'):
            put((dst, 'attn', r), take(f'{src}.attn.{r}'))
        if has(f'{src}.project.weight'):
            lin((dst, 'shortcut_proj'), f'{src}.project')
        # torchvision MLP: Linear(0), GELU(1), Dropout(2), Linear(3), Dropout
        fc2_idx = 3 if has(f'{src}.mlp.3.weight') else 2
        lin((dst, 'mlp_fc1'), f'{src}.mlp.0')
        lin((dst, 'mlp_fc2'), f'{src}.mlp.{fc2_idx}')

    ln(('norm',), 'norm')

    # optional TSP classifier heads next to the backbone prefix
    heads: dict = {}
    for fc in ('fc', 'fc1', 'fc2'):
        if f'{fc}.weight' in sd:
            heads[fc] = {'kernel': _t_lin(sd[f'{fc}.weight']),
                         'bias': sd[f'{fc}.bias']}
            used.update({f'{fc}.weight', f'{fc}.bias'})

    leftovers = [k for k in sd if k not in used
                 and not any(p in k for p in _MVIT_IGNORABLE)]
    if leftovers:
        raise ValueError(
            'convert_mvit: unconsumed checkpoint tensors (layout mismatch '
            f'with torchvision mvit_v2_s): {sorted(leftovers)[:10]}')

    if flax_params is not None:
        mismatches = _shape_mismatches(flax_params, params)
        if mismatches:
            raise ValueError(
                'convert_mvit: converted shapes do not match the flax MViTV2 '
                'tree (wrong input size? mvit_v2_s expects 16x224x224 '
                'clips):\n  ' + '\n  '.join(mismatches[:12]))
    return params, heads


def _shape_mismatches(expect_tree, got_tree, path=''):
    """Recursively diff two nested param dicts by key set and leaf shape."""
    out = []
    ek = set(expect_tree)
    gk = set(got_tree)
    for k in sorted(ek - gk):
        out.append(f'{path}{k}: missing from checkpoint')
    for k in sorted(gk - ek):
        out.append(f'{path}{k}: unexpected (not in flax tree)')
    for k in sorted(ek & gk):
        e, g = expect_tree[k], got_tree[k]
        if isinstance(e, dict) and isinstance(g, dict):
            out.extend(_shape_mismatches(e, g, f'{path}{k}/'))
        elif isinstance(e, dict) != isinstance(g, dict):
            out.append(f'{path}{k}: tree/leaf mismatch')
        elif tuple(np.shape(e)) != tuple(np.shape(g)):
            out.append(f'{path}{k}: flax {tuple(np.shape(e))} vs '
                       f'checkpoint {tuple(np.shape(g))}')
    return out


def load_torch_state_dict(path: str):
    """Load a .pth state dict without requiring CUDA."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(obj, dict) and 'model' in obj:
        obj = obj['model']
    if isinstance(obj, dict) and 'state_dict' in obj:
        obj = obj['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else v
            for k, v in obj.items()}
