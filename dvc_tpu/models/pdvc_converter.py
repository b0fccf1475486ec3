"""Reference (torch) PDVC checkpoint -> flax parameter conversion.

Lets users of the reference implementation load their trained PDVC ``.pth``
checkpoints (``save/*/model-best.pth``, saved as
``{'model': state_dict, ...}`` by reference ``train.py:230-238``) directly
into this framework's flax model, and powers the cross-implementation
forward-parity test (``tests/test_pdvc_torch_parity.py``).

Layout notes (torch key -> flax path):

* ``base_encoder.input_proj.{i}.0/.1`` (Conv1d + GroupNorm) ->
  ``base_encoder/input_proj_{i}`` + ``input_proj_{i}_norm``
* ``transformer.encoder.layers.{i}.*`` -> ``encoder_layer_{i}/*`` with
  norm2 -> ``ffn/norm`` (the flax FFN owns its post-norm)
* ``transformer.decoder.layers.{i}.*`` -> ``decoder_layer_{i}/*``; the
  packed ``self_attn.in_proj_weight`` splits into flax MHA q/k/v heads;
  norm3 -> ``ffn/norm``
* ``caption_head.{i}`` -> shared ``caption_head`` when all layer heads
  alias layer 0 (the reference default ``share_caption_head=1`` —
  pdvc.py:111-118), else per-layer ``caption_head_{i}``.
  Both the 'light' LSTM head (LSTM.py:141-174) and the 'standard' LSTM-DSA
  head (LSTM_DSA.py:189-270) convert; for the latter the per-step caption
  sampler's ``core.deformable_att.sampling_offsets/value_proj``
  (ms_deform_attn_for_caption.py:54-57) map to
  ``dsa_sampling_offsets_*``/``dsa_value_*`` and the additive-attention
  ``core.ctx2att/h2att/alpha_net`` (LSTM_DSA.py:217-220) map to the
  like-named flax params.  The reference's
  ``core.deformable_att.attention_weights/output_proj`` are *dead* in its
  return_value path (ms_deform_attn_for_caption.py:115-123 returns raw
  sampled taps; the attention weights and the output projection are
  computed/created but never consumed) — they are accepted and discarded
* ``transformer.decoder.bbox_head.*`` are aliases of ``bbox_head.*`` under
  box refinement (pdvc.py:150-156) and are skipped
* ``transformer.reference_points`` vs ``transformer.pos_trans*``: the
  reference creates both branches unconditionally
  (deformable_transformer.py:47-49) but only one runs per
  ``transformer_input_type``; the converter maps the branch present in the
  flax tree ('queries' -> reference_points, 'gt_proposals' ->
  pos_trans/pos_trans_norm) and discards the dormant one.
  ``transformer.enc_output*`` (detr-style two-stage, unused by PDVC's
  gt_proposals path): skipped
"""

from __future__ import annotations

import numpy as np

from .tsp.converter import _shape_mismatches

_IGNORABLE_PREFIXES = (
    'transformer.decoder.bbox_head.',   # aliases of bbox_head.* (box refine)
    'transformer.pos_trans',            # two-stage only
    'transformer.enc_output',           # two-stage only
    'transformer.reference_points_cap', # unused vestigial in some builds
)


def _t_lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_pdvc(state_dict, flax_params=None, nheads=None):
    """torch PDVC ``state_dict`` -> flax params tree.

    ``nheads`` is needed to unpack the decoder's torch
    ``nn.MultiheadAttention`` packed qkv into flax per-head kernels; when
    ``flax_params`` is given it is inferred from the tree instead.
    If ``flax_params`` is provided every converted leaf is shape-checked
    and a ``ValueError`` naming all mismatches is raised.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        sd[k] = np.asarray(v)

    if flax_params is not None and 'params' in flax_params \
            and 'decoder_layer_0' not in flax_params:
        flax_params = flax_params['params']   # accept a full variables dict
    if flax_params is not None and nheads is None:
        qk = flax_params.get('decoder_layer_0', {}).get(
            'self_attn', {}).get('query', {}).get('kernel')
        if qk is not None:
            nheads = qk.shape[1]
    if nheads is None:
        raise ValueError('convert_pdvc: pass nheads or flax_params')

    used = set()

    def take(key):
        if key not in sd:
            raise ValueError(
                f'convert_pdvc: expected torch key "{key}" not found — the '
                'checkpoint layout does not match the reference PDVC')
        used.add(key)
        return sd[key]

    params: dict = {}

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def lin(dst, src):
        put(dst + ('kernel',), _t_lin(take(src + '.weight')))
        put(dst + ('bias',), take(src + '.bias'))

    def norm(dst, src):
        put(dst + ('scale',), take(src + '.weight'))
        put(dst + ('bias',), take(src + '.bias'))

    # ---- base encoder -------------------------------------------------
    lin(('base_encoder', 'pos_embed', 'duration_embed_layer'),
        'base_encoder.pos_embed.duration_embed_layer')
    n_levels = 0
    while f'base_encoder.input_proj.{n_levels}.0.weight' in sd:
        n_levels += 1
    for i in range(n_levels):
        w = take(f'base_encoder.input_proj.{i}.0.weight')   # (O, I, k)
        put(('base_encoder', f'input_proj_{i}', 'kernel'),
            np.transpose(w, (2, 1, 0)))
        put(('base_encoder', f'input_proj_{i}', 'bias'),
            take(f'base_encoder.input_proj.{i}.0.bias'))
        norm(('base_encoder', f'input_proj_{i}_norm'),
             f'base_encoder.input_proj.{i}.1')

    # ---- transformer ---------------------------------------------------
    put(('level_embed',), take('transformer.level_embed'))
    # the reference creates reference_points AND pos_trans(+norm)
    # unconditionally (deformable_transformer.py:47-49); the flax tree only
    # materializes the branch its transformer_input_type invokes
    # ('queries' -> reference_points, 'gt_proposals' -> pos_trans*) —
    # convert whatever the tree has and discard the dormant branch
    if flax_params is None or 'reference_points' in flax_params:
        lin(('reference_points',), 'transformer.reference_points')
    else:
        used.update(('transformer.reference_points.weight',
                     'transformer.reference_points.bias'))
    if flax_params is not None and 'pos_trans' in flax_params:
        lin(('pos_trans',), 'transformer.pos_trans')
        norm(('pos_trans_norm',), 'transformer.pos_trans_norm')

    def msda(dst, src):
        for m in ('sampling_offsets', 'attention_weights', 'value_proj',
                  'output_proj'):
            lin(dst + (m,), f'{src}.{m}')

    i = 0
    while f'transformer.encoder.layers.{i}.norm1.weight' in sd:
        src = f'transformer.encoder.layers.{i}'
        dst = (f'encoder_layer_{i}',)
        msda(dst + ('self_attn',), f'{src}.self_attn')
        norm(dst + ('norm1',), f'{src}.norm1')
        lin(dst + ('ffn', 'linear1'), f'{src}.linear1')
        lin(dst + ('ffn', 'linear2'), f'{src}.linear2')
        norm(dst + ('ffn', 'norm'), f'{src}.norm2')
        i += 1

    i = 0
    while f'transformer.decoder.layers.{i}.norm1.weight' in sd:
        src = f'transformer.decoder.layers.{i}'
        dst = (f'decoder_layer_{i}',)
        msda(dst + ('cross_attn',), f'{src}.cross_attn')
        norm(dst + ('norm1',), f'{src}.norm1')
        norm(dst + ('norm2',), f'{src}.norm2')
        lin(dst + ('ffn', 'linear1'), f'{src}.linear1')
        lin(dst + ('ffn', 'linear2'), f'{src}.linear2')
        norm(dst + ('ffn', 'norm'), f'{src}.norm3')
        # packed torch MultiheadAttention -> flax per-head q/k/v
        w = take(f'{src}.self_attn.in_proj_weight')          # (3E, E)
        b = take(f'{src}.self_attn.in_proj_bias')            # (3E,)
        E = w.shape[1]
        hd = E // nheads
        for name, wi, bi in zip(('query', 'key', 'value'),
                                np.split(w, 3, axis=0),
                                np.split(b, 3, axis=0)):
            put(dst + ('self_attn', name, 'kernel'),
                _t_lin(wi).reshape(E, nheads, hd))
            put(dst + ('self_attn', name, 'bias'),
                bi.reshape(nheads, hd))
        wo = take(f'{src}.self_attn.out_proj.weight')        # (E, E)
        put(dst + ('self_attn', 'out', 'kernel'),
            _t_lin(wo).reshape(nheads, hd, E))
        put(dst + ('self_attn', 'out', 'bias'),
            take(f'{src}.self_attn.out_proj.bias'))
        i += 1

    # ---- queries + prediction heads -------------------------------------
    put(('query_embed',), take('query_embed.weight'))
    n_pred = 0
    while f'class_head.{n_pred}.weight' in sd:
        n_pred += 1
    # with_box_refine=False shares one prediction head across decoder
    # layers (reference pdvc.py:87-93: the ModuleList holds num_pred
    # references to the SAME module, so the state dict carries identical
    # per-layer copies); the flax tree then has a single unsuffixed head
    if flax_params is not None:
        heads_shared = 'class_head' in flax_params
    else:
        heads_shared = n_pred > 1 and all(
            np.array_equal(sd[f'class_head.{li}.weight'],
                           sd['class_head.0.weight'])
            for li in range(1, n_pred))
    if heads_shared:
        for li in range(1, n_pred):
            if not np.array_equal(sd[f'class_head.{li}.weight'],
                                  sd['class_head.0.weight']):
                raise ValueError(
                    'convert_pdvc: checkpoint has diverged per-layer '
                    'prediction heads but the flax model shares one head '
                    '— rebuild with with_box_refine=True')
        lin(('class_head',), 'class_head.0')
        lin(('count_head',), 'count_head.0')
        for j in range(3):
            lin(('bbox_head', f'layer{j}'), f'bbox_head.0.layers.{j}')
        for li in range(1, n_pred):
            for head in ('class_head', 'count_head', 'bbox_head'):
                for k in list(sd):
                    if k.startswith(f'{head}.{li}.'):
                        used.add(k)
    else:
        for i in range(n_pred):
            lin((f'class_head_{i}',), f'class_head.{i}')
            lin((f'count_head_{i}',), f'count_head.{i}')
            for j in range(3):
                lin((f'bbox_head_{i}', f'layer{j}'),
                    f'bbox_head.{i}.layers.{j}')

    # ---- caption head(s) -----------------------------------------------
    def convert_caption_head(base, dst_name):
        put((dst_name, 'embed'), take(f'{base}.embed.weight'))
        put((dst_name, 'logit_w'), _t_lin(take(f'{base}.logit.weight')))
        put((dst_name, 'logit_b'), take(f'{base}.logit.bias'))
        for k in list(sd):
            if not k.startswith(base + '.core.'):
                continue
            tail = k[len(base + '.core.'):]
            if tail.startswith('rnn.'):
                put((dst_name, tail[len('rnn.'):].replace(
                    'weight_ih_', 'rnn_w_ih_').replace(
                    'weight_hh_', 'rnn_w_hh_')), _t_lin(sd[k]))
                used.add(k)
        # ---- 'standard' (LSTM-DSA) head extras ------------------------
        dsa = base + '.core.deformable_att'
        if f'{dsa}.sampling_offsets.weight' in sd:
            # joint query = [LSTM hidden ; event query] (LSTM_DSA.py:233),
            # so the transposed (2d, HLP) kernel's rows split R | d exactly
            # as the flax off_w[:R] / off_w[R:] hoisting expects
            put((dst_name, 'dsa_sampling_offsets_w'),
                _t_lin(take(f'{dsa}.sampling_offsets.weight')))
            put((dst_name, 'dsa_sampling_offsets_b'),
                take(f'{dsa}.sampling_offsets.bias'))
            put((dst_name, 'dsa_value_w'),
                _t_lin(take(f'{dsa}.value_proj.weight')))
            put((dst_name, 'dsa_value_b'),
                take(f'{dsa}.value_proj.bias'))
            # dead in the reference's return_value path — discard
            for dead in ('attention_weights', 'output_proj'):
                for suf in ('weight', 'bias'):
                    used.add(f'{dsa}.{dead}.{suf}')
            for tname in ('ctx2att', 'h2att', 'alpha_net'):
                tkey = f'{base}.core.{tname}'
                if f'{tkey}.weight' in sd:   # absent when att_hid_size == 0
                    put((dst_name, f'{tname}_w'),
                        _t_lin(take(f'{tkey}.weight')))
                    put((dst_name, f'{tname}_b'),
                        take(f'{tkey}.bias'))

    if 'caption_head.0.embed.weight' in sd:
        n_heads_cap = 0
        while f'caption_head.{n_heads_cap}.embed.weight' in sd:
            n_heads_cap += 1
        if flax_params is not None:
            # the flax tree knows the layout; value equality cannot — the
            # reference deep-copies the head when NOT sharing (pdvc.py
            # _get_clones), so unshared layers start out value-identical
            shared = 'caption_head' in flax_params
        else:
            shared = all(
                np.array_equal(sd[f'caption_head.{li}.embed.weight'],
                               sd['caption_head.0.embed.weight'])
                for li in range(1, n_heads_cap))
        if shared:
            # reference default share_caption_head=1: all layers alias one
            # module; the flax tree keeps a single 'caption_head'
            for li in range(1, n_heads_cap):
                if not np.array_equal(sd[f'caption_head.{li}.embed.weight'],
                                      sd['caption_head.0.embed.weight']):
                    raise ValueError(
                        'convert_pdvc: checkpoint has diverged per-layer '
                        'caption heads but the flax model shares one head '
                        '— rebuild with share_caption_head=0')
            convert_caption_head('caption_head.0', 'caption_head')
            for li in range(1, n_heads_cap):
                for k in list(sd):
                    if k.startswith(f'caption_head.{li}.'):
                        used.add(k)
        else:
            # share_caption_head=0: per-layer 'caption_head_{i}' modules
            for li in range(n_heads_cap):
                convert_caption_head(f'caption_head.{li}',
                                     f'caption_head_{li}')

    leftovers = [k for k in sd if k not in used
                 and not any(k.startswith(p) for p in _IGNORABLE_PREFIXES)]
    if leftovers:
        raise ValueError(
            'convert_pdvc: unconsumed checkpoint tensors (layout mismatch '
            f'with the reference PDVC): {sorted(leftovers)[:10]}')

    if flax_params is not None:
        mismatches = _shape_mismatches(flax_params, params)
        if mismatches:
            raise ValueError(
                'convert_pdvc: converted shapes do not match the flax PDVC '
                'tree:\n  ' + '\n  '.join(mismatches[:15]))
    return params


def _torch_mha_to_flax(sd, src, nheads, take):
    """Packed torch ``nn.MultiheadAttention`` -> flax
    MultiHeadDotProductAttention param dict (query/key/value/out)."""
    w = take(f'{src}.in_proj_weight')            # (3E, E)
    b = take(f'{src}.in_proj_bias')              # (3E,)
    E = w.shape[1]
    if E % nheads:
        raise ValueError(
            f'convert_fusion: embed dim {E} not divisible by {nheads} heads')
    hd = E // nheads
    out = {}
    for name, wi, bi in zip(('query', 'key', 'value'),
                            np.split(w, 3, axis=0), np.split(b, 3, axis=0)):
        out[name] = {'kernel': _t_lin(wi).reshape(E, nheads, hd),
                     'bias': bi.reshape(nheads, hd)}
    out['out'] = {'kernel': _t_lin(take(f'{src}.out_proj.weight')
                                   ).reshape(nheads, hd, E),
                  'bias': take(f'{src}.out_proj.bias')}
    return out


def convert_fusion(state_dict, flax_params=None, nheads=None,
                   fusion_heads=None):
    """Reference ``NewModel`` torch checkpoint -> ``FusionPDVC`` flax params.

    The reference's headline artifact is a NewModel ``.pth`` saved as
    ``{'model': state_dict, ...}`` by ``newTrain.py:404-417``; its layout
    (``NewModel.py:9-37``):

    * ``pdvcModel.*``     -> the wrapped PDVC, converted via
      :func:`convert_pdvc` into the ``pdvc`` subtree
    * ``ln1/mha1/mlp_seq1.{0,1}`` (visual self-attention,
      NewModel.py:41-51)  -> ``visual_sa/{ln, mha, mlp_fc, mlp_ln}``
    * ``ln2/mha2/mlp_seq2.{0,1}`` (audio->visual cross-attention,
      NewModel.py:55-65)  -> ``sound_ca/{ln, mha, mlp_fc, mlp_ln}``
    * ``sound_model.*`` (HuBERT, NewModel.py:35-37) -> discarded: audio
      features are produced by the data pipeline (``dvc_tpu/data/audio.py``)
      rather than inside the model

    ``fusion_heads`` (reference hard-codes 32) is inferred from
    ``flax_params`` when given; ``nheads`` is forwarded to convert_pdvc.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        sd[k] = np.asarray(v) if not k.startswith('sound_model.') else v

    if flax_params is not None and 'params' in flax_params \
            and 'visual_sa' not in flax_params:
        flax_params = flax_params['params']
    if flax_params is not None and fusion_heads is None:
        qk = flax_params.get('visual_sa', {}).get('mha', {}).get(
            'query', {}).get('kernel')
        if qk is not None:
            fusion_heads = qk.shape[1]
    if fusion_heads is None:
        fusion_heads = 32   # hard-coded in the reference (NewModel.py:22,29)

    pdvc_sd = {k[len('pdvcModel.'):]: v for k, v in sd.items()
               if k.startswith('pdvcModel.')}
    if not pdvc_sd:
        raise ValueError(
            'convert_fusion: no "pdvcModel.*" keys — not a reference '
            'NewModel checkpoint (for a bare PDVC one use convert_pdvc)')
    inner_flax = flax_params.get('pdvc') if flax_params is not None else None

    used = set()

    def take(key):
        if key not in sd:
            raise ValueError(
                f'convert_fusion: expected torch key "{key}" not found — '
                'the checkpoint layout does not match the reference '
                'NewModel')
        used.add(key)
        return sd[key]

    params = {'pdvc': convert_pdvc(pdvc_sd, inner_flax, nheads=nheads)}
    for dst, ln, mha, mlp in (('visual_sa', 'ln1', 'mha1', 'mlp_seq1'),
                              ('sound_ca', 'ln2', 'mha2', 'mlp_seq2')):
        params[dst] = {
            'mha': _torch_mha_to_flax(sd, mha, fusion_heads, take),
            'ln': {'scale': take(f'{ln}.weight'),
                   'bias': take(f'{ln}.bias')},
            'mlp_fc': {'kernel': _t_lin(take(f'{mlp}.0.weight')),
                       'bias': take(f'{mlp}.0.bias')},
            'mlp_ln': {'scale': take(f'{mlp}.1.weight'),
                       'bias': take(f'{mlp}.1.bias')},
        }

    leftovers = [k for k in sd if k not in used
                 and not k.startswith(('pdvcModel.', 'sound_model.'))]
    if leftovers:
        raise ValueError(
            'convert_fusion: unconsumed checkpoint tensors (layout mismatch '
            f'with the reference NewModel): {sorted(leftovers)[:10]}')

    if flax_params is not None:
        mismatches = _shape_mismatches(flax_params, params)
        if mismatches:
            raise ValueError(
                'convert_fusion: converted shapes do not match the flax '
                'FusionPDVC tree:\n  ' + '\n  '.join(mismatches[:15]))
    return params


# ---------------------------------------------------------------------------
# flax -> torch export (the inverse direction: checkpoint interop back to
# the reference stack, and a roundtrip harness for the importer above)
# ---------------------------------------------------------------------------

def _unwrap(flax_params, marker):
    if 'params' in flax_params and marker not in flax_params:
        return flax_params['params']
    return flax_params


def export_pdvc(flax_params, dec_layers=None):
    """Flax PDVC params tree -> reference-layout torch ``state_dict``
    (numpy arrays; ``torch.save({'model': {k: torch.tensor(v), ...}})`` on
    the receiving side makes it a reference ``model-best.pth``).

    Exact inverse of :func:`convert_pdvc` — roundtrip-pinned by
    ``tests/test_export_torch.py``.  Shared prediction/caption heads
    (``with_box_refine=0`` / ``share_caption_head=1``) are replicated
    ``dec_layers`` times, matching how the reference's aliased
    ``nn.ModuleList`` serializes (pdvc.py:87-93,111-118); ``dec_layers``
    is inferred from the tree when not given.  The reference's dead
    ``core.deformable_att.attention_weights/output_proj`` params are not
    synthesized (the reference never consumes them; load with
    ``strict=False`` or via this repo's converter).
    """
    p = _unwrap(flax_params, 'decoder_layer_0')
    if dec_layers is None:
        dec_layers = 0
        while f'decoder_layer_{dec_layers}' in p:
            dec_layers += 1
    sd = {}

    def get(path):
        node = p
        for q in path:
            node = node[q]
        return np.asarray(node)

    def has(path):
        node = p
        for q in path:
            if not isinstance(node, dict) or q not in node:
                return False
            node = node[q]
        return True

    def lin(src, dst):
        sd[dst + '.weight'] = _t_lin(get(src + ('kernel',)))
        sd[dst + '.bias'] = get(src + ('bias',))

    def norm(src, dst):
        sd[dst + '.weight'] = get(src + ('scale',))
        sd[dst + '.bias'] = get(src + ('bias',))

    # ---- base encoder ----------------------------------------------------
    lin(('base_encoder', 'pos_embed', 'duration_embed_layer'),
        'base_encoder.pos_embed.duration_embed_layer')
    i = 0
    while has(('base_encoder', f'input_proj_{i}')):
        k = get(('base_encoder', f'input_proj_{i}', 'kernel'))   # (k, I, O)
        sd[f'base_encoder.input_proj.{i}.0.weight'] = np.transpose(
            k, (2, 1, 0))
        sd[f'base_encoder.input_proj.{i}.0.bias'] = get(
            ('base_encoder', f'input_proj_{i}', 'bias'))
        norm(('base_encoder', f'input_proj_{i}_norm'),
             f'base_encoder.input_proj.{i}.1')
        i += 1

    # ---- transformer -------------------------------------------------------
    sd['transformer.level_embed'] = get(('level_embed',))
    if has(('reference_points',)):
        lin(('reference_points',), 'transformer.reference_points')
    if has(('pos_trans',)):
        lin(('pos_trans',), 'transformer.pos_trans')
        norm(('pos_trans_norm',), 'transformer.pos_trans_norm')

    def msda(src, dst):
        for m in ('sampling_offsets', 'attention_weights', 'value_proj',
                  'output_proj'):
            lin(src + (m,), f'{dst}.{m}')

    i = 0
    while has((f'encoder_layer_{i}',)):
        src = (f'encoder_layer_{i}',)
        dst = f'transformer.encoder.layers.{i}'
        msda(src + ('self_attn',), f'{dst}.self_attn')
        norm(src + ('norm1',), f'{dst}.norm1')
        lin(src + ('ffn', 'linear1'), f'{dst}.linear1')
        lin(src + ('ffn', 'linear2'), f'{dst}.linear2')
        norm(src + ('ffn', 'norm'), f'{dst}.norm2')
        i += 1

    i = 0
    while has((f'decoder_layer_{i}',)):
        src = (f'decoder_layer_{i}',)
        dst = f'transformer.decoder.layers.{i}'
        msda(src + ('cross_attn',), f'{dst}.cross_attn')
        norm(src + ('norm1',), f'{dst}.norm1')
        norm(src + ('norm2',), f'{dst}.norm2')
        lin(src + ('ffn', 'linear1'), f'{dst}.linear1')
        lin(src + ('ffn', 'linear2'), f'{dst}.linear2')
        norm(src + ('ffn', 'norm'), f'{dst}.norm3')
        sd.update(_flax_mha_to_torch(
            {n: {'kernel': get(src + ('self_attn', n, 'kernel')),
                 'bias': get(src + ('self_attn', n, 'bias'))}
             for n in ('query', 'key', 'value', 'out')},
            f'{dst}.self_attn'))
        i += 1

    # ---- queries + prediction heads ---------------------------------------
    sd['query_embed.weight'] = get(('query_embed',))
    if has(('class_head',)):       # shared (with_box_refine=0): replicate
        for li in range(dec_layers):
            lin(('class_head',), f'class_head.{li}')
            lin(('count_head',), f'count_head.{li}')
            for j in range(3):
                lin(('bbox_head', f'layer{j}'), f'bbox_head.{li}.layers.{j}')
    else:
        i = 0
        while has((f'class_head_{i}',)):
            lin((f'class_head_{i}',), f'class_head.{i}')
            lin((f'count_head_{i}',), f'count_head.{i}')
            for j in range(3):
                lin((f'bbox_head_{i}', f'layer{j}'),
                    f'bbox_head.{i}.layers.{j}')
            i += 1

    # ---- caption head(s) ---------------------------------------------------
    def export_caption_head(src_name, base):
        head = p[src_name]
        sd[f'{base}.embed.weight'] = np.asarray(head['embed'])
        sd[f'{base}.logit.weight'] = _t_lin(head['logit_w'])
        sd[f'{base}.logit.bias'] = np.asarray(head['logit_b'])
        for k, v in head.items():
            if k.startswith('rnn_w_'):
                # rnn_w_ih_l{l} -> core.rnn.weight_ih_l{l}
                tail = k[len('rnn_w_'):]
                sd[f'{base}.core.rnn.weight_{tail}'] = _t_lin(v)
        if 'dsa_sampling_offsets_w' in head:
            dsa = f'{base}.core.deformable_att'
            sd[f'{dsa}.sampling_offsets.weight'] = _t_lin(
                head['dsa_sampling_offsets_w'])
            sd[f'{dsa}.sampling_offsets.bias'] = np.asarray(
                head['dsa_sampling_offsets_b'])
            sd[f'{dsa}.value_proj.weight'] = _t_lin(head['dsa_value_w'])
            sd[f'{dsa}.value_proj.bias'] = np.asarray(head['dsa_value_b'])
            for tname in ('ctx2att', 'h2att', 'alpha_net'):
                if f'{tname}_w' in head:
                    sd[f'{base}.core.{tname}.weight'] = _t_lin(
                        head[f'{tname}_w'])
                    sd[f'{base}.core.{tname}.bias'] = np.asarray(
                        head[f'{tname}_b'])

    if has(('caption_head',)):     # shared: replicate per decoder layer
        for li in range(dec_layers):
            export_caption_head('caption_head', f'caption_head.{li}')
    else:
        i = 0
        while has((f'caption_head_{i}',)):
            export_caption_head(f'caption_head_{i}', f'caption_head.{i}')
            i += 1

    return sd


def _flax_mha_to_torch(mha, dst):
    """Flax MultiHeadDotProductAttention params -> packed torch
    ``nn.MultiheadAttention`` keys (inverse of :func:`_torch_mha_to_flax`)."""
    ws, bs = [], []
    E = mha['query']['kernel'].shape[0]
    for n in ('query', 'key', 'value'):
        ws.append(_t_lin(np.asarray(mha[n]['kernel']).reshape(E, -1)))
        bs.append(np.asarray(mha[n]['bias']).reshape(-1))
    out_k = np.asarray(mha['out']['kernel'])
    return {
        f'{dst}.in_proj_weight': np.concatenate(ws, axis=0),
        f'{dst}.in_proj_bias': np.concatenate(bs, axis=0),
        f'{dst}.out_proj.weight': _t_lin(out_k.reshape(-1, out_k.shape[-1])),
        f'{dst}.out_proj.bias': np.asarray(mha['out']['bias']),
    }


def export_fusion(flax_params, dec_layers=None):
    """Flax ``FusionPDVC`` params -> reference ``NewModel`` state_dict
    (inverse of :func:`convert_fusion`; the HuBERT ``sound_model.*``
    subtree is not synthesized — audio features live in the data pipeline
    here, and the reference loads its own HuBERT weights from torchaudio)."""
    p = _unwrap(flax_params, 'visual_sa')
    sd = {f'pdvcModel.{k}': v
          for k, v in export_pdvc(p['pdvc'], dec_layers).items()}
    for src, ln, mha, mlp in (('visual_sa', 'ln1', 'mha1', 'mlp_seq1'),
                              ('sound_ca', 'ln2', 'mha2', 'mlp_seq2')):
        blk = p[src]
        sd.update(_flax_mha_to_torch(blk['mha'], mha))
        sd[f'{ln}.weight'] = np.asarray(blk['ln']['scale'])
        sd[f'{ln}.bias'] = np.asarray(blk['ln']['bias'])
        sd[f'{mlp}.0.weight'] = _t_lin(blk['mlp_fc']['kernel'])
        sd[f'{mlp}.0.bias'] = np.asarray(blk['mlp_fc']['bias'])
        sd[f'{mlp}.1.weight'] = np.asarray(blk['mlp_ln']['scale'])
        sd[f'{mlp}.1.bias'] = np.asarray(blk['mlp_ln']['bias'])
    return sd
