"""PDVC — parallel decoding dense video captioning, as one jitted forward.

Reference: ``pdvc/pdvc.py``.  A conv pyramid (BaseEncoder) feeds a
deformable transformer encoder; Nq learned event queries are decoded with
iterative box refinement; each query gets class logits, a (center, length)
box, a share of the event-count logits, and (when matched) a caption.

Control-flow inversion preserved from the reference (SURVEY.md §1): the
criterion runs *inside* the forward because caption supervision needs the
Hungarian match indices computed mid-forward (``pdvc.py:236-323``).  In JAX
this is just function composition — the whole train step including matching
jits into a single XLA program with no host sync.

Static-shape contract (batch dict):
  video_tensor (B, T, C) f32      frame features, zero-padded
  video_mask   (B, T) bool        True = valid frame
  video_length (B, 3) f32         [feature length, duration (s), gt count]
  gt_boxes     (B, G, 2) f32      (center, length) normalized; zero padded
  gt_boxes_mask(B, G) bool        True = real gt event
  gt_labels    (B, G) i32
  cap_tensor   (B, G, Lc) i32     BOS/EOS = 0
  cap_mask     (B, G, Lc) bool
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.box_ops import inverse_sigmoid
from .base_encoder import BaseEncoder
from .caption_heads import (CaptionHeadConfig, DSACaptionHead,
                            LightCaptionHead, caption_nll, truncate_levels)
from .criterion import CriterionConfig, criterion_forward
from .deformable_transformer import (DecoderLayer, EncoderLayer,
                                     encoder_reference_points)


@dataclasses.dataclass(frozen=True)
class PDVCConfig:
    num_classes: int = 1
    num_queries: int = 100
    num_feature_levels: int = 4
    hidden_dim: int = 512
    nheads: int = 8
    enc_layers: int = 2
    dec_layers: int = 2
    transformer_ff_dim: int = 2048
    transformer_dropout_prob: float = 0.1
    enc_n_points: int = 4
    dec_n_points: int = 4
    with_box_refine: bool = True
    aux_loss: bool = True
    share_caption_head: bool = True
    caption_decoder_type: str = 'light'
    max_eseq_length: int = 10
    feature_dim: int = 512
    frame_embedding_num: int = 100
    transformer_input_type: str = 'queries'
    msda_impl: str = 'auto'
    # trunk-only override of msda_impl ('' = follow msda_impl): the
    # encoder/decoder sampling runs at large (Q ~ S) shapes where the
    # impl trade-offs differ from the caption head's tiny per-step shapes
    msda_trunk_impl: str = ''
    msda_boundary: str = 'zeros'
    compute_dtype: str = 'float32'
    seq_shard: bool = False
    lstm_fuse: bool = False
    scan_fuse: bool = True
    greedy_fuse: bool = True
    # reference sample(opt) surface (LSTM.py:96-98): greedy by default;
    # sample_max=0 draws from exp(logprobs / temperature) instead (dead
    # on every reference driver path, kept for API parity)
    sample_max: bool = True
    sample_temperature: float = 1.0
    caption: CaptionHeadConfig = None
    criterion: CriterionConfig = None

    @classmethod
    def from_opt(cls, opt):
        cap = CaptionHeadConfig(
            vocab_size=opt.vocab_size,
            input_encoding_size=opt.input_encoding_size,
            rnn_size=opt.rnn_size, num_layers=opt.num_layers,
            drop_prob=opt.drop_prob, max_caption_len=opt.max_caption_len,
            hidden_dim=opt.hidden_dim, att_hid_size=opt.att_hid_size,
            cap_nheads=opt.cap_nheads,
            cap_dec_n_points=opt.cap_dec_n_points,
            cap_num_feature_levels=min(opt.cap_num_feature_levels,
                                       opt.num_feature_levels),
            scan_remat=bool(getattr(opt, 'caption_scan_remat', 1)))
        return cls(
            num_classes=opt.num_classes, num_queries=opt.num_queries,
            num_feature_levels=opt.num_feature_levels,
            hidden_dim=opt.hidden_dim, nheads=opt.nheads,
            enc_layers=opt.enc_layers, dec_layers=opt.dec_layers,
            transformer_ff_dim=opt.transformer_ff_dim,
            transformer_dropout_prob=opt.transformer_dropout_prob,
            enc_n_points=opt.enc_n_points, dec_n_points=opt.dec_n_points,
            with_box_refine=bool(opt.with_box_refine),
            aux_loss=bool(opt.aux_loss),
            share_caption_head=bool(opt.share_caption_head),
            caption_decoder_type=opt.caption_decoder_type,
            max_eseq_length=opt.max_eseq_length,
            feature_dim=opt.feature_dim,
            frame_embedding_num=opt.frame_embedding_num,
            transformer_input_type=opt.transformer_input_type,
            msda_impl=opt.msda_impl,
            msda_trunk_impl=getattr(opt, 'msda_trunk_impl', ''),
            msda_boundary=getattr(opt, 'msda_boundary', 'zeros'),
            compute_dtype=getattr(opt, 'tpu_compute_dtype', 'float32'),
            seq_shard=bool(getattr(opt, 'tpu_seq_shard', 0)),
            lstm_fuse=bool(getattr(opt, 'dsa_lstm_fuse', 0)),
            scan_fuse=bool(getattr(opt, 'dsa_scan_fuse', 1)),
            greedy_fuse=bool(getattr(opt, 'dsa_greedy_fuse', 1)),
            sample_max=bool(getattr(opt, 'caption_sample_max', 1)),
            sample_temperature=float(
                getattr(opt, 'caption_sample_temperature', 1.0)),
            caption=cap, criterion=CriterionConfig.from_opt(opt))


def resolve_trunk_impl(msda_trunk_impl: str, msda_impl: str) -> str:
    """Encoder/decoder sampling impl.  'auto' resolves the TRUNK to the
    dense one-hot-matmul formulation, NOT the Pallas kernel: at trunk
    shapes (Q ~ S ~ 375, one launch per layer) the kernel's (B, H) grid
    cells serialize on the core and the pad/transpose relayouts around the
    launch cost more than XLA's fused per-level einsums — HW A/B
    (HW_VALIDATION.jsonl stage 'trunk_fwd'): dense 23.3 ms/step train /
    15.9 eval vs pallas 27.6 / 19.3 at B=16 flagship.  The caption head's
    per-word-step sampling (tiny shapes, launch-bound) keeps its own fused
    kernels; explicit choices are honored unchanged."""
    return msda_trunk_impl or ('dense' if msda_impl == 'auto' else msda_impl)


def class_bias_init(key, shape, dtype=jnp.float32):
    """Focal-loss prior bias (reference pdvc.py:69-71)."""
    prior_prob = 0.01
    return jnp.full(shape, -jnp.log((1 - prior_prob) / prior_prob), dtype)


class BBoxHead(nn.Module):
    """3-layer MLP -> (center_delta, length_logit) (reference pdvc.py:549-561).

    The final layer is zero-init; ``length_bias`` -2 gives small initial
    lengths after sigmoid (reference pdvc.py:87,91).
    """
    hidden_dim: int
    length_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, name='layer0')(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name='layer1')(x))
        b = jnp.array([0.0, self.length_bias], jnp.float32)
        x = nn.Dense(2, name='layer2', kernel_init=nn.initializers.zeros,
                     bias_init=lambda k, s, d=jnp.float32: b.astype(d))(x)
        return x


class PDVC(nn.Module):
    cfg: PDVCConfig

    def setup(self):
        c = self.cfg
        d = c.hidden_dim
        L = c.num_feature_levels
        self.base_encoder = BaseEncoder(L, c.feature_dim, d,
                                        name='base_encoder')
        self.level_embed = self.param('level_embed',
                                      nn.initializers.normal(1.0), (L, d))
        dtype = jnp.bfloat16 if c.compute_dtype == 'bfloat16' else jnp.float32
        trunk_impl = resolve_trunk_impl(c.msda_trunk_impl, c.msda_impl)
        self.enc_stack = [
            EncoderLayer(d, c.transformer_ff_dim, c.transformer_dropout_prob,
                         L, c.nheads, c.enc_n_points, msda_impl=trunk_impl,
                         msda_boundary=c.msda_boundary,
                         dtype=dtype, name=f'encoder_layer_{i}')
            for i in range(c.enc_layers)]
        self.dec_stack = [
            DecoderLayer(d, c.transformer_ff_dim, c.transformer_dropout_prob,
                         L, c.nheads, c.dec_n_points, msda_impl=trunk_impl,
                         msda_boundary=c.msda_boundary,
                         dtype=dtype, name=f'decoder_layer_{i}')
            for i in range(c.dec_layers)]
        self.query_embed = self.param('query_embed',
                                      nn.initializers.normal(1.0),
                                      (c.num_queries, 2 * d))
        self.reference_points_fc = nn.Dense(
            1, name='reference_points',
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros)
        # two-stage (gt_proposals) projections (reference :47-48)
        self.pos_trans = nn.Dense(2 * d, name='pos_trans')
        self.pos_trans_norm = nn.LayerNorm(name='pos_trans_norm')

        D = c.dec_layers
        if c.with_box_refine:
            self.class_heads = [
                nn.Dense(c.num_classes, bias_init=class_bias_init,
                         name=f'class_head_{i}') for i in range(D)]
            self.count_heads = [
                nn.Dense(c.max_eseq_length + 1, name=f'count_head_{i}')
                for i in range(D)]
            self.bbox_heads = [
                BBoxHead(d, length_bias=(-2.0 if i == 0 else 0.0),
                         name=f'bbox_head_{i}') for i in range(D)]
        else:
            ch = nn.Dense(c.num_classes, bias_init=class_bias_init,
                          name='class_head')
            co = nn.Dense(c.max_eseq_length + 1, name='count_head')
            bb = BBoxHead(d, length_bias=-2.0, name='bbox_head')
            self.class_heads = [ch] * D
            self.count_heads = [co] * D
            self.bbox_heads = [bb] * D

        if c.caption_decoder_type == 'none':
            self.caption_heads = None
        else:
            head_cls = (LightCaptionHead if c.caption_decoder_type == 'light'
                        else DSACaptionHead)
            kwargs = {} if c.caption_decoder_type == 'light' else {
                'msda_impl': c.msda_impl,
                # XLA-portable impls map to the jnp attention path
                'att_impl': {'dense': 'ref', 'ref': 'ref'}.get(
                    c.msda_impl, c.msda_impl),
                # bf16 MXU matmuls inside the fused DSA kernel follow the
                # model-wide compute dtype (accumulation stays f32)
                'att_precision': c.compute_dtype,
                'lstm_fuse': c.lstm_fuse,
                'scan_fuse': c.scan_fuse,
                'greedy_fuse': c.greedy_fuse}
            if c.share_caption_head:
                h = head_cls(c.caption, name='caption_head', **kwargs)
                self.caption_heads = [h] * D
            else:
                self.caption_heads = [
                    head_cls(c.caption, name=f'caption_head_{i}', **kwargs)
                    for i in range(D)]

    # ------------------------------------------------------------------
    # encoder
    # ------------------------------------------------------------------
    def encode(self, batch, deterministic):
        c = self.cfg
        vf = batch['video_tensor']
        pad_mask = ~batch['video_mask']
        duration = batch['video_length'][:, 1]
        srcs, masks, poses = self.base_encoder(vf, pad_mask, duration)

        shapes = tuple(s.shape[1] for s in srcs)
        src_flat = jnp.concatenate(srcs, axis=1)
        mask_flat = jnp.concatenate(masks, axis=1)
        pos_flat = jnp.concatenate(
            [p + self.level_embed[l][None, None, :]
             for l, p in enumerate(poses)], axis=1)
        valid_ratios = jnp.stack(
            [(~m).astype(jnp.float32).sum(1) / m.shape[1] for m in masks],
            axis=1)                                             # (B, L)

        # sequence parallelism for long videos: shard the flattened frame
        # axis over the mesh's 'model' axis — the encoder is the only
        # S-quadratic-free but S-heavy stage (the reference downsamples
        # long videos instead). XLA partitions the FFN/elementwise work
        # and inserts the collectives the deformable sampling needs.
        if c.seq_shard:
            from jax.sharding import PartitionSpec as P

            from ..parallel.op_partition import constrain
            sp = lambda x: constrain(x, P('data', 'model', None))  # noqa: E731
        else:
            sp = lambda x: x  # noqa: E731

        memory = sp(src_flat)
        ref = encoder_reference_points(shapes, valid_ratios)
        for layer in self.enc_stack:
            memory = sp(layer(memory, pos_flat.astype(memory.dtype), ref,
                              shapes, mask_flat, deterministic))
        return memory.astype(jnp.float32), shapes, valid_ratios, mask_flat

    # ------------------------------------------------------------------
    # decoder
    # ------------------------------------------------------------------
    def decode(self, memory, shapes, valid_ratios, mask_flat,
               init_reference, tgt, query_pos, query_mask, deterministic,
               disable_iterative_refine):
        """Runs the decoder stack with iterative refinement.

        Returns (hs, inter_references): hs list of per-layer outputs,
        inter_references list of per-layer refined references (the
        reference's stacked intermediates, ``deformable_transformer.py:283-325``).
        """
        c = self.cfg
        output = tgt
        reference_points = init_reference
        hs, inter_refs = [], []
        for lid, layer in enumerate(self.dec_stack):
            if reference_points.shape[-1] == 2:
                ref_input = (reference_points[:, :, None]
                             * jnp.stack([valid_ratios, valid_ratios], -1)[:, None])
            else:
                ref_input = (reference_points[:, :, None]
                             * valid_ratios[:, None, :, None])
            output = layer(output, query_pos, ref_input, memory, shapes,
                           mask_flat, query_mask, deterministic)
            output = output.astype(jnp.float32)

            if not disable_iterative_refine and c.with_box_refine:
                tmp = self.bbox_heads[lid](output)
                if reference_points.shape[-1] == 2:
                    new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
                else:
                    new_ref = jax.nn.sigmoid(jnp.concatenate(
                        [tmp[..., :1] + inverse_sigmoid(reference_points),
                         tmp[..., 1:]], axis=-1))
                reference_points = jax.lax.stop_gradient(new_ref)
            hs.append(output)
            inter_refs.append(reference_points)
        return hs, inter_refs

    def prepare_decoder_queries(self, memory):
        """'queries' input mode (reference :127-134)."""
        B = memory.shape[0]
        query_pos, tgt = jnp.split(self.query_embed, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)
        init_reference = jax.nn.sigmoid(self.reference_points_fc(query_pos))
        return init_reference, tgt, query_pos

    def prepare_decoder_proposals(self, gt_boxes):
        """'gt_proposals' two-stage mode (reference :136-142)."""
        import math
        topk_coords_unact = inverse_sigmoid(gt_boxes)
        num_pos_feats, temperature = 256, 10000
        dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
        proposals = jax.nn.sigmoid(topk_coords_unact) * (2 * math.pi)
        pos = proposals[:, :, :, None] / dim_t
        pos = jnp.stack((jnp.sin(pos[:, :, :, 0::2]),
                         jnp.cos(pos[:, :, :, 1::2])),
                        axis=4).reshape(pos.shape[0], pos.shape[1], -1)
        out = self.pos_trans_norm(self.pos_trans(pos))
        query_pos, tgt = jnp.split(out, 2, axis=2)
        return gt_boxes, tgt, query_pos

    # ------------------------------------------------------------------
    # per-layer heads
    # ------------------------------------------------------------------
    def layer_reference(self, init_reference, inter_refs, l_id):
        return init_reference if l_id == 0 else inter_refs[l_id - 1]

    def head_outputs(self, hs, init_reference, inter_refs,
                     disable_iterative_refine, train_path):
        """Per-layer class/count/box predictions.

        Replicates the reference's two (slightly different) box branches:
        eval path ``pdvc.py:202-211`` adds a 1-d reference to both box dims
        (``tmp[..., :2] += reference``), train path ``pdvc.py:257-266`` only
        to the center — a reference quirk kept for parity.
        """
        outputs_class, outputs_count, outputs_coord = [], [], []
        for l_id in range(self.cfg.dec_layers):
            hs_lid = hs[l_id]
            reference = self.layer_reference(init_reference, inter_refs, l_id)
            cls = self.class_heads[l_id](hs_lid)
            cnt = self.count_heads[l_id](jnp.max(hs_lid, axis=1))
            tmp = self.bbox_heads[l_id](hs_lid)
            if disable_iterative_refine:
                coord = reference
            else:
                ref_inv = inverse_sigmoid(reference)
                if reference.shape[-1] == 2:
                    coord = jax.nn.sigmoid(tmp + ref_inv)
                elif train_path:
                    coord = jax.nn.sigmoid(jnp.concatenate(
                        [tmp[..., :1] + ref_inv, tmp[..., 1:]], -1))
                else:
                    coord = jax.nn.sigmoid(tmp + ref_inv)  # broadcasts to both
            outputs_class.append(cls)
            outputs_count.append(cnt)
            outputs_coord.append(coord)
        return (jnp.stack(outputs_class), jnp.stack(outputs_count),
                jnp.stack(outputs_coord))

    # ------------------------------------------------------------------
    # caption decoding
    # ------------------------------------------------------------------
    def _caption_reference(self, reference, valid_ratios, shapes):
        """References scaled by valid ratios for the caption head
        (reference LSTM_DSA.py:66-70), in unified (center, offset-scale)
        form (see DSACaptionHead docstring): 1-d references give
        center = ref * vr_l, scale = 1/T_l; box references give
        center = c * vr_l, scale = len * vr_l * 0.5 / n_points.
        Returns (center, scale) each (B, P, L)."""
        L = len(shapes)
        shapes_arr = jnp.asarray(shapes, jnp.float32)
        if reference.shape[-1] == 2:
            center = reference[:, :, None, 0] * valid_ratios[:, None, :]
            scale = (reference[:, :, None, 1] * valid_ratios[:, None, :]
                     * 0.5 / self.cfg.caption.cap_dec_n_points)
        else:
            center = reference[:, :, None, 0] * valid_ratios[:, None, :]
            scale = jnp.broadcast_to(1.0 / shapes_arr[None, None, :],
                                     center.shape)
        return center, scale

    def _run_caption_forward(self, head, feats, center, scale, memory,
                             shapes, mask_flat, caps, ss_prob,
                             deterministic, ss_enabled=None):
        """One teacher-forced pass of the (standard) caption head over a
        (B, P) pair layout; returns per-caption logprobs (B, P, Lc-1, V+1)."""
        c = self.cfg
        shapes_t, mem_t, mask_t, center_t, scale_t = truncate_levels(
            c.caption, shapes, memory, mask_flat, center, scale)
        lp = head(feats, center_t, scale_t, mem_t, shapes_t, mask_t,
                  seq=caps, ss_prob=ss_prob, deterministic=deterministic,
                  mode='forward', ss_enabled=ss_enabled)
        return lp.reshape(*feats.shape[:2], *lp.shape[1:])

    def caption_train_losses(self, hs, init_reference, inter_refs, memory,
                             shapes, valid_ratios, mask_flat, batch,
                             last_idx, aux_idx, ss_prob, deterministic,
                             ss_enabled=None):
        """Per-layer teacher-forced caption losses on matched pairs
        (reference pdvc.py:294-304 -> caption_prediction :325-445).

        With a shared caption head (the default) the D per-layer decodes
        batch into ONE scan over a (B, D*G) pair axis — identical math,
        1/D of the sequential word steps.
        """
        c = self.cfg
        D = c.dec_layers
        gt_mask = batch['gt_boxes_mask']
        B, G = gt_mask.shape
        cap = batch['cap_tensor']
        m = gt_mask.astype(jnp.float32)
        if not c.aux_loss:
            # only the last layer is supervised (reference pdvc.py:307-317)
            layers = [D - 1]
        else:
            layers = list(range(D))

        def layer_inputs(l_id):
            idx = last_idx if l_id == D - 1 else aux_idx[l_id]
            feats = jnp.take_along_axis(hs[l_id], idx[..., None], axis=1)
            if c.caption_decoder_type == 'light':
                return feats, None, None
            reference = self.layer_reference(init_reference, inter_refs,
                                             l_id)
            ref = jnp.take_along_axis(reference, idx[..., None], axis=1)
            center, scale = self._caption_reference(ref, valid_ratios,
                                                    shapes)
            return feats, center, scale

        def loss_key(l_id):
            return ('loss_caption' if l_id == D - 1
                    else f'loss_caption_{l_id}')

        losses = {}
        if c.share_caption_head and len(layers) > 1:
            head = self.caption_heads[0]
            parts = [layer_inputs(l) for l in layers]
            feats = jnp.concatenate([p[0] for p in parts], axis=1)
            nL = len(layers)
            caps_all = jnp.tile(cap, (1, nL, 1))
            if c.caption_decoder_type == 'light':
                lp = head(feats.reshape(B * nL * G, -1),
                          caps_all.reshape(B * nL * G, -1), ss_prob=ss_prob,
                          deterministic=deterministic, mode='forward',
                          ss_enabled=ss_enabled)
                lp = lp.reshape(B, nL * G, *lp.shape[1:])
            else:
                center = jnp.concatenate([p[1] for p in parts], axis=1)
                scale = jnp.concatenate([p[2] for p in parts], axis=1)
                lp = self._run_caption_forward(
                    head, feats, center, scale, memory, shapes, mask_flat,
                    caps_all, ss_prob, deterministic, ss_enabled)
            per_cap = caption_nll(
                lp, caps_all[..., 1:],
                jnp.tile(batch['cap_mask'], (1, nL, 1))[..., 1:])
            per_cap = per_cap.reshape(B, nL, G)
            for i, l_id in enumerate(layers):
                losses[loss_key(l_id)] = ((per_cap[:, i] * m).sum()
                                          / jnp.maximum(m.sum(), 1.0))
            return losses

        for l_id in layers:
            feats, center, scale = layer_inputs(l_id)
            head = self.caption_heads[l_id]
            if c.caption_decoder_type == 'light':
                lp = head(feats.reshape(B * G, -1), cap.reshape(B * G, -1),
                          ss_prob=ss_prob, deterministic=deterministic,
                          mode='forward', ss_enabled=ss_enabled)
                lp = lp.reshape(B, G, *lp.shape[1:])
            else:
                lp = self._run_caption_forward(
                    head, feats, center, scale, memory, shapes, mask_flat,
                    cap, ss_prob, deterministic, ss_enabled)
            per_cap = caption_nll(lp, cap[..., 1:],
                                  batch['cap_mask'][..., 1:])
            losses[loss_key(l_id)] = ((per_cap * m).sum()
                                      / jnp.maximum(m.sum(), 1.0))
        return losses

    def caption_sample(self, l_id, hs_lid, reference, memory, shapes,
                       valid_ratios, mask_flat):
        """Greedy per-query decode for eval (reference
        caption_prediction_eval, pdvc.py:447-490)."""
        c = self.cfg
        B, Nq, d = hs_lid.shape
        head = self.caption_heads[l_id]
        sample_kw = dict(sample_max=c.sample_max,
                         temperature=c.sample_temperature)
        if c.caption_decoder_type == 'light':
            seq, lp = head(hs_lid.reshape(B * Nq, d), None, mode='sample',
                           **sample_kw)
        else:
            center, scale = self._caption_reference(reference, valid_ratios,
                                                    shapes)
            shapes_t, mem_t, mask_t, center_t, scale_t = truncate_levels(
                c.caption, shapes, memory, mask_flat, center, scale)
            seq, lp = head(hs_lid, center_t, scale_t, mem_t, shapes_t,
                           mask_t, mode='sample', **sample_kw)
        return (seq.reshape(B, Nq, -1), lp.reshape(B, Nq, -1))

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def __call__(self, batch, eval_mode: bool = False, ss_prob: float = 0.0,
                 deterministic: Optional[bool] = None,
                 ss_enabled: Optional[bool] = None):
        c = self.cfg
        if deterministic is None:
            deterministic = eval_mode
        memory, shapes, valid_ratios, mask_flat = self.encode(
            batch, deterministic)

        two_stage = c.transformer_input_type == 'gt_proposals'
        disable_refine = two_stage
        B = memory.shape[0]
        if two_stage:
            init_reference, tgt, query_pos = self.prepare_decoder_proposals(
                batch['gt_boxes'])
            query_mask = batch['gt_boxes_mask']
        else:
            init_reference, tgt, query_pos = self.prepare_decoder_queries(
                memory)
            query_mask = jnp.ones((B, c.num_queries), bool)

        hs, inter_refs = self.decode(memory, shapes, valid_ratios, mask_flat,
                                     init_reference, tgt, query_pos,
                                     query_mask, deterministic,
                                     disable_refine)

        train_path = not eval_mode and c.caption_decoder_type != 'none'
        cls_s, cnt_s, coord_s = self.head_outputs(
            hs, init_reference, inter_refs, disable_refine,
            train_path=train_path)
        outputs = {'pred_logits': cls_s, 'pred_count': cnt_s,
                   'pred_boxes': coord_s}

        losses, last_idx, aux_idx = criterion_forward(
            c.criterion, outputs, batch['gt_labels'], batch['gt_boxes'],
            batch['gt_boxes_mask'], aux_loss=c.aux_loss)

        out = {'pred_logits': cls_s[-1], 'pred_count': cnt_s[-1],
               'pred_boxes': coord_s[-1], 'matched_indices': last_idx}

        if train_path:
            # caption loss on matched pairs for every decoder layer
            losses.update(self.caption_train_losses(
                hs, init_reference, inter_refs, memory, shapes,
                valid_ratios, mask_flat, batch, last_idx, aux_idx, ss_prob,
                deterministic, ss_enabled))
        elif eval_mode and c.caption_decoder_type != 'none':
            l_id = c.dec_layers - 1
            reference = self.layer_reference(init_reference, inter_refs, l_id)
            seq, cap_prob_eval = self.caption_sample(
                l_id, hs[l_id], reference, memory, shapes, valid_ratios,
                mask_flat)
            out['seq'] = seq
            out['cap_prob_eval'] = cap_prob_eval

        return out, losses
