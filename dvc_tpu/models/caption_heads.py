"""Caption heads: none / light (LSTM) / standard (LSTM-DSA).

Reference: ``pdvc/CaptioningHead/{Puppet,LSTM,LSTM_DSA}.py``.  Each head
decodes a sentence per (matched) event query:

* ``light`` — 1-layer bias-free LSTM whose per-step input is
  [word embedding ; event query feature] (``LSTM.py:141-174``).
* ``standard`` (LSTM-DSA) — at every word step the joint query
  [LSTM hidden ; event query] drives deformable sampling around the event's
  reference point; an additive attention over the raw sampled taps produces
  the visual context fed to the LSTM (``LSTM_DSA.py:189-270``).

TPU design: the reference's per-word python loops with early ``break``
(``LSTM.py:79-80``) become fixed-length ``lax.scan``s with finished masks —
identical outputs since downstream losses/postprocessing mask on token != 0.
Parameters are raw ``self.param`` arrays so the step closures scan cleanly.
The value projection of the DSA attention is hoisted out of the scan (the
reference recomputes it every word step — same math, less work).

The reference's MSDeformAttnCap also creates attention_weights/output_proj
layers that are dead in its return_value path
(``ms_deform_attn_for_caption.py:115-123``); we do not reproduce dead
parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ms_deform_attn_sample_values
from .deformable_transformer import msda_offset_bias_init


def uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def caption_nll(logprobs, target, mask):
    """Masked NLL per caption (reference ``LSTM.py:51-55``).

    logprobs: (..., Lsteps, V+1); target/mask: (..., Lsteps).
    Returns per-caption loss (...,) = -sum(logprob[target]) / len.
    """
    picked = jnp.take_along_axis(logprobs, target[..., None], axis=-1)[..., 0]
    m = mask.astype(logprobs.dtype)
    return -(picked * m).sum(-1) / (m.sum(-1) + 1e-6)


class _LSTMParams:
    """Bias-free multi-layer LSTM (torch nn.LSTM(bias=False) parity)."""

    def make(mod: nn.Module, name: str, in_dim: int, rnn_size: int,
             num_layers: int):
        params = []
        for l in range(num_layers):
            d_in = in_dim if l == 0 else rnn_size
            bound = 1.0 / (rnn_size ** 0.5)
            w_ih = mod.param(f'{name}_w_ih_l{l}', uniform_init(bound),
                             (d_in, 4 * rnn_size))
            w_hh = mod.param(f'{name}_w_hh_l{l}', uniform_init(bound),
                             (rnn_size, 4 * rnn_size))
            params.append((w_ih, w_hh))
        return params

    @staticmethod
    def step(params, x, state):
        """x: (N, in_dim); state: (h, c) each (num_layers, N, R)."""
        h_prev, c_prev = state
        hs, cs = [], []
        inp = x
        for l, (w_ih, w_hh) in enumerate(params):
            z = inp @ w_ih + h_prev[l] @ w_hh
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c_prev[l] + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            hs.append(h)
            cs.append(c)
            inp = h
        return inp, (jnp.stack(hs), jnp.stack(cs))


@dataclasses.dataclass
class CaptionHeadConfig:
    vocab_size: int
    input_encoding_size: int
    rnn_size: int
    num_layers: int
    drop_prob: float
    max_caption_len: int
    hidden_dim: int
    att_hid_size: int = 512
    cap_nheads: int = 8
    cap_dec_n_points: int = 4
    cap_num_feature_levels: int = 4


class _CaptionHeadBase(nn.Module):
    """Shared embed/logit/scan machinery for the LSTM heads."""
    cfg: CaptionHeadConfig

    def _common_params(self, lstm_in_dim):
        cfg = self.cfg
        V = cfg.vocab_size
        embed = self.param('embed', uniform_init(0.1),
                           (V + 1, cfg.input_encoding_size))
        logit_w = self.param('logit_w', uniform_init(0.1),
                             (cfg.rnn_size, V + 1))
        logit_b = self.param('logit_b', nn.initializers.zeros, (V + 1,))
        lstm = _LSTMParams.make(self, 'rnn', lstm_in_dim, cfg.rnn_size,
                                cfg.num_layers)
        return embed, (logit_w, logit_b), lstm

    def _logprobs(self, output, logit, drop_rng, deterministic):
        logit_w, logit_b = logit
        if not deterministic and self.cfg.drop_prob > 0:
            keep = 1.0 - self.cfg.drop_prob
            mask = jax.random.bernoulli(drop_rng, keep, output.shape)
            output = jnp.where(mask, output / keep, 0.0)
        return jax.nn.log_softmax(output @ logit_w + logit_b, axis=-1)

    def _teacher_forcing(self, step_fn, seq, n, ss_prob, deterministic):
        """Scan over word steps 0..Lcap-2 with scheduled sampling.

        step_fn(it, state, drop_rng) -> (logprobs, state).
        seq: (N, Lcap) int tokens.  Returns logprobs (N, Lcap-1, V+1).
        """
        cfg = self.cfg
        L = seq.shape[-1]
        h0 = jnp.zeros((cfg.num_layers, n, cfg.rnn_size))
        state0 = (h0, h0)
        base_rng = (self.make_rng('sample')
                    if not deterministic else jax.random.PRNGKey(0))
        drop_base = (self.make_rng('dropout')
                     if not deterministic else jax.random.PRNGKey(0))
        lp0 = jnp.zeros((n, cfg.vocab_size + 1))

        def body(carry, inp):
            state, prev_lp = carry
            i, tok = inp
            it = tok
            if not deterministic:
                # scheduled sampling (reference LSTM.py:64-75): with prob
                # ss_prob (and only for steps >= 1) feed a sample from the
                # previous step's distribution instead of the gt token.
                rng_i = jax.random.fold_in(base_rng, i)
                r_b, r_c = jax.random.split(rng_i)
                use_sample = (jax.random.uniform(r_b, (n,)) < ss_prob) & (i >= 1)
                sampled = jax.random.categorical(r_c, prev_lp, axis=-1)
                it = jnp.where(use_sample, sampled, tok)
            lp, state = step_fn(it, state, jax.random.fold_in(drop_base, i))
            return (state, lp), lp

        xs = (jnp.arange(L - 1), jnp.moveaxis(seq[:, :-1], 1, 0))
        _, lps = jax.lax.scan(body, (state0, lp0), xs)
        return jnp.moveaxis(lps, 0, 1)  # (N, Lcap-1, V+1)

    def _greedy_sample(self, step_fn, n, deterministic=True):
        """Fixed-length greedy decode (reference ``LSTM.py:94-139``).

        Returns seq (N, max_caption_len) and per-token logprobs; tokens are
        zeroed once a query emits EOS (token 0).
        """
        cfg = self.cfg
        h0 = jnp.zeros((cfg.num_layers, n, cfg.rnn_size))
        state0 = (h0, h0)
        dummy_rng = jax.random.PRNGKey(0)
        # t = 0: feed BOS
        lp0, state1 = step_fn(jnp.zeros((n,), jnp.int32), state0, dummy_rng)

        def body(carry, t):
            state, lp, unfinished = carry
            sample_lp = jnp.max(lp, axis=-1)
            it = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            new_lp, state = step_fn(it, state, dummy_rng)
            unfinished = unfinished & (it > 0)
            seq_t = jnp.where(unfinished, it, 0)
            return (state, new_lp, unfinished), (seq_t, sample_lp)

        # reference records at t>=1 with unfinished init from the first token
        def first(carry, t):
            state, lp, _ = carry
            sample_lp = jnp.max(lp, axis=-1)
            it = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            new_lp, state = step_fn(it, state, dummy_rng)
            unfinished = it > 0
            return (state, new_lp, unfinished), (it * unfinished, sample_lp)

        carry = (state1, lp0, jnp.ones((n,), bool))
        carry, (s1, l1) = first(carry, 1)
        if cfg.max_caption_len > 1:
            carry, (ss, ls) = jax.lax.scan(
                body, carry, jnp.arange(2, cfg.max_caption_len + 1))
            seq = jnp.concatenate([s1[None], ss], axis=0)
            lps = jnp.concatenate([l1[None], ls], axis=0)
        else:
            seq, lps = s1[None], l1[None]
        return jnp.moveaxis(seq, 0, 1), jnp.moveaxis(lps, 0, 1)


class LightCaptionHead(_CaptionHeadBase):
    """'light' head (reference ``LSTM.py:141-174``): LSTM over
    [word embedding ; query feature]."""

    def _make_step(self, feats, deterministic):
        cfg = self.cfg
        in_dim = cfg.input_encoding_size + cfg.hidden_dim
        embed, logit, lstm = self._common_params(in_dim)

        def step_fn(it, state, drop_rng):
            xt = embed[it]
            out, state = _LSTMParams.step(lstm, jnp.concatenate([xt, feats], -1),
                                          state)
            return self._logprobs(out, logit, drop_rng, deterministic), state
        return step_fn

    @nn.compact
    def __call__(self, feats, seq, ss_prob=0.0, deterministic=True,
                 mode='forward'):
        """feats: (N, hidden) query features of the caption batch;
        seq: (N, Lcap) gt tokens (mode='forward') or ignored (mode='sample')."""
        step_fn = self._make_step(feats, deterministic)
        n = feats.shape[0]
        if mode == 'forward':
            return self._teacher_forcing(step_fn, seq, n, ss_prob,
                                         deterministic)
        return self._greedy_sample(step_fn, n)


class DSACaptionHead(_CaptionHeadBase):
    """'standard' head, LSTM-DSA (reference ``LSTM_DSA.py:189-270``)."""
    msda_impl: str = 'auto'

    def _dsa_params(self):
        cfg = self.cfg
        d = cfg.hidden_dim
        H, L, P = cfg.cap_nheads, cfg.cap_num_feature_levels, cfg.cap_dec_n_points
        off_w = self.param('dsa_sampling_offsets_w', nn.initializers.zeros,
                           (cfg.rnn_size + d, H * L * P))
        off_b = self.param('dsa_sampling_offsets_b',
                           msda_offset_bias_init(H, L, P, center=True),
                           (H * L * P,))
        val_w = self.param('dsa_value_w', nn.initializers.xavier_uniform(),
                           (d, d))
        val_b = self.param('dsa_value_b', nn.initializers.zeros, (d,))
        att = None
        if cfg.att_hid_size > 0:
            Dh = d // H
            att = dict(
                ctx2att_w=self.param('ctx2att_w',
                                     nn.initializers.lecun_normal(), (Dh, cfg.att_hid_size)),
                ctx2att_b=self.param('ctx2att_b', nn.initializers.zeros,
                                     (cfg.att_hid_size,)),
                h2att_w=self.param('h2att_w', nn.initializers.lecun_normal(),
                                   (cfg.rnn_size, cfg.att_hid_size)),
                h2att_b=self.param('h2att_b', nn.initializers.zeros,
                                   (cfg.att_hid_size,)),
                alpha_w=self.param('alpha_net_w',
                                   nn.initializers.lecun_normal(), (cfg.att_hid_size, 1)),
                alpha_b=self.param('alpha_net_b', nn.initializers.zeros, (1,)),
            )
        return off_w, off_b, val_w, val_b, att

    def _make_step(self, query, ref_center, offset_scale, memory,
                   temporal_shapes, pad_mask, deterministic):
        """query: (B, Pq, d); ref_center/offset_scale: (B, Pq, L) — the two
        reference-point branches of the reference's MSDeformAttnCap
        (``ms_deform_attn_for_caption.py:102-108``) unified as
        loc = center + offsets * scale (scale = 1/T_l for 1-d references,
        length*0.5/n_points for box references), which lets matched pairs
        from different decoder layers batch into one scan;
        memory: (B, S, d); pad_mask: (B, S) True = pad."""
        cfg = self.cfg
        B, Pq, d = query.shape
        H = cfg.cap_nheads
        L = cfg.cap_num_feature_levels
        P = cfg.cap_dec_n_points
        Dh = d // H
        n = B * Pq
        in_dim = cfg.input_encoding_size + 2 * d
        embed, logit, lstm = self._common_params(in_dim)
        off_w, off_b, val_w, val_b, att = self._dsa_params()

        # hoisted value projection (reference recomputes per word step)
        value = memory @ val_w + val_b
        if pad_mask is not None:
            value = jnp.where(pad_mask[..., None], 0.0, value)
        value = value.reshape(B, -1, H, Dh)

        def step_fn(it, state, drop_rng):
            h_top = state[0][-1]                      # (n, R)
            joint = jnp.concatenate(
                [h_top.reshape(B, Pq, cfg.rnn_size), query], -1)
            offsets = (joint @ off_w + off_b).reshape(B, Pq, H, L, P)
            loc = (ref_center[:, :, None, :, None]
                   + offsets * offset_scale[:, :, None, :, None])
            taps = ms_deform_attn_sample_values(
                value, tuple(temporal_shapes), loc, mode='border')
            # (B, Pq, H, L, P, Dh) -> (n, H, L*P, Dh)
            taps = taps.reshape(n, H, L * P, Dh)

            if att is not None:
                # additive attention over sample points (LSTM_DSA.py:245-257)
                a = jnp.tanh(taps @ att['ctx2att_w'] + att['ctx2att_b']
                             + (h_top @ att['h2att_w']
                                + att['h2att_b'])[:, None, None, :])
                dot = (a @ att['alpha_w'] + att['alpha_b'])[..., 0]  # (n,H,LP)
                w = jax.nn.softmax(dot, axis=-1)
                ctx = jnp.einsum('nhp,nhpd->nhd', w, taps)
            else:
                ctx = taps.mean(axis=2)
            ctx = ctx.reshape(n, H * Dh)

            xt = embed[it]
            x = jnp.concatenate([xt, ctx, query.reshape(n, d)], -1)
            out, state = _LSTMParams.step(lstm, x, state)
            return self._logprobs(out, logit, drop_rng, deterministic), state
        return step_fn

    @nn.compact
    def __call__(self, query, ref_center, offset_scale, memory,
                 temporal_shapes, pad_mask, seq=None, ss_prob=0.0,
                 deterministic=True, mode='forward'):
        step_fn = self._make_step(query, ref_center, offset_scale, memory,
                                  temporal_shapes, pad_mask, deterministic)
        n = query.shape[0] * query.shape[1]
        if mode == 'forward':
            seq_flat = seq.reshape(n, -1)
            return self._teacher_forcing(step_fn, seq_flat, n, ss_prob,
                                         deterministic)
        return self._greedy_sample(step_fn, n)


def truncate_levels(cfg: CaptionHeadConfig, temporal_shapes: Sequence[int],
                    memory, pad_mask, ref_center, offset_scale):
    """Optionally restrict the caption head to the first
    ``cap_num_feature_levels`` levels (reference ``LSTM_DSA.py:78-86``)."""
    L = cfg.cap_num_feature_levels
    if L >= len(temporal_shapes):
        return (tuple(temporal_shapes), memory, pad_mask, ref_center,
                offset_scale)
    shapes = tuple(temporal_shapes[:L])
    S = sum(shapes)
    return (shapes, memory[:, :S], pad_mask[:, :S],
            ref_center[..., :L], offset_scale[..., :L])
