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
from ..ops.dsa_scan import dsa_teacher_scan
from ..ops.dsa_greedy import dsa_greedy_scan, greedy_mask_outputs
from ..ops.dsa_step import dsa_lstm_step, dsa_sample_attend
from ..ops.embed import embed_lookup
from .deformable_transformer import msda_offset_bias_init


def uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def caption_nll(logprobs, target, mask):
    """Masked NLL per caption (reference ``LSTM.py:51-55``).

    logprobs: (..., Lsteps, V+1); target/mask: (..., Lsteps).
    Returns per-caption loss (...,) = -sum(logprob[target]) / len.
    The pick is a one-hot contraction rather than take_along_axis: its VJP
    is then an elementwise product instead of a TPU scatter.
    """
    onehot = jax.nn.one_hot(target, logprobs.shape[-1],
                            dtype=logprobs.dtype)
    picked = (logprobs * onehot).sum(-1)
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

    @staticmethod
    def step_pre(params, z0, state):
        """LSTM step with the layer-0 input preactivation ``z0 = x @ w_ih``
        already computed (N, 4R).  Lets callers hoist the per-step-constant
        contributions (event query, gt-token embeddings) out of the word
        scan: x @ w_ih = Σ x_part @ w_ih_part, so constants batch into one
        MXU matmul outside the sequential loop."""
        h_prev, c_prev = state
        hs, cs = [], []
        inp = None
        for l, (w_ih, w_hh) in enumerate(params):
            z = (z0 if l == 0 else inp @ w_ih) + h_prev[l] @ w_hh
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
    # rematerialize the word-scan step in the backward pass.  With the fused
    # sample+attend step kernel (ops/dsa_step.py) the big per-step activation
    # never reaches HBM, so recomputing the step costs more than it saves —
    # off by default; kept for the jnp attention path / memory-tight runs
    scan_remat: bool = False


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

    def _step_fn_from_core(self, core, deterministic):
        """Per-token step (token id -> logprobs) on top of a core step."""
        embed, token_w, const_ih, logit, run = core

        def step_fn(it, state, drop_rng):
            z0 = embed_lookup(embed, it) @ token_w + const_ih
            out, state = run(z0, state)
            return self._logprobs(out, logit, drop_rng, deterministic), state
        return step_fn

    def _teacher_forcing(self, core, seq, n, ss_prob, deterministic,
                         ss_enabled):
        """Teacher-forced word scan 0..Lcap-2.

        Fast path (``ss_enabled=False``): the gt tokens are known up front,
        so the token-embedding contribution to the LSTM preactivation is one
        batched matmul over all steps, and the vocab projection + softmax of
        every step runs as one matmul after the scan — the sequential loop
        carries only the recurrent work.  With scheduled sampling the next
        input depends on the previous step's distribution (reference
        LSTM.py:64-75), so everything stays inside the scan.

        seq: (N, Lcap) int tokens.  Returns logprobs (N, Lcap-1, V+1).
        """
        cfg = self.cfg
        L = seq.shape[-1]
        h0 = jnp.zeros((cfg.num_layers, n, cfg.rnn_size))
        state0 = (h0, h0)
        drop_base = (self.make_rng('dropout')
                     if not deterministic else jax.random.PRNGKey(0))
        embed, token_w, const_ih, logit, run = core

        if not ss_enabled:
            z_all = (embed_lookup(embed, seq[:, :-1]) @ token_w
                     + const_ih[:, None, :])
            step = jax.checkpoint(run) if cfg.scan_remat else run

            def body(state, z0):
                out, state = step(z0, state)
                return state, out

            _, outs = jax.lax.scan(body, state0, jnp.moveaxis(z_all, 1, 0))
            # (L-1, N, R): dropout + vocab projection in one shot
            lps = self._logprobs(outs, logit, drop_base, deterministic)
            return jnp.moveaxis(lps, 0, 1)

        base_rng = (self.make_rng('sample')
                    if not deterministic else jax.random.PRNGKey(0))
        lp0 = jnp.zeros((n, cfg.vocab_size + 1))
        step_fn = self._step_fn_from_core(core, deterministic)

        def body(carry, inp):
            state, prev_lp = carry
            i, tok = inp
            # scheduled sampling: with prob ss_prob (and only for steps >= 1)
            # feed a sample from the previous step's distribution instead of
            # the gt token.
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

    def _greedy_sample(self, core, n, deterministic=True):
        """Fixed-length greedy decode (reference ``LSTM.py:94-139``).

        Returns seq (N, max_caption_len) and per-token logprobs; tokens are
        zeroed once a query emits EOS (token 0).

        Serving-path restructure (same outputs as the reference loop):

        * the token-embedding -> LSTM-preactivation chain is hoisted into
          one (V+1, 4R) table outside the scan — the per-step embed matmul
          becomes a row gather;
        * the full (N, V+1) log-softmax is never materialized: greedy needs
          only argmax (identical on raw logits) and the winner's logprob
          (max - logsumexp), so the scan carries two (N,) vectors instead
          of the (N, V+1) distribution.
        """
        cfg = self.cfg
        embed, token_w, const_ih, (logit_w, logit_b), run = core
        h0 = jnp.zeros((cfg.num_layers, n, cfg.rnn_size))
        # hoisted: token id -> layer-0 LSTM preactivation row
        token_z = embed @ token_w                         # (V+1, 4R)

        def proj_step(it, state):
            """Feed token ids; return (next argmax ids, their logprob)."""
            out, state = run(jnp.take(token_z, it, axis=0) + const_ih,
                             state)
            z = out @ logit_w + logit_b                   # raw logits
            m = jnp.max(z, axis=-1)
            nit = jnp.argmax(z, axis=-1).astype(jnp.int32)
            lse = m + jnp.log(jnp.sum(jnp.exp(z - m[:, None]), axis=-1))
            return nit, m - lse, state

        # t = 0: feed BOS; it1 = argmax of the first distribution
        it1, lp1, state1 = proj_step(jnp.zeros((n,), jnp.int32),
                                     (h0, h0))

        def body(carry, t):
            state, it, lp, unfinished = carry
            nit, nlp, state = proj_step(it, state)
            unfinished = unfinished & (it > 0)
            return ((state, nit, nlp, unfinished),
                    (it * unfinished, lp))

        carry = (state1, it1, lp1, jnp.ones((n,), bool))
        carry, (seq, lps) = jax.lax.scan(
            body, carry, jnp.arange(1, cfg.max_caption_len + 1))
        return jnp.moveaxis(seq, 0, 1), jnp.moveaxis(lps, 0, 1)

    def _stochastic_sample(self, core, n, temperature, base_rng):
        """Temperature multinomial decode (reference ``LSTM.py:113-120``:
        ``sample_max=0``): feed ``it ~ multinomial(exp(logprobs / T))``,
        emit the UNSCALED logprob of the sampled token; same fixed-length
        masked-scan restructure of the reference's early-break loop as
        :meth:`_greedy_sample`.  Dead code on the reference's own driver
        paths (every call site uses the greedy default) — kept for head
        API parity."""
        cfg = self.cfg
        step_fn = self._step_fn_from_core(core, True)
        h0 = jnp.zeros((cfg.num_layers, n, cfg.rnn_size))

        def pick(lp, t):
            r = jax.random.fold_in(base_rng, t)
            it = jax.random.categorical(r, lp / temperature, axis=-1)
            return (it.astype(jnp.int32),
                    jnp.take_along_axis(lp, it[:, None], axis=-1)[:, 0])

        lp0, state1 = step_fn(jnp.zeros((n,), jnp.int32), (h0, h0),
                              jax.random.PRNGKey(0))
        it1, slp1 = pick(lp0, 1)

        def body(carry, t):
            state, it, slp, unfinished = carry
            lp, state = step_fn(it, state, jax.random.PRNGKey(0))
            nit, nlp = pick(lp, t + 1)
            unfinished = unfinished & (it > 0)
            return ((state, nit, nlp, unfinished),
                    (it * unfinished, slp))

        carry = (state1, it1, slp1, jnp.ones((n,), bool))
        carry, (seq, lps) = jax.lax.scan(
            body, carry, jnp.arange(1, cfg.max_caption_len + 1))
        return jnp.moveaxis(seq, 0, 1), jnp.moveaxis(lps, 0, 1)


class LightCaptionHead(_CaptionHeadBase):
    """'light' head (reference ``LSTM.py:141-174``): LSTM over
    [word embedding ; query feature]."""

    def _make_core(self, feats):
        """x = [token emb ; feats] -> z0 = emb@W_tok + feats@W_feat, with the
        feats contribution hoisted (constant across word steps)."""
        cfg = self.cfg
        E = cfg.input_encoding_size
        in_dim = E + cfg.hidden_dim
        embed, logit, lstm = self._common_params(in_dim)
        w_ih0 = lstm[0][0]
        token_w = w_ih0[:E]
        const_ih = feats @ w_ih0[E:]

        def run(z0, state):
            return _LSTMParams.step_pre(lstm, z0, state)
        return (embed, token_w, const_ih, logit, run)

    @nn.compact
    def __call__(self, feats, seq, ss_prob=0.0, deterministic=True,
                 mode='forward', ss_enabled=None, sample_max=True,
                 temperature=1.0):
        """feats: (N, hidden) query features of the caption batch;
        seq: (N, Lcap) gt tokens (mode='forward') or ignored (mode='sample').
        ss_enabled must be a *static* bool: whether scheduled sampling can
        fire (defaults to ``not deterministic``, the reference's behavior).
        sample_max/temperature mirror the reference ``sample(opt=...)``
        surface (``LSTM.py:96-98``): greedy by default, temperature
        multinomial otherwise."""
        if ss_enabled is None:
            ss_enabled = not deterministic
        core = self._make_core(feats)
        n = feats.shape[0]
        if mode == 'forward':
            return self._teacher_forcing(core, seq, n, ss_prob,
                                         deterministic, ss_enabled)
        if not sample_max:
            rng = (self.make_rng('sample') if self.has_rng('sample')
                   else jax.random.PRNGKey(0))
            return self._stochastic_sample(core, n, temperature, rng)
        return self._greedy_sample(core, n)


class DSACaptionHead(_CaptionHeadBase):
    """'standard' head, LSTM-DSA (reference ``LSTM_DSA.py:189-270``)."""
    msda_impl: str = 'auto'
    att_impl: str = 'auto'
    att_precision: str = 'float32'
    # fuse the LSTM cell into the sample+attend kernel (one launch per word
    # step; requires num_layers == 1 and att_hid_size > 0) — same math,
    # oracle/interpret/shard_map-tested.  Default OFF until a real-Mosaic
    # compile + timing run (the kernel adds lane-dim split/concat and
    # int-indexed ref stores that interpret mode cannot vouch for; same
    # posture as ops/dsa_step.py's _TANH_DEFAULT): flip via
    # --dsa_lstm_fuse 1 / this attr after
    # `python tools/bench_honest.py --what lstm` succeeds on hardware
    lstm_fuse: bool = False
    # run the WHOLE teacher-forcing word scan as one pallas_call
    # (ops/dsa_scan.py): LSTM state lives in VMEM scratch across steps,
    # `value` is read from HBM once per video instead of once per word
    # step, and the backward scan accumulates dvalue/weight grads
    # in-VMEM.  Train-path only (greedy/scheduled-sampling feedback needs
    # stepwise decode); requires num_layers == 1 and att_hid_size > 0.
    # Default ON — hardware-validated win (30.02 ms/step fused vs 31.36
    # stepwise at B=16; HW_VALIDATION.jsonl stages scan_fuse0/1); flip
    # off via --dsa_scan_fuse 0
    scan_fuse: bool = True
    # run the WHOLE eval-time greedy decode as one pallas_call
    # (ops/dsa_greedy.py): argmax feedback, vocab projection and token
    # embedding inside the kernel, LSTM state + fed-back one-hot in VMEM
    # scratch.  Requires num_layers == 1 and att_hid_size > 0.  Default
    # ON — hardware-validated win (19.35 ms/eval-step fused vs 23.85
    # stepwise at B=16; HW_VALIDATION.jsonl stages greedy_fuse0/1); flip
    # off via --dsa_greedy_fuse 0
    greedy_fuse: bool = True

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

    def _make_core(self, query, ref_center, offset_scale, memory,
                   temporal_shapes, pad_mask):
        """query: (B, Pq, d); ref_center/offset_scale: (B, Pq, L) — the two
        reference-point branches of the reference's MSDeformAttnCap
        (``ms_deform_attn_for_caption.py:102-108``) unified as
        loc = center + offsets * scale (scale = 1/T_l for 1-d references,
        length*0.5/n_points for box references), which lets matched pairs
        from different decoder layers batch into one scan;
        memory: (B, S, d); pad_mask: (B, S) True = pad.

        Per-step-constant matmul contributions are hoisted out of the word
        scan: the value projection (the reference recomputes it every step),
        the event query's share of the sampling-offset projection, and the
        query's share of the LSTM layer-0 preactivation."""
        cfg = self.cfg
        B, Pq, d = query.shape
        H = cfg.cap_nheads
        L = cfg.cap_num_feature_levels
        P = cfg.cap_dec_n_points
        Dh = d // H
        R = cfg.rnn_size
        E = cfg.input_encoding_size
        n = B * Pq
        in_dim = E + 2 * d
        embed, logit, lstm = self._common_params(in_dim)
        off_w, off_b, val_w, val_b, att = self._dsa_params()

        # hoisted value projection (reference recomputes per word step)
        value = memory @ val_w + val_b
        if pad_mask is not None:
            value = jnp.where(pad_mask[..., None], 0.0, value)
        value = value.reshape(B, -1, H, Dh)

        # hoisted query contributions: sampling offsets + LSTM layer 0
        off_const = query @ off_w[R:] + off_b                 # (B, Pq, HLP)
        w_ih0 = lstm[0][0]
        token_w = w_ih0[:E]
        ctx_w = w_ih0[E:E + d]
        const_ih = query.reshape(n, d) @ w_ih0[E + d:]        # (n, 4R)

        fuse = self.lstm_fuse and att is not None and cfg.num_layers == 1

        def run(z0, state):
            h_top = state[0][-1]                              # (n, R)
            offsets = (h_top.reshape(B, Pq, R) @ off_w[:R]
                       + off_const).reshape(B, Pq, H, L, P)
            if fuse:
                # one fused launch per word step: tap sampling, additive
                # attention AND the LSTM cell live entirely in VMEM — ctx
                # and the gate preactivations never reach HBM (see
                # ops/dsa_step.py::dsa_lstm_step)
                hvec = (h_top @ att['h2att_w']
                        + att['h2att_b']).reshape(B, Pq, -1)
                h_new, c_new = dsa_lstm_step(
                    value, offsets, ref_center, offset_scale, hvec,
                    z0.reshape(B, Pq, 4 * R), h_top.reshape(B, Pq, R),
                    state[1][-1].reshape(B, Pq, R), ctx_w, lstm[0][1],
                    att['ctx2att_w'], att['ctx2att_b'],
                    att['alpha_w'][:, 0], att['alpha_b'][0],
                    tuple(temporal_shapes), impl=self.att_impl,
                    precision=self.att_precision)
                h_new = h_new.reshape(n, R)
                return h_new, (h_new[None], c_new.reshape(n, R)[None])
            if att is not None:
                # unfused fallback (multi-layer LSTM / A-B testing): the
                # sample+attend kernel alone, LSTM glue in XLA;
                # impl='ref' composes the same math from the standalone ops
                hvec = (h_top @ att['h2att_w']
                        + att['h2att_b']).reshape(B, Pq, -1)
                ctx = dsa_sample_attend(
                    value, offsets, ref_center, offset_scale, hvec,
                    att['ctx2att_w'], att['ctx2att_b'],
                    att['alpha_w'][:, 0], att['alpha_b'][0],
                    tuple(temporal_shapes), impl=self.att_impl,
                    precision=self.att_precision)
            else:
                loc = (ref_center[:, :, None, :, None]
                       + offsets * offset_scale[:, :, None, :, None])
                taps = ms_deform_attn_sample_values(
                    value, tuple(temporal_shapes), loc, mode='border')
                ctx = taps.reshape(n, H, L * P, Dh).mean(axis=2)
            ctx = ctx.reshape(n, H * Dh)
            return _LSTMParams.step_pre(lstm, z0 + ctx @ ctx_w, state)
        return (embed, token_w, const_ih, logit, run)

    def _fused_teacher_forcing(self, query, ref_center, offset_scale,
                               memory, temporal_shapes, pad_mask, seq,
                               deterministic):
        """Whole-scan fused path (ops/dsa_scan.py): hoist everything
        step-invariant, one launch for all K word steps, then the batched
        vocab projection.  Declares the same parameters as ``_make_core``
        (flax params are name-keyed, so the two paths share weights)."""
        cfg = self.cfg
        B, Pq, d = query.shape
        H = cfg.cap_nheads
        L = cfg.cap_num_feature_levels
        P = cfg.cap_dec_n_points
        Dh = d // H
        R = cfg.rnn_size
        E = cfg.input_encoding_size
        n = B * Pq
        embed, logit, lstm = self._common_params(E + 2 * d)
        off_w, off_b, val_w, val_b, att = self._dsa_params()

        value = memory @ val_w + val_b
        if pad_mask is not None:
            value = jnp.where(pad_mask[..., None], 0.0, value)
        value_t = value.reshape(B, -1, H, Dh).transpose(0, 2, 1, 3)

        # fold the step-invariant offset share into the base positions
        # (pos = (ref + off*scale)·T - 0.5 with off = off_const + h@W):
        # base carries ref + off_const·scale, the kernel adds h@W·scale.
        # f32 throughout — bf16 positions at T~400 destroy the lerp.
        off_const = (query @ off_w[R:] + off_b).reshape(B, Pq, H, L, P)
        t_vec = jnp.asarray(temporal_shapes, jnp.float32)
        ref32 = ref_center.astype(jnp.float32)[:, :, None, :, None]
        scale32 = offset_scale.astype(jnp.float32)[:, :, None, :, None]
        base = ((ref32 + off_const.astype(jnp.float32) * scale32)
                * t_vec[None, None, None, :, None] - 0.5)
        base_pos = base.transpose(0, 2, 1, 3, 4).reshape(B, H, Pq, L * P)
        scale_t = (offset_scale.astype(jnp.float32)[:, :, :, None]
                   * t_vec[None, None, :, None])
        scale_t = jnp.broadcast_to(
            scale_t, (B, Pq, L, P)).reshape(B, Pq, L * P)

        w_ih0, w_hh = lstm[0]
        token_w = w_ih0[:E]
        ctx_w3 = w_ih0[E:E + d].reshape(H, Dh, 4 * R)
        const_ih = query.reshape(n, d) @ w_ih0[E + d:]
        K = seq.shape[-1] - 1
        # build z_all directly in the kernel's (B, K, Pq, 4R) order: the
        # transpose rides the tiny int token grid instead of the wide f32
        # preactivation tensor (the device profile booked ~0.25 ms/step of
        # copy/pad fusions to the (B, Pq, K, 4R) -> (B, K, Pq, 4R) form)
        tokens = seq[:, :-1].reshape(B, Pq, K).transpose(0, 2, 1)
        z_all = (embed_lookup(embed, tokens) @ token_w
                 + const_ih.reshape(B, 1, Pq, 4 * R))     # (B, K, Pq, 4R)
        off_w_h = off_w[:R].reshape(R, H, L * P).transpose(1, 0, 2)

        hs = dsa_teacher_scan(
            value_t, base_pos, scale_t, z_all, off_w_h,
            att['h2att_w'], att['h2att_b'], att['ctx2att_w'],
            att['ctx2att_b'], att['alpha_w'][:, 0], att['alpha_b'][0],
            ctx_w3, w_hh, tuple(temporal_shapes), impl=self.att_impl,
            precision=self.att_precision)                 # (B, K, Pq, R)
        hs = hs.transpose(0, 2, 1, 3).reshape(n, K, R)
        drop_base = (self.make_rng('dropout')
                     if not deterministic else jax.random.PRNGKey(0))
        return self._logprobs(hs, logit, drop_base, deterministic)

    def _fused_greedy_sample(self, query, ref_center, offset_scale,
                             memory, temporal_shapes, pad_mask):
        """Whole-decode fused path (ops/dsa_greedy.py): one launch for
        all K greedy steps with the argmax feedback, vocab projection
        and token embedding inside the kernel.  Hoists mirror
        ``_fused_teacher_forcing`` (same flax param names, so the two
        paths share weights)."""
        cfg = self.cfg
        B, Pq, d = query.shape
        H = cfg.cap_nheads
        L = cfg.cap_num_feature_levels
        P = cfg.cap_dec_n_points
        Dh = d // H
        R = cfg.rnn_size
        E = cfg.input_encoding_size
        n = B * Pq
        embed, (logit_w, logit_b), lstm = self._common_params(E + 2 * d)
        off_w, off_b, val_w, val_b, att = self._dsa_params()

        value = memory @ val_w + val_b
        if pad_mask is not None:
            value = jnp.where(pad_mask[..., None], 0.0, value)
        value_t = value.reshape(B, -1, H, Dh).transpose(0, 2, 1, 3)

        off_const = (query @ off_w[R:] + off_b).reshape(B, Pq, H, L, P)
        t_vec = jnp.asarray(temporal_shapes, jnp.float32)
        ref32 = ref_center.astype(jnp.float32)[:, :, None, :, None]
        scale32 = offset_scale.astype(jnp.float32)[:, :, None, :, None]
        base = ((ref32 + off_const.astype(jnp.float32) * scale32)
                * t_vec[None, None, None, :, None] - 0.5)
        base_pos = base.transpose(0, 2, 1, 3, 4).reshape(B, H, Pq, L * P)
        scale_t = (offset_scale.astype(jnp.float32)[:, :, :, None]
                   * t_vec[None, None, :, None])
        scale_t = jnp.broadcast_to(
            scale_t, (B, Pq, L, P)).reshape(B, Pq, L * P)

        w_ih0, w_hh = lstm[0]
        token_w = w_ih0[:E]                               # (E, 4R)
        ctx_w3 = w_ih0[E:E + d].reshape(H, Dh, 4 * R)
        const_z = (query.reshape(n, d)
                   @ w_ih0[E + d:]).reshape(B, Pq, 4 * R)
        off_w_h = off_w[:R].reshape(R, H, L * P).transpose(1, 0, 2)

        tok, lp = dsa_greedy_scan(
            value_t, base_pos, scale_t, const_z, embed, token_w, logit_w,
            logit_b, off_w_h, att['h2att_w'], att['h2att_b'],
            att['ctx2att_w'], att['ctx2att_b'], att['alpha_w'][:, 0],
            att['alpha_b'][0], ctx_w3, w_hh, tuple(temporal_shapes),
            cfg.max_caption_len, impl=self.att_impl,
            precision=self.att_precision)                 # (B, K, Pq) x2
        seq, lps = greedy_mask_outputs(tok, lp)
        K = cfg.max_caption_len
        return (seq.transpose(0, 2, 1).reshape(n, K),
                lps.transpose(0, 2, 1).reshape(n, K))

    @nn.compact
    def __call__(self, query, ref_center, offset_scale, memory,
                 temporal_shapes, pad_mask, seq=None, ss_prob=0.0,
                 deterministic=True, mode='forward', ss_enabled=None,
                 sample_max=True, temperature=1.0):
        if ss_enabled is None:
            ss_enabled = not deterministic
        cfg = self.cfg
        if (mode == 'forward' and self.scan_fuse and not ss_enabled
                and cfg.att_hid_size > 0 and cfg.num_layers == 1):
            return self._fused_teacher_forcing(
                query, ref_center, offset_scale, memory, temporal_shapes,
                pad_mask, seq.reshape(query.shape[0] * query.shape[1], -1),
                deterministic)
        if (mode == 'sample' and sample_max and self.greedy_fuse
                and cfg.att_hid_size > 0 and cfg.num_layers == 1):
            return self._fused_greedy_sample(
                query, ref_center, offset_scale, memory, temporal_shapes,
                pad_mask)
        core = self._make_core(query, ref_center, offset_scale, memory,
                               temporal_shapes, pad_mask)
        n = query.shape[0] * query.shape[1]
        if mode == 'forward':
            seq_flat = seq.reshape(n, -1)
            return self._teacher_forcing(core, seq_flat, n, ss_prob,
                                         deterministic, ss_enabled)
        if not sample_max:
            rng = (self.make_rng('sample') if self.has_rng('sample')
                   else jax.random.PRNGKey(0))
            return self._stochastic_sample(core, n, temperature, rng)
        return self._greedy_sample(core, n)


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
