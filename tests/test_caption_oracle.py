"""Numpy oracle for the light caption head: teacher forcing and greedy
decode must match a hand-rolled LSTM step-by-step implementation exactly
(gate order, scan carries, EOS masking — reference ``LSTM.py`` semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.models.caption_heads import CaptionHeadConfig, LightCaptionHead


def np_lstm_step(x, h, c, w_ih, w_hh):
    z = x @ w_ih + h @ w_hh
    R = h.shape[-1]
    i, f, g, o = (z[:, :R], z[:, R:2 * R], z[:, 2 * R:3 * R], z[:, 3 * R:])
    sig = lambda v: 1 / (1 + np.exp(-v))
    c2 = sig(f) * c + sig(i) * np.tanh(g)
    h2 = sig(o) * np.tanh(c2)
    return h2, c2


def np_log_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(-1, keepdims=True))


def setup_head():
    cfg = CaptionHeadConfig(
        vocab_size=9, input_encoding_size=6, rnn_size=8, num_layers=1,
        drop_prob=0.0, max_caption_len=6, hidden_dim=5)
    head = LightCaptionHead(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    seq = jnp.asarray(rng.integers(1, 9, (3, 6)).astype(np.int32))
    seq = seq.at[:, 0].set(0)
    seq = seq.at[1, 3:].set(0)  # one caption ends early
    params = head.init({'params': jax.random.PRNGKey(0)}, feats, seq,
                       deterministic=True, mode='forward')
    p = {k: np.asarray(v) for k, v in params['params'].items()}
    return cfg, head, params, p, np.asarray(feats), np.asarray(seq)


def test_teacher_forcing_matches_numpy():
    cfg, head, params, p, feats, seq = setup_head()
    lp = np.asarray(head.apply(params, jnp.asarray(feats), jnp.asarray(seq),
                               deterministic=True, mode='forward'))
    n, R = 3, cfg.rnn_size
    h = np.zeros((n, R), np.float32)
    c = np.zeros((n, R), np.float32)
    for t in range(seq.shape[1] - 1):
        xt = p['embed'][seq[:, t]]
        x = np.concatenate([xt, feats], -1)
        h, c = np_lstm_step(x, h, c, p['rnn_w_ih_l0'], p['rnn_w_hh_l0'])
        want = np_log_softmax(h @ p['logit_w'] + p['logit_b'])
        np.testing.assert_allclose(lp[:, t], want, rtol=2e-5, atol=2e-5)


def test_greedy_decode_matches_numpy():
    cfg, head, params, p, feats, seq = setup_head()
    got_seq, got_lp = head.apply(params, jnp.asarray(feats), None,
                                 mode='sample')
    got_seq = np.asarray(got_seq)
    got_lp = np.asarray(got_lp)

    n, R = 3, cfg.rnn_size
    h = np.zeros((n, R), np.float32)
    c = np.zeros((n, R), np.float32)
    it = np.zeros((n,), np.int64)
    unfinished = np.ones((n,), bool)
    want_seq = np.zeros((n, cfg.max_caption_len), np.int64)
    want_lp = np.zeros((n, cfg.max_caption_len), np.float32)
    logprobs = None
    for t in range(cfg.max_caption_len + 1):
        if t > 0:
            sample_lp = logprobs.max(-1)
            it = logprobs.argmax(-1)
            # reference records at t >= 1: raw token fed, masked token stored
            if t == 1:
                unfinished = it > 0
            else:
                unfinished = unfinished & (it > 0)
            want_seq[:, t - 1] = it * unfinished
            want_lp[:, t - 1] = sample_lp
        if t == cfg.max_caption_len:
            break
        xt = p['embed'][it]
        x = np.concatenate([xt, feats], -1)
        h, c = np_lstm_step(x, h, c, p['rnn_w_ih_l0'], p['rnn_w_hh_l0'])
        logprobs = np_log_softmax(h @ p['logit_w'] + p['logit_b'])

    np.testing.assert_array_equal(got_seq, want_seq)
    np.testing.assert_allclose(got_lp, want_lp, rtol=2e-5, atol=2e-5)
