"""Pallas ops under a multi-device mesh via shard_map.

GSPMD cannot partition a pallas_call, so the op dispatchers wrap the
kernel in shard_map over the mesh's data axis when a trainer advertises
one (``dvc_tpu/parallel/op_partition.py``).  These tests run the real
shard_map plumbing on the 8-device CPU mesh with the kernels in
interpret mode: forward parity and — the part GSPMD would otherwise own —
the psum of parameter cotangents inserted by shard_map's transpose.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.ops.dsa_step import dsa_sample_attend, dsa_sample_attend_ref
from dvc_tpu.ops.ms_deform_attn import ms_deform_attn
from dvc_tpu.parallel.mesh import make_mesh
from dvc_tpu.parallel.op_partition import get_op_mesh, op_mesh

from test_dsa_step import make_inputs


def test_dsa_forward_sharded_matches_ref():
    args, shapes = make_inputs(B=8)
    want = dsa_sample_attend_ref(*args, shapes)
    with op_mesh(make_mesh(n_data=8)):
        got = jax.jit(
            lambda *a: dsa_sample_attend(*a, shapes,
                                         impl='pallas_interpret'))(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dsa_gradients_sharded_including_param_psum():
    args, shapes = make_inputs(seed=7, B=8)

    def loss_of(impl, mesh):
        def f(*a):
            out = dsa_sample_attend(*a, shapes, impl=impl)
            wts = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                          .reshape(out.shape))
            return jnp.sum(out * wts)
        if mesh is None:
            return jax.jit(jax.grad(f, argnums=(0, 4, 5, 6, 7)))(*args)
        with op_mesh(mesh):
            return jax.jit(jax.grad(f, argnums=(0, 4, 5, 6, 7)))(*args)

    # grads wrt value (batched) and hvec/ctx_w/ctx_b/alpha_w (hvec batched,
    # the rest replicated -> their cotangents cross shard_map's psum)
    want = loss_of('ref', None)
    got = loss_of('pallas_interpret', make_mesh(n_data=8))
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_dsa_lstm_step_sharded_tuple_output():
    """The fused sampling+attention+LSTM step returns a (h, c) tuple —
    shard_map must split both outputs on the data axis and psum the
    replicated weights' (ctx_w / w_hh / attention) cotangents."""
    from dvc_tpu.ops.dsa_step import dsa_lstm_step, dsa_lstm_step_ref

    from test_dsa_step import make_lstm_inputs
    args, shapes = make_lstm_inputs(seed=9, B=8)

    def loss_of(impl, mesh):
        def f(*a):
            h_new, c_new = dsa_lstm_step(*a, shapes, impl=impl)
            return (jnp.sum(h_new * jnp.cos(
                jnp.arange(h_new.size, dtype=jnp.float32)
                .reshape(h_new.shape))) + jnp.sum(c_new ** 2))
        # value (batched), h (batched), ctx_w / w_hh (replicated)
        argnums = (0, 6, 8, 9)
        if mesh is None:
            return jax.jit(jax.value_and_grad(f, argnums=argnums))(*args)
        with op_mesh(mesh):
            return jax.jit(jax.value_and_grad(f, argnums=argnums))(*args)

    want_v, want_g = loss_of('ref', None)
    got_v, got_g = loss_of('pallas_interpret', make_mesh(n_data=8))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-4)
    for w, g in zip(want_g, got_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_msda_forward_and_grads_sharded():
    rng = np.random.default_rng(11)
    B, H, Dh, Q, L, P = 8, 2, 8, 5, 2, 3
    shapes = (16, 8)
    S = sum(shapes)
    value = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, Q, H, L, P)), jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((B, Q, H, L * P)), jnp.float32)
    ).reshape(B, Q, H, L, P)

    def f(impl):
        def loss(v, s, a):
            out = ms_deform_attn(v, shapes, s, a, mode='border', impl=impl)
            return jnp.sum(out * jnp.sin(
                jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)))
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
            value, loc, attn)

    want_v, want_g = f('ref')
    with op_mesh(make_mesh(n_data=8)):
        got_v, got_g = f('pallas_interpret')
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-4)
    for w, g in zip(want_g, got_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_fallbacks():
    # batch not divisible by the axis -> direct (replicated) call, same math
    args, shapes = make_inputs(seed=5, B=3)
    want = dsa_sample_attend_ref(*args, shapes)
    mesh = make_mesh(n_data=8)
    with op_mesh(mesh):
        got = dsa_sample_attend(*args, shapes, impl='pallas_interpret')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # a data axis of size 1 is treated as "no mesh"
    with op_mesh(make_mesh(n_data=1)):
        assert get_op_mesh() is None
    assert get_op_mesh() is None


def test_greedy_scan_sharded_matches_ref():
    """The fused greedy decode (two outputs: tokens + logprobs) shard_maps
    over the data axis; tokens must be exact."""
    from dvc_tpu.ops.dsa_greedy import dsa_greedy_scan, dsa_greedy_scan_ref
    from test_dsa_greedy import make_args
    args, ts = make_args(B=8)
    K = 4
    tok_ref, lp_ref = dsa_greedy_scan_ref(*args, ts, K)
    with op_mesh(make_mesh(n_data=8)):
        tok, lp = jax.jit(
            lambda *a: dsa_greedy_scan(*a, ts, K,
                                       impl='pallas_interpret'))(*args)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_ref))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=2e-5, atol=2e-5)
