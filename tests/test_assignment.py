"""Parity of the on-device assignment solver against scipy (SURVEY.md §7:
compare optimal cost, not the permutation, to be robust to ties)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from dvc_tpu.ops import linear_sum_assignment, masked_assignment


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (10, 100), (30, 100), (7, 7)])
def test_matches_scipy_cost(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.standard_normal(shape).astype(np.float32) * 10
    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert len(set(col4row.tolist())) == shape[0], "columns must be distinct"
    rows, cols = scipy_lsa(cost)
    got = cost[np.arange(shape[0]), col4row].sum()
    want = cost[rows, cols].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_ties_still_optimal():
    cost = np.zeros((4, 6), np.float32)
    cost[0, :] = [1, 1, 1, 5, 5, 5]
    cost[1, :] = [1, 1, 1, 5, 5, 5]
    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    got = cost[np.arange(4), col4row].sum()
    rows, cols = scipy_lsa(cost)
    np.testing.assert_allclose(got, cost[rows, cols].sum())


def test_masked_rows_do_not_disturb_real_rows():
    rng = np.random.default_rng(0)
    real = rng.standard_normal((4, 20)).astype(np.float32)
    # pad to 10 rows with junk that the mask hides
    cost = np.concatenate([real, 1e7 * np.ones((6, 20), np.float32)])
    mask = np.array([True] * 4 + [False] * 6)
    col4row = np.asarray(masked_assignment(jnp.asarray(cost), jnp.asarray(mask)))
    rows, cols = scipy_lsa(real)
    got = real[np.arange(4), col4row[:4]].sum()
    np.testing.assert_allclose(got, real[rows, cols].sum(), rtol=1e-5, atol=1e-4)


def test_jit_and_vmap():
    rng = np.random.default_rng(1)
    costs = jnp.asarray(rng.standard_normal((5, 8, 16)).astype(np.float32))
    solved = jax.jit(jax.vmap(linear_sum_assignment))(costs)
    for b in range(5):
        c = np.asarray(costs[b])
        rows, cols = scipy_lsa(c)
        got = c[np.arange(8), np.asarray(solved[b])].sum()
        np.testing.assert_allclose(got, c[rows, cols].sum(), rtol=1e-5, atol=1e-4)


def test_many_to_one_matches_reference_tiling():
    """rl_indices parity (reference matcher.py:120-123): solving on the
    rate-tiled matrix == scipy on the same tiling; each gt row receives
    `rate` distinct queries."""
    from dvc_tpu.ops.assignment import many_to_one_assignment
    rng = np.random.default_rng(3)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        cost = rng.standard_normal((5, 30)).astype(np.float32) * 10
        mask = np.ones((5,), bool)
        got = np.asarray(many_to_one_assignment(jnp.asarray(cost),
                                                jnp.asarray(mask), rate=4))
        assert got.shape == (4, 5)
        flat = got.reshape(-1)
        assert len(set(flat.tolist())) == 20, "queries must be distinct"
        tiled = np.tile(cost, (4, 1))
        rows, cols = scipy_lsa(tiled)
        want = tiled[rows, cols].sum()
        have = tiled[np.arange(20), flat].sum()
        np.testing.assert_allclose(have, want, rtol=1e-5, atol=1e-4)


def test_hungarian_match_m2o_shapes():
    from dvc_tpu.models.matcher import MatcherConfig, hungarian_match_m2o
    rng = np.random.default_rng(0)
    B, Nq, G, K = 2, 24, 4, 1
    logits = jnp.asarray(rng.standard_normal((B, Nq, K)).astype(np.float32))
    boxes = jax.nn.sigmoid(jnp.asarray(
        rng.standard_normal((B, Nq, 2)).astype(np.float32)))
    gt_boxes = jax.nn.sigmoid(jnp.asarray(
        rng.standard_normal((B, G, 2)).astype(np.float32)))
    labels = jnp.zeros((B, G), jnp.int32)
    mask = jnp.ones((B, G), bool)
    out = np.asarray(hungarian_match_m2o(
        MatcherConfig(), logits, boxes, labels, gt_boxes, mask, rate=4))
    assert out.shape == (B, 4, G)
    for b in range(B):
        flat = out[b].reshape(-1)
        assert len(set(flat.tolist())) == 4 * G
