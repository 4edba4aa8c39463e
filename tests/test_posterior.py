"""Posterior math: vectorized implementations vs a scalar transliteration of
the reference's per-row computation (call_variants.py:181-304)."""

import sys

import numpy as np
import pytest

from clairs_to_tpu.ops import posterior as post


def scalar_reference_posterior(p, q, matrix, aff_edges, neg_edges):
    """Direct scalar transcription of call_variants.py:181-213 for one allele."""
    a_index = np.digitize(p, aff_edges) - 1
    na_index = np.digitize(1 - q, neg_edges) - 1
    a_index = min(max(a_index, 0), 9)
    na_index = min(max(na_index, 0), 9)
    w = matrix[a_index][na_index] + sys.float_info.epsilon
    return (p * (1 - q) * w) / ((p * (1 - q) * w) + ((1 - p) * q * (1 - w)))


@pytest.fixture
def lik():
    rng = np.random.default_rng(7)
    matrices = rng.uniform(0.05, 0.95, size=(4, 10, 10))
    # realistic non-uniform monotone bin edges
    edges = np.sort(rng.uniform(0.05, 0.95, size=(4, 9)), axis=1)
    aff = np.concatenate([np.zeros((4, 1)), edges, np.ones((4, 1))], axis=1)
    neg_e = np.sort(rng.uniform(0.05, 0.95, size=(4, 9)), axis=1)
    neg = np.concatenate([np.zeros((4, 1)), neg_e, np.ones((4, 1))], axis=1)
    return post.LikelihoodData(matrices=matrices, aff_edges=aff, neg_edges=neg)


def test_posterior_np_matches_scalar(lik):
    rng = np.random.default_rng(0)
    B = 500
    p_aff = rng.uniform(0, 1, size=(B, 4))
    p_neg = rng.uniform(0, 1, size=(B, 4))
    got = post.posterior_probs_np(p_aff, p_neg, lik)
    for i in range(B):
        for k in range(4):
            want = scalar_reference_posterior(
                p_aff[i, k], p_neg[i, k], lik.matrices[k], lik.aff_edges[k], lik.neg_edges[k]
            )
            assert got[i, k] == pytest.approx(want, abs=0, rel=0), (i, k)


def test_posterior_jnp_close_to_np(lik):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    B = 256
    p_aff = rng.uniform(0.01, 0.99, size=(B, 4)).astype(np.float32)
    p_neg = rng.uniform(0.01, 0.99, size=(B, 4)).astype(np.float32)
    exact = post.posterior_probs_np(p_aff, p_neg, lik)
    fused = np.asarray(
        post.posterior_probs_jnp(
            jnp.asarray(p_aff),
            jnp.asarray(p_neg),
            jnp.asarray(lik.matrices, jnp.float32),
            jnp.asarray(lik.aff_edges, jnp.float32),
            jnp.asarray(lik.neg_edges, jnp.float32),
        )
    )
    # f32 device path tolerance; bin-edge flips possible but rare with
    # continuous inputs — exclude rows whose digitized bins differ
    diff = np.abs(fused - exact)
    assert np.median(diff) < 1e-6
    assert (diff < 1e-4).mean() > 0.99


def test_quality_score_matches_reference_formula():
    from math import log, e

    probs = np.array([0.0, 0.001, 0.5, 0.9, 0.99, 1.0])
    got = post.quality_score_np(probs)
    for p, g in zip(probs, got):
        want = max((-10 * log(e, 10)) * log(((1.0 - p) + 1e-10) / (p + 1e-10)) + 2.0, 0.0)
        assert g == pytest.approx(round(want, 4), abs=1e-12)


def test_likelihood_matrix_roundtrip(tmp_path, lik):
    """Write a file in the reference's layout and reload it."""
    rows = []
    for k in range(4):
        rows.append(lik.matrices[k])
    point_rows = []
    for k in range(4):
        # loader drops the last element of each row: append a sentinel
        point_rows.append(np.concatenate([lik.aff_edges[k][1:-1], [999.0]]))
        point_rows.append(np.concatenate([lik.neg_edges[k][1:-1], [999.0]]))
    data = np.vstack([np.vstack(rows), np.vstack(point_rows)])
    path = tmp_path / "likelihood_matrix.txt"
    np.savetxt(path, data)
    loaded = post.load_likelihood_matrix(str(path), n_alleles=4)
    np.testing.assert_allclose(loaded.matrices, lik.matrices)
    np.testing.assert_allclose(loaded.aff_edges, lik.aff_edges)
    np.testing.assert_allclose(loaded.neg_edges, lik.neg_edges)
