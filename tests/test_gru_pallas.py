"""Pallas GRU-scan kernel vs the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clairs_to_tpu.models import bigru
from clairs_to_tpu.ops import gru_pallas


def _params(rng_key, in_dim, hidden):
    p = bigru.init(jax.random.PRNGKey(0),
                   bigru.BiGRUConfig(in_channels=in_dim, hidden1=hidden, hidden2=hidden))
    return p["gru1"]


def test_pallas_gru_matches_scan(monkeypatch):
    # interpret mode lets the kernel run on CPU for testing
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))

    in_dim, hidden, T, B = 34, 16, 33, 8
    p = _params(0, in_dim, hidden)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, in_dim)),
                    jnp.float32)
    xt = x.transpose(1, 0, 2)
    xg = (
        jnp.dot(xt, p["ih"]["weight"].T, preferred_element_type=jnp.float32)
        + p["ih"]["bias"]
    )
    want = bigru._gru_direction(xg, p["hh"], hidden)
    got = gru_pallas.gru_direction_pallas(
        xg, p["hh"]["weight"].T, p["hh"]["bias"], hidden
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_bigru_layer_matches(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))

    in_dim, hidden, T, B = 34, 16, 33, 4
    p = _params(0, in_dim, hidden)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, in_dim)),
                    jnp.float32)
    want = bigru._bigru_layer(x, p, hidden)
    got = gru_pallas.bigru_layer_pallas(x, p, hidden)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
