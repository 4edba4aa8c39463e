"""BiGRU — the Negational network.

TPU-native functional re-implementation of the reference architecture
(/root/reference/clairs/model.py:387-560): two stacked bidirectional GRUs
(hidden 128 -> 192) over the 33-position axis, flatten, fc1(128), per-allele
fc2+fc3 heads with SELU after every fc.

Design for TPU: the input-to-hidden projection of each GRU layer is hoisted
out of the recurrence as one big (B*T, in) x (in, 3H) matmul on the MXU; only
the (B, H) x (H, 3H) hidden matmul stays inside ``lax.scan``.  Gate math
matches torch.nn.GRU exactly (gate order r,z,n; the reset gate multiplies the
*biased* hidden branch: n = tanh(x_n + b_in + r * (h W_hn + b_hn))).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from clairs_to_tpu.models.cvt import SNV_ALLELES, INDEL_ALLELES, PRECISION


@dataclass(frozen=True)
class BiGRUConfig:
    in_channels: int = 34
    width: int = 33
    hidden1: int = 128
    hidden2: int = 192
    fc_dim: int = 128
    num_classes: int = 2
    alleles: Tuple[str, ...] = SNV_ALLELES


SNV_BIGRU_CONFIG = BiGRUConfig()
INDEL_BIGRU_CONFIG = BiGRUConfig(alleles=INDEL_ALLELES)


def _gru_direction(x_gates, p_hh, hidden):
    """Scan one GRU direction. x_gates: (T, B, 3H) precomputed input gates."""
    w_hh = p_hh["weight"].T  # (H, 3H)
    b_hh = p_hh["bias"]

    def step(h, xg):
        hg = jnp.dot(h, w_hh, preferred_element_type=jnp.float32, precision=PRECISION) + b_hh
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    b = x_gates.shape[1]
    h0 = jnp.zeros((b, hidden), x_gates.dtype)
    _, hs = lax.scan(step, h0, x_gates)
    return hs  # (T, B, H)


def _bigru_layer(x, p, hidden):
    """x: (B, T, in) -> (B, T, 2*hidden); torch bidirectional concat order."""
    b, t, _ = x.shape
    xt = x.transpose(1, 0, 2)  # (T, B, in)

    def in_gates(p_ih):
        return (
            jnp.dot(xt, p_ih["weight"].T, preferred_element_type=jnp.float32, precision=PRECISION)
            + p_ih["bias"]
        )

    fwd = _gru_direction(in_gates(p["ih"]), p["hh"], hidden)
    bwd = _gru_direction(in_gates(p["ih_reverse"])[::-1], p["hh_reverse"], hidden)[::-1]
    return jnp.concatenate([fwd, bwd], axis=-1).transpose(1, 0, 2)


def _linear(x, p):
    return jnp.dot(x, p["weight"].T, preferred_element_type=jnp.float32, precision=PRECISION) + p["bias"]


def forward(params, x, config: BiGRUConfig = SNV_BIGRU_CONFIG,
            dropout_rate: float = 0.0, rng=None, use_pallas: bool = False):
    """Run the BiGRU trunk + per-allele heads.

    Args:
      params: pytree from ``init`` / ``models.convert``.
      x: (B, 33, 34) pileup tensors.
      dropout_rate/rng: training-time fc dropout (reference dropout 0.3,
        model.py:407,447-453); inference leaves them at 0/None.
    Returns:
      (B, n_alleles, num_classes) logits, allele order config.alleles.
    """
    def dropout(t, key):
        if dropout_rate <= 0.0 or rng is None:
            return t
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(jax.random.fold_in(rng, key), keep, t.shape)
        return jnp.where(mask, t / keep, 0.0)

    if use_pallas:
        # fused VMEM-resident recurrence (ops/gru_pallas.py); TPU only
        from clairs_to_tpu.ops.gru_pallas import bigru_layer_pallas as _layer
    else:
        _layer = _bigru_layer
    out = _layer(x, params["gru1"], config.hidden1)
    out = _layer(out, params["gru2"], config.hidden2)
    b = out.shape[0]
    flat = dropout(out.reshape(b, -1), 0)
    feat = jax.nn.selu(dropout(_linear(flat, params["fc1"]), 1))
    logits = []
    for i, al in enumerate(config.alleles):
        h = jax.nn.selu(dropout(_linear(feat, params["heads"][al]["fc2"]), 2 + i))
        h = jax.nn.selu(_linear(h, params["heads"][al]["fc3"]))
        logits.append(h)
    return jnp.stack(logits, axis=1)


def init(rng, config: BiGRUConfig = SNV_BIGRU_CONFIG, dtype=jnp.float32):
    keys = iter(jax.random.split(rng, 256))

    def uniform(shape, bound):
        return jax.random.uniform(next(keys), shape, dtype, -bound, bound)

    def gru_p(in_dim, hidden):
        bound = 1.0 / np.sqrt(hidden)
        def dirn():
            return {
                "weight": uniform((3 * hidden, in_dim), bound),
                "bias": uniform((3 * hidden,), bound),
            }
        def dirn_h():
            return {
                "weight": uniform((3 * hidden, hidden), bound),
                "bias": uniform((3 * hidden,), bound),
            }
        return {
            "ih": dirn(),
            "hh": dirn_h(),
            "ih_reverse": dirn(),
            "hh_reverse": dirn_h(),
        }

    def linear_p(out_f, in_f):
        bound = 1.0 / np.sqrt(in_f)
        return {"weight": uniform((out_f, in_f), bound), "bias": uniform((out_f,), bound)}

    return {
        "gru1": gru_p(config.in_channels, config.hidden1),
        "gru2": gru_p(2 * config.hidden1, config.hidden2),
        "fc1": linear_p(config.fc_dim, config.width * 2 * config.hidden2),
        "heads": {
            al: {
                "fc2": linear_p(config.fc_dim, config.fc_dim),
                "fc3": linear_p(config.num_classes, config.fc_dim),
            }
            for al in config.alleles
        },
    }
