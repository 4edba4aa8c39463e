"""Pallas TPU kernel for the BiGRU recurrence.

The BiGRU's hidden recurrence is 33 sequential tiny matmuls
((B,H) @ (H,3H)) with elementwise gates; under ``lax.scan`` each step
round-trips the carry through HBM and dispatches separate fusions.  This
kernel runs the whole direction in ONE pallas_call: the TPU grid is
sequential, so the hidden state lives in a VMEM scratch across grid steps,
the (H,3H) weight block stays resident in VMEM, and each step does a single
MXU matmul plus fused VPU gate math, writing only the per-step output block
back to HBM.

Gate math matches torch.nn.GRU exactly (models/bigru.py::_gru_direction):
    r = sigmoid(xr + hr); z = sigmoid(xz + hz)
    n = tanh(xn + r * hn); h' = (1-z)*n + z*h

Used by models/bigru.py when ``use_pallas`` is enabled (TPU backend only);
numerical parity with the lax.scan path is pinned in tests/test_gru_pallas.py.

Measured on the v5e chip (batch 2048, H=128): 0.81 ms/direction vs 1.06 ms
for the lax.scan path (1.31x), max |diff| 5.8e-6.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_scan_kernel(xg_ref, whh_ref, bhh_ref, out_ref, h_ref):
    """Grid = (batch tiles, timesteps); the TPU grid iterates the last axis
    fastest, so for each batch tile the T steps run sequentially with the
    hidden state carried in the VMEM scratch (reset at t == 0)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    hg = (
        jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
        + bhh_ref[:]
    )
    xg = xg_ref[0]
    H = h.shape[-1]
    xr, xz, xn = xg[:, :H], xg[:, H : 2 * H], xg[:, 2 * H :]
    hr, hz, hn = hg[:, :H], hg[:, H : 2 * H], hg[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    h_ref[:] = h_new
    out_ref[0] = h_new


@functools.partial(jax.jit, static_argnames=("hidden",))
def gru_direction_pallas(x_gates, w_hh_t, b_hh, hidden):
    """Run one GRU direction with the fused kernel.

    Args:
      x_gates: (T, B, 3H) precomputed input-to-hidden gates.
      w_hh_t: (H, 3H) transposed hidden weights.
      b_hh: (3H,) hidden bias.
    Returns:
      (T, B, H) hidden states.
    """
    T, B, threeH = x_gates.shape
    H = hidden
    BT = min(B, 256)               # batch tile: keeps VMEM well under budget
    pad = (-B) % BT
    if pad:
        x_gates = jnp.pad(x_gates, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad
    b_hh2 = jnp.broadcast_to(b_hh, (1, threeH)).astype(jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(Bp // BT, T),
        in_specs=[
            pl.BlockSpec((1, BT, threeH), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BT, H), jnp.float32)],
    )
    out = pl.pallas_call(
        _gru_scan_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
    )(x_gates.astype(jnp.float32), w_hh_t.astype(jnp.float32), b_hh2)
    return out[:, :B]


def bigru_layer_pallas(x, p, hidden):
    """Drop-in replacement for models/bigru._bigru_layer on TPU."""
    xt = x.transpose(1, 0, 2)

    def in_gates(p_ih):
        return (
            jnp.dot(xt, p_ih["weight"].T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
            + p_ih["bias"]
        )

    fwd = gru_direction_pallas(in_gates(p["ih"]), p["hh"]["weight"].T,
                               p["hh"]["bias"], hidden)
    bwd = gru_direction_pallas(in_gates(p["ih_reverse"])[::-1],
                               p["hh_reverse"]["weight"].T,
                               p["hh_reverse"]["bias"], hidden)[::-1]
    return jnp.concatenate([fwd, bwd], axis=-1).transpose(1, 0, 2)
