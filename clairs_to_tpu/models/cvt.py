"""CvT (Convolutional vision Transformer) — the Affirmative network.

TPU-native functional re-implementation of the reference architecture
(/root/reference/clairs/model.py:150-384).  Semantics verified against torch:

* input (B, 33, 34) is viewed as an NCHW image (B, C=34, H=1, W=33)
  (model.py:231-233 unsqueeze+permute);
* each stage: Conv2d(k=3, pad=1, stride=2) embed -> channelwise LayerNorm
  (model.py:57-67: eps added to the *std*, var unbiased=False) -> transformer
  blocks with depthwise-conv QKV projections (q stride 1, kv stride 2) and
  1x1-conv feedforward (mult 4, exact GELU);
* trunk flatten (NCHW row-major) -> fc1(128) -> per-allele fc2(128)+fc3(2),
  SELU after every fc including fc3 (model.py:242-253).

Dropout layers are inference-time identities and are omitted.  Parameters are
plain pytrees produced by ``init`` or converted from torch checkpoints
(models/convert.py); shapes/layouts follow torch conventions (OIHW conv
weights, (out,in) linear weights) so conversion is a pure reshape-free copy.

All matmuls/convs carry ``preferred_element_type=float32`` so the MXU
accumulates in fp32 regardless of input dtype.
"""

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SNV_ALLELES = ("a", "c", "g", "t")
INDEL_ALLELES = ("a", "c", "g", "t", "i", "d")


@dataclass(frozen=True)
class CvTConfig:
    in_channels: int = 34
    width: int = 33
    emb_dims: Tuple[int, ...] = (32, 64, 128)
    emb_kernel: int = 3
    emb_stride: int = 2
    proj_kernel: int = 3
    kv_proj_stride: int = 2
    heads: Tuple[int, ...] = (1, 3, 6)
    depths: Tuple[int, ...] = (1, 2, 10)
    mlp_mult: int = 4
    dim_head: int = 64
    fc_dim: int = 128
    num_classes: int = 2
    alleles: Tuple[str, ...] = SNV_ALLELES

    @property
    def num_stages(self):
        return len(self.emb_dims)


# reference predict.py:520-553 — the indel AFF model rebuild configuration
SNV_CVT_CONFIG = CvTConfig()
INDEL_CVT_CONFIG = CvTConfig(
    emb_dims=(16, 64, 128), heads=(1, 3, 4), depths=(1, 2, 3), alleles=INDEL_ALLELES
)

_DN = ("NCHW", "OIHW", "NCHW")

# Matmul precision is context-controlled (jax.default_matmul_precision):
# the engine's exact path traces under "highest" for numerical parity with
# the torch reference even on TPU; the serving/bench path uses the backend
# default (single-pass bf16-input MXU with f32 accumulation).  Leaving the
# per-op precision at None lets the caller's context decide.
PRECISION = None


def _conv2d(x, w, b=None, stride=(1, 1), padding=(0, 0), groups=1):
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=PRECISION,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _channel_layernorm(x, g, b, eps=1e-5):
    # model.py:57-67: normalize over the channel dim; eps added to std.
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    return (x - mean) / (jnp.sqrt(var) + eps) * g + b


def _batchnorm(x, p, eps=1e-5):
    inv = lax.rsqrt(p["running_var"] + eps)
    scale = (p["weight"] * inv).reshape(1, -1, 1, 1)
    shift = (p["bias"] - p["running_mean"] * p["weight"] * inv).reshape(1, -1, 1, 1)
    return x * scale + shift


def _depthwise_proj(x, p, stride):
    """DepthWiseConv2d (model.py:91-100): dw-conv -> BN -> 1x1 pw-conv."""
    dim_in = x.shape[1]
    k = p["dw_weight"].shape[-1]
    out = _conv2d(x, p["dw_weight"], stride=(1, stride), padding=(k // 2, k // 2), groups=dim_in)
    out = _batchnorm(out, p["bn"])
    return _conv2d(out, p["pw_weight"])


def _linear(x, p):
    return (
        jnp.dot(x, p["weight"].T, preferred_element_type=jnp.float32, precision=PRECISION) + p["bias"]
    )


def _attention(x, p, heads, dim_head, kv_stride):
    b, _, h, w = x.shape
    inner = heads * dim_head
    q = _depthwise_proj(x, p["to_q"], stride=1)
    kv = _depthwise_proj(x, p["to_kv"], stride=kv_stride)
    k, v = kv[:, :inner], kv[:, inner:]

    def tokens(t):
        # (b, heads*dh, H, W) -> (b, heads, H*W, dh)
        bb, _, hh, ww = t.shape
        return t.reshape(bb, heads, dim_head, hh * ww).transpose(0, 1, 3, 2)

    q, k, v = tokens(q), tokens(k), tokens(v)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32, precision=PRECISION)
    dots = dots * (dim_head ** -0.5)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32, precision=PRECISION)
    # (b, heads, n, dh) -> (b, heads*dh, H, W); reference rearrange keeps y=W
    out = out.transpose(0, 1, 3, 2).reshape(b, inner, h, w)
    return _conv2d(out, p["out_weight"], p["out_bias"])


def _feedforward(x, p):
    out = _conv2d(x, p["w1"], p["b1"])
    out = jax.nn.gelu(out, approximate=False)
    return _conv2d(out, p["w2"], p["b2"])


def _transformer(x, blocks, heads, dim_head, kv_stride):
    for blk in blocks:
        normed = _channel_layernorm(x, blk["attn_ln_g"], blk["attn_ln_b"])
        x = _attention(normed, blk["attn"], heads, dim_head, kv_stride) + x
        normed = _channel_layernorm(x, blk["ff_ln_g"], blk["ff_ln_b"])
        x = _feedforward(normed, blk["ff"]) + x
    return x


def forward(params, x, config: CvTConfig = SNV_CVT_CONFIG,
            dropout_rate: float = 0.0, rng=None):
    """Run the CvT trunk + per-allele heads.

    Args:
      params: pytree from ``init`` / ``models.convert``.
      x: (B, 33, 34) pileup tensors.
      dropout_rate/rng: training-time fc dropout (reference dropout_fc=0.3,
        model.py:179,241-248); inference leaves them at 0/None.
    Returns:
      (B, n_alleles, num_classes) logits, allele order config.alleles.
    """
    def dropout(t, key):
        if dropout_rate <= 0.0 or rng is None:
            return t
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(jax.random.fold_in(rng, key), keep, t.shape)
        return jnp.where(mask, t / keep, 0.0)

    # (B, W, C) -> NCHW with H=1 (model.py:231-233)
    x = x.transpose(0, 2, 1)[:, :, None, :]
    for s in range(config.num_stages):
        stage = params["stages"][s]
        k = config.emb_kernel
        x = _conv2d(
            x,
            stage["emb_weight"],
            stage["emb_bias"],
            stride=(config.emb_stride, config.emb_stride),
            padding=(k // 2, k // 2),
        )
        x = _channel_layernorm(x, stage["ln_g"], stage["ln_b"])
        x = _transformer(
            x, stage["blocks"], config.heads[s], config.dim_head, config.kv_proj_stride
        )
    b = x.shape[0]
    flat = x.reshape(b, -1)  # NCHW row-major == torch flatten
    flat = dropout(flat, 0)
    feat = jax.nn.selu(dropout(_linear(flat, params["fc1"]), 1))
    logits = []
    for i, al in enumerate(config.alleles):
        h = jax.nn.selu(dropout(_linear(feat, params["heads"][al]["fc2"]), 2 + i))
        h = jax.nn.selu(_linear(h, params["heads"][al]["fc3"]))
        logits.append(h)
    return jnp.stack(logits, axis=1)


def _cal_scale(size, layers):
    for _ in range(layers):
        size = int(np.ceil(size / 2))
    return size


def trunk_flat_dim(config: CvTConfig) -> int:
    w = _cal_scale(config.width, config.num_stages)
    return config.emb_dims[-1] * 1 * w


def init(rng, config: CvTConfig = SNV_CVT_CONFIG, dtype=jnp.float32):
    """Random parameter pytree with torch-compatible shapes."""
    keys = iter(jax.random.split(rng, 4096))

    def conv_w(out_c, in_c, kh, kw):
        fan_in = in_c * kh * kw
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(next(keys), (out_c, in_c, kh, kw), dtype, -bound, bound)

    def vec(n, val=0.0):
        return jnp.full((n,), val, dtype)

    def linear_p(out_f, in_f):
        bound = 1.0 / np.sqrt(in_f)
        return {
            "weight": jax.random.uniform(next(keys), (out_f, in_f), dtype, -bound, bound),
            "bias": jax.random.uniform(next(keys), (out_f,), dtype, -bound, bound),
        }

    def dwproj_p(dim_in, dim_out, k):
        return {
            "dw_weight": conv_w(dim_in, 1, k, k),
            "bn": {
                "weight": vec(dim_in, 1.0),
                "bias": vec(dim_in),
                "running_mean": vec(dim_in),
                "running_var": vec(dim_in, 1.0),
            },
            "pw_weight": conv_w(dim_out, dim_in, 1, 1),
        }

    stages = []
    dim_in = config.in_channels
    for s in range(config.num_stages):
        dim = config.emb_dims[s]
        inner = config.heads[s] * config.dim_head
        blocks = []
        for _ in range(config.depths[s]):
            blocks.append(
                {
                    "attn_ln_g": jnp.ones((1, dim, 1, 1), dtype),
                    "attn_ln_b": jnp.zeros((1, dim, 1, 1), dtype),
                    "attn": {
                        "to_q": dwproj_p(dim, inner, config.proj_kernel),
                        "to_kv": dwproj_p(dim, inner * 2, config.proj_kernel),
                        "out_weight": conv_w(dim, inner, 1, 1),
                        "out_bias": vec(dim),
                    },
                    "ff_ln_g": jnp.ones((1, dim, 1, 1), dtype),
                    "ff_ln_b": jnp.zeros((1, dim, 1, 1), dtype),
                    "ff": {
                        "w1": conv_w(dim * config.mlp_mult, dim, 1, 1),
                        "b1": vec(dim * config.mlp_mult),
                        "w2": conv_w(dim, dim * config.mlp_mult, 1, 1),
                        "b2": vec(dim),
                    },
                }
            )
        stages.append(
            {
                "emb_weight": conv_w(dim, dim_in, config.emb_kernel, config.emb_kernel),
                "emb_bias": vec(dim),
                "ln_g": jnp.ones((1, dim, 1, 1), dtype),
                "ln_b": jnp.zeros((1, dim, 1, 1), dtype),
                "blocks": blocks,
            }
        )
        dim_in = dim

    params = {
        "stages": stages,
        "fc1": linear_p(config.fc_dim, trunk_flat_dim(config)),
        "heads": {
            al: {
                "fc2": linear_p(config.fc_dim, config.fc_dim),
                "fc3": linear_p(config.num_classes, config.fc_dim),
            }
            for al in config.alleles
        },
    }
    return params
