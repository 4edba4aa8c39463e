"""Torch-checkpoint → JAX-pytree parameter conversion.

The reference ships whole-module torch pickles with keys ``model_acgt`` /
``model_nacgt`` (/root/reference/clairs/predict.py:512-568).  The one-time
converter (tools/convert_checkpoint.py) torch.loads those and dumps the
state_dict to .npz; the functions here map state-dict names onto the pytrees
consumed by models/cvt.py and models/bigru.py.  No torch import at runtime.
"""

import numpy as np
import jax.numpy as jnp

from clairs_to_tpu.models.cvt import CvTConfig, SNV_CVT_CONFIG
from clairs_to_tpu.models.bigru import BiGRUConfig, SNV_BIGRU_CONFIG


def _a(sd, key, dtype=jnp.float32):
    return jnp.asarray(np.asarray(sd[key]), dtype)


def cvt_params_from_state_dict(sd, config: CvTConfig = SNV_CVT_CONFIG):
    """Map a torch CvT/CvT_Indel state_dict onto the cvt.forward pytree.

    Torch module naming (model.py:150-384): layer{s}.0 = embed conv,
    layer{s}.1 = LayerNorm, layer{s}.2.layers.{d}.{0|1} = PreNorm(attn|ff);
    DepthWiseConv2d.net = [dw conv, BN, pw conv]; FeedForward.net indices 0,3.
    """
    stages = []
    for s in range(config.num_stages):
        L = f"layer{s + 1}"
        blocks = []
        for d in range(config.depths[s]):
            B = f"{L}.2.layers.{d}"

            def dwproj(name):
                return {
                    "dw_weight": _a(sd, f"{B}.0.fn.{name}.net.0.weight"),
                    "bn": {
                        "weight": _a(sd, f"{B}.0.fn.{name}.net.1.weight"),
                        "bias": _a(sd, f"{B}.0.fn.{name}.net.1.bias"),
                        "running_mean": _a(sd, f"{B}.0.fn.{name}.net.1.running_mean"),
                        "running_var": _a(sd, f"{B}.0.fn.{name}.net.1.running_var"),
                    },
                    "pw_weight": _a(sd, f"{B}.0.fn.{name}.net.2.weight"),
                }

            blocks.append(
                {
                    "attn_ln_g": _a(sd, f"{B}.0.norm.g"),
                    "attn_ln_b": _a(sd, f"{B}.0.norm.b"),
                    "attn": {
                        "to_q": dwproj("to_q"),
                        "to_kv": dwproj("to_kv"),
                        "out_weight": _a(sd, f"{B}.0.fn.to_out.0.weight"),
                        "out_bias": _a(sd, f"{B}.0.fn.to_out.0.bias"),
                    },
                    "ff_ln_g": _a(sd, f"{B}.1.norm.g"),
                    "ff_ln_b": _a(sd, f"{B}.1.norm.b"),
                    "ff": {
                        "w1": _a(sd, f"{B}.1.fn.net.0.weight"),
                        "b1": _a(sd, f"{B}.1.fn.net.0.bias"),
                        "w2": _a(sd, f"{B}.1.fn.net.3.weight"),
                        "b2": _a(sd, f"{B}.1.fn.net.3.bias"),
                    },
                }
            )
        stages.append(
            {
                "emb_weight": _a(sd, f"{L}.0.weight"),
                "emb_bias": _a(sd, f"{L}.0.bias"),
                "ln_g": _a(sd, f"{L}.1.g"),
                "ln_b": _a(sd, f"{L}.1.b"),
                "blocks": blocks,
            }
        )
    return {
        "stages": stages,
        "fc1": {"weight": _a(sd, "fc1.weight"), "bias": _a(sd, "fc1.bias")},
        "heads": {
            al: {
                "fc2": {"weight": _a(sd, f"{al}_fc2.weight"), "bias": _a(sd, f"{al}_fc2.bias")},
                "fc3": {"weight": _a(sd, f"{al}_fc3.weight"), "bias": _a(sd, f"{al}_fc3.bias")},
            }
            for al in config.alleles
        },
    }


def bigru_params_from_state_dict(sd, config: BiGRUConfig = SNV_BIGRU_CONFIG):
    """Map a torch BiGRU_NACGT(_Indel) state_dict onto the bigru.forward pytree.

    Torch naming (model.py:387-560): lstm / lstm_2 are nn.GRU modules with
    weight_ih_l0[,_reverse] etc.; allele heads are n{a}_fc2 / n{a}_fc3.
    """

    def gru(name):
        return {
            "ih": {"weight": _a(sd, f"{name}.weight_ih_l0"), "bias": _a(sd, f"{name}.bias_ih_l0")},
            "hh": {"weight": _a(sd, f"{name}.weight_hh_l0"), "bias": _a(sd, f"{name}.bias_hh_l0")},
            "ih_reverse": {
                "weight": _a(sd, f"{name}.weight_ih_l0_reverse"),
                "bias": _a(sd, f"{name}.bias_ih_l0_reverse"),
            },
            "hh_reverse": {
                "weight": _a(sd, f"{name}.weight_hh_l0_reverse"),
                "bias": _a(sd, f"{name}.bias_hh_l0_reverse"),
            },
        }

    return {
        "gru1": gru("lstm"),
        "gru2": gru("lstm_2"),
        "fc1": {"weight": _a(sd, "fc1.weight"), "bias": _a(sd, "fc1.bias")},
        "heads": {
            al: {
                "fc2": {
                    "weight": _a(sd, f"n{al}_fc2.weight"),
                    "bias": _a(sd, f"n{al}_fc2.bias"),
                },
                "fc3": {
                    "weight": _a(sd, f"n{al}_fc3.weight"),
                    "bias": _a(sd, f"n{al}_fc3.bias"),
                },
            }
            for al in config.alleles
        },
    }


def load_npz_state_dict(path):
    """Load an .npz produced by tools/convert_checkpoint.py into a dict."""
    data = np.load(path)
    return {k: data[k] for k in data.files}
