"""Numerical parity of the JAX models against the reference torch models.

The reference implementation (read-only at /root/reference) is imported ONLY
here, as a golden oracle: we instantiate its torch modules with random weights,
convert the state_dict through models/convert.py, and require the JAX forward
to match torch within float32 tolerance.  Skipped when the reference tree or
torch is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from clairs import model as ref_model  # noqa: E402
except Exception:  # pragma: no cover
    ref_model = None

import jax  # noqa: E402

from clairs_to_tpu.models import cvt, bigru, convert  # noqa: E402

pytestmark = pytest.mark.skipif(ref_model is None, reason="reference not available")


def _np_state_dict(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _rand_input(batch=4, seed=0):
    rng = np.random.default_rng(seed)
    # realistic pileup-tensor scale: counts in [-60, 60]
    return (rng.integers(-60, 60, size=(batch, 33, 34))).astype(np.float32)


@pytest.mark.parametrize("indel", [False, True])
def test_cvt_matches_torch(indel):
    torch.manual_seed(0)
    if indel:
        tm = ref_model.CvT_Indel(
            num_classes=2, s1_emb_dim=16, s3_heads=4, s3_depth=3, model_type="acgt"
        )
        config = cvt.INDEL_CVT_CONFIG
    else:
        tm = ref_model.CvT(num_classes=2, model_type="acgt")
        config = cvt.SNV_CVT_CONFIG
    tm.eval()
    x = _rand_input()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))
    t_out = np.stack([o.numpy() for o in t_out], axis=1)  # (B, alleles, 2)

    params = convert.cvt_params_from_state_dict(_np_state_dict(tm), config)
    j_out = np.asarray(jax.jit(lambda p, v: cvt.forward(p, v, config))(params, x))

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("indel", [False, True])
def test_bigru_matches_torch(indel):
    torch.manual_seed(1)
    if indel:
        tm = ref_model.BiGRU_NACGT_Indel(num_classes=2, model_type="nacgt")
        config = bigru.INDEL_BIGRU_CONFIG
    else:
        tm = ref_model.BiGRU_NACGT(num_classes=2, model_type="nacgt")
        config = bigru.SNV_BIGRU_CONFIG
    tm.eval()
    x = _rand_input(seed=1)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))
    t_out = np.stack([o.numpy() for o in t_out], axis=1)

    params = convert.bigru_params_from_state_dict(_np_state_dict(tm), config)
    j_out = np.asarray(jax.jit(lambda p, v: bigru.forward(p, v, config))(params, x))

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)


def test_cvt_init_shapes_match_torch():
    tm = ref_model.CvT(num_classes=2, model_type="acgt")
    sd_params = convert.cvt_params_from_state_dict(_np_state_dict(tm))
    init_params = cvt.init(jax.random.PRNGKey(0))
    ref_shapes = jax.tree.map(lambda a: a.shape, sd_params)
    got_shapes = jax.tree.map(lambda a: a.shape, init_params)
    # LayerNorm params are stored (1,dim,1,1) in torch; init uses same
    assert ref_shapes == got_shapes


def test_bigru_init_shapes_match_torch():
    tm = ref_model.BiGRU_NACGT(num_classes=2, model_type="nacgt")
    sd_params = convert.bigru_params_from_state_dict(_np_state_dict(tm))
    init_params = bigru.init(jax.random.PRNGKey(0))
    assert jax.tree.map(lambda a: a.shape, sd_params) == jax.tree.map(
        lambda a: a.shape, init_params
    )
