"""Converter parity on the reference's REAL checkpoint pickle layout.

The reference ships whole-module torch pickles: the AFF file holds
{'model_acgt': <CvT module>}, the NEG file {'model_nacgt': <BiGRU module>}
(clairs/predict.py:512-517).  This test torch.saves fixtures in exactly that
layout (module objects referencing clairs.model classes), runs the
tools/convert_checkpoint.py CLI on them, and asserts the resulting .npz
drives the JAX models to the same outputs as the pickled torch modules.
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

from clairs_to_tpu.models import bigru, cvt  # noqa: E402
from clairs_to_tpu.train import load_checkpoint_auto  # noqa: E402
from tools.convert_checkpoint import main as convert_main  # noqa: E402

pytestmark = pytest.mark.skipif(ref_model is None, reason="reference unavailable")


def _x(seed=0, n=5):
    return np.random.default_rng(seed).integers(
        -30, 30, size=(n, 33, 34)).astype(np.float32)


def test_aff_whole_module_pickle(tmp_path):
    torch.manual_seed(3)
    tm = ref_model.CvT(num_classes=2, model_type="acgt").eval()
    pkl = str(tmp_path / "pileup_affirmative.pkl")
    torch.save({"model_acgt": tm}, pkl)

    npz = str(tmp_path / "aff.npz")
    assert convert_main(["--torch_pkl", pkl, "--kind", "aff",
                         "--mode", "snv", "--output", npz]) == 0

    x = _x(3)
    with torch.no_grad():
        t_out = np.stack([o.numpy() for o in tm(torch.from_numpy(x))], axis=1)
    params, config = load_checkpoint_auto(npz, mode="snv", kind="cvt")
    j_out = np.asarray(jax.jit(
        lambda p, v: cvt.forward(p, v, config))(params, x))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)


def test_neg_whole_module_pickle(tmp_path):
    torch.manual_seed(4)
    tm = ref_model.BiGRU_NACGT(num_classes=2, model_type="nacgt").eval()
    pkl = str(tmp_path / "pileup_negational.pkl")
    torch.save({"model_nacgt": tm}, pkl)

    npz = str(tmp_path / "neg.npz")
    assert convert_main(["--torch_pkl", pkl, "--kind", "neg",
                         "--mode", "snv", "--output", npz]) == 0

    x = _x(4)
    with torch.no_grad():
        t_out = np.stack([o.numpy() for o in tm(torch.from_numpy(x))], axis=1)
    params, config = load_checkpoint_auto(npz, mode="snv", kind="bigru")
    j_out = np.asarray(jax.jit(
        lambda p, v: bigru.forward(p, v, config))(params, x))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)


def test_indel_whole_module_pickles(tmp_path):
    torch.manual_seed(5)
    tm = ref_model.BiGRU_NACGT_Indel(num_classes=2, model_type="nacgt").eval()
    pkl = str(tmp_path / "indel_negational.pkl")
    torch.save({"model_nacgt": tm}, pkl)
    npz = str(tmp_path / "neg_indel.npz")
    assert convert_main(["--torch_pkl", pkl, "--kind", "neg",
                         "--mode", "indel", "--output", npz]) == 0
    x = _x(5)
    with torch.no_grad():
        t_out = np.stack([o.numpy() for o in tm(torch.from_numpy(x))], axis=1)
    params, config = load_checkpoint_auto(npz, mode="indel", kind="bigru")
    j_out = np.asarray(jax.jit(
        lambda p, v: bigru.forward(p, v, config))(params, x))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)
