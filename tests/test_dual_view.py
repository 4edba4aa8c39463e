"""Dual-BQ view training (the reference's AFF/NEG asymmetry).

The AFF tensor uses platform min_bq, the NEG tensor min_bq=0
(run_clairs_to:1237 vs :1264); training must present each network its own
view so the ensemble learns that alt support confined to sub-min_bq bases is
artifact, not somatic signal.
"""

import numpy as np
import pytest

from clairs_to_tpu.bench.demo import TINY_BIGRU, TINY_CVT
from clairs_to_tpu.bench.synth import synthesize_dual_batch
from clairs_to_tpu.train import DualTrainer, TrainConfig


def test_dual_synth_views_differ_for_ont():
    rng = np.random.default_rng(0)
    xa, xn, ca, cn, som = synthesize_dual_batch(rng, 64, platform="ont")
    assert xa.shape == xn.shape == (64, 33, 34)
    assert not np.array_equal(xa, xn)
    # NEG view sees strictly more main-block mass (low-BQ bases included)
    assert np.abs(xn[..., 0:4]).sum() > np.abs(xa[..., 0:4]).sum()
    # ref encoding: center ref channel is negative in both views
    assert (som >= 0).sum() > 0


def test_dual_synth_views_coincide_for_ilmn():
    rng = np.random.default_rng(1)
    xa, xn, *_ = synthesize_dual_batch(rng, 16, platform="ilmn")
    assert xa is xn


def test_dual_view_training_rejects_lowbq_artifacts():
    rng = np.random.default_rng(7)
    xa, xn, cov, _cn, som = synthesize_dual_batch(
        rng, 2500, platform="ont",
        class_probs=(0.3, 0.1, 0.05, 0.3, 0.25),
    )
    tr = DualTrainer(
        mode="snv",
        tc=TrainConfig(batch_size=128, epochs=16, learning_rate=1e-3),
        cvt_config=TINY_CVT, bigru_config=TINY_BIGRU,
    )
    tr.fit(xa, som, rescale_cov=cov, x_neg=xn)

    # fresh eval batch: somatic sites vs artifact-bearing negatives
    xa2, xn2, cov2, _c, som2 = synthesize_dual_batch(
        np.random.default_rng(99), 800, platform="ont",
        class_probs=(0.0, 0.0, 0.0, 0.5, 0.5),
    )
    pa, pn = tr.predict_probs(xa2, rescale_cov=cov2, x_neg=xn2)
    m = som2 >= 0
    assert m.sum() > 50 and (~m).sum() > 50
    p_som = np.array([pa[i, som2[i]] for i in np.where(m)[0]]).mean()
    p_art = pa[~m].max(axis=1).mean()
    # AFF separates somatic from artifact (artifact alts are invisible to
    # it); tiny nets + short training => require ordering with a margin,
    # not full separation
    assert p_som > p_art + 0.05, (p_som, p_art)
    # ensemble: combined score orders somatic above artifact
    ens_som = np.array([pa[i, som2[i]] * (1 - pn[i, som2[i]]) for i in np.where(m)[0]])
    k = pa[~m].argmax(axis=1)
    neg_rows = np.where(~m)[0]
    ens_art = np.array([pa[r, k[j]] * (1 - pn[r, k[j]]) for j, r in enumerate(neg_rows)])
    assert np.median(ens_som) > np.median(ens_art), (
        np.median(ens_som), np.median(ens_art))
