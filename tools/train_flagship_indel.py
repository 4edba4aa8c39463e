"""Train the full-size flagship INDEL checkpoints (reference architecture).

CvT_Indel dims 16/64/128 depths 1/2/3 (clairs/predict.py:520-553) + the
6-allele BiGRU — the default INDEL configs in models/cvt.py / models/bigru.py.
LR 2e-4: the SNV flagship run showed 1e-3 drives SELU CvTs into a saturated
p=0.5 basin; 2e-4 converges cleanly.  Assets land in
assets/flagship_ont_snv/indel/ so `--model_dir assets/flagship_ont_snv`
resolves both modes.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from clairs_to_tpu.bench.synth import synthesize_batch
from clairs_to_tpu.train import (
    DualTrainer, TrainConfig, save_checkpoint, calibrate_likelihood,
    save_likelihood_matrix,
)
import jax

OUT = "/root/repo/assets/flagship_ont_snv/indel"
os.makedirs(OUT, exist_ok=True)
print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(11)
kw = dict(depth_range=(25, 95), somatic_af_range=(0.08, 0.35), mode="indel",
          beta_subsample=True)
x, cov, som = synthesize_batch(rng, 12000, **kw)
print("train:", x.shape, "pos:", (som >= 0).sum(),
      "ins:", (som == 4).sum(), "del:", (som == 5).sum(), flush=True)

tr = DualTrainer(mode="indel",
                 tc=TrainConfig(batch_size=256, epochs=80, learning_rate=2e-4))
t0 = time.time()
for chunk in range(8):
    tr.fit(x, som, epochs=10, rescale_cov=cov)
    save_checkpoint(f"{OUT}/aff.npz", tr.params["aff"])
    save_checkpoint(f"{OUT}/neg.npz", tr.params["neg"])
    print(f"epoch {(chunk + 1) * 10} saved, {time.time() - t0:.0f}s", flush=True)

xc, covc, somc = synthesize_batch(np.random.default_rng(55), 4000, **kw)
pa, pn = tr.predict_probs(xc, rescale_cov=covc)
lik = calibrate_likelihood(pa, pn, somc, n_alleles=6)
save_likelihood_matrix(f"{OUT}/likelihood_matrix.txt", lik)

xv, covv, somv = synthesize_batch(np.random.default_rng(99), 1200, **kw)
pa, pn = tr.predict_probs(xv, rescale_cov=covv)
m = somv >= 0
print("VAL p_aff@som:", np.mean([pa[i, somv[i]] for i in np.where(m)[0]]).round(3),
      "@neg:", pa[~m].max(axis=1).mean().round(3),
      "p_neg@som:", np.mean([pn[i, somv[i]] for i in np.where(m)[0]]).round(3),
      flush=True)
from clairs_to_tpu.ops.posterior import posterior_probs_np, quality_score_np

post = posterior_probs_np(pa, pn, lik)
pm = np.array([post[i, somv[i]] for i in np.where(m)[0]])
print("VAL posterior@som median:", np.median(pm).round(3),
      "qual>8 frac (som):", (quality_score_np(pm) >= 8).mean().round(3),
      "posterior@neg max mean:", post[~m].max(axis=1).mean().round(4), flush=True)
