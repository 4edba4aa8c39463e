"""Train per-platform flagship checkpoints with dual-BQ views.

AFF trains on min_bq-filtered tensors, NEG on min_bq=0 tensors including a
low-BQ-artifact negative class (run_clairs_to:1237 vs :1264 asymmetry); for
min_bq=0 platforms (ilmn/hifi) the two views coincide, matching the
reference's symlinked negational tensor dir (run_clairs_to:1248-1252).
Writes to --out; promotion to assets/flagship_<fam>_snv happens after
end-to-end comparison (tools/eval_flagship.py) against committed checkpoints.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--out", default="/tmp/flagship_dual")
ap.add_argument("--mode", default="snv", choices=["snv", "indel"])
ap.add_argument("--platform", default="ont", choices=["ont", "ilmn", "hifi"])
ap.add_argument("--n_train", type=int, default=12000)
ap.add_argument("--epochs", type=int, default=80)
ap.add_argument("--lr", type=float, default=2e-4)
ap.add_argument("--seed", type=int, default=11)
a = ap.parse_args()

# Platform-shaped synthesis profiles (error/quality-bucket rates; the dual
# vs single view switch itself keys off MIN_BQ_DICT inside the synthesizer).
SYNTH_PROFILES = {
    "ont": dict(error_rate=0.003, lowbq_rate=0.12, midbq_rate=0.15,
                lowmq_rate=0.03),
    "ilmn": dict(error_rate=0.0015, lowbq_rate=0.10, midbq_rate=0.12,
                 lowmq_rate=0.02),
    "hifi": dict(error_rate=0.0015, lowbq_rate=0.05, midbq_rate=0.08,
                 lowmq_rate=0.02),
}

from clairs_to_tpu.bench.synth import synthesize_dual_batch
from clairs_to_tpu.train import (
    DualTrainer, TrainConfig, save_checkpoint, calibrate_likelihood,
    save_likelihood_matrix,
)
import jax

out = a.out if a.mode == "snv" else os.path.join(a.out, "indel")
os.makedirs(out, exist_ok=True)
print("devices:", jax.devices(), "mode:", a.mode, "platform:", a.platform,
      flush=True)

rng = np.random.default_rng(a.seed)
kw = dict(depth_range=(25, 95), somatic_af_range=(0.08, 0.35), mode=a.mode,
          beta_subsample=True, platform=a.platform,
          **SYNTH_PROFILES[a.platform])
xa, xn, cov, _cn, som = synthesize_dual_batch(rng, a.n_train, **kw)
print("train:", xa.shape, "pos:", (som >= 0).sum(), flush=True)

tr = DualTrainer(mode=a.mode,
                 tc=TrainConfig(batch_size=256, epochs=a.epochs,
                                learning_rate=a.lr))
t0 = time.time()
chunks = max(a.epochs // 10, 1)
for c in range(chunks):
    tr.fit(xa, som, epochs=10, rescale_cov=cov, x_neg=xn)
    save_checkpoint(f"{out}/aff.npz", tr.params["aff"])
    save_checkpoint(f"{out}/neg.npz", tr.params["neg"])
    print(f"epoch {(c + 1) * 10} saved, {time.time() - t0:.0f}s", flush=True)

n_all = 4 if a.mode == "snv" else 6
xc, xnc, covc, _c, somc = synthesize_dual_batch(np.random.default_rng(55), 4000, **kw)
pa, pn = tr.predict_probs(xc, rescale_cov=covc, x_neg=xnc)
lik = calibrate_likelihood(pa, pn, somc, n_alleles=n_all)
save_likelihood_matrix(f"{out}/likelihood_matrix.txt", lik)

xv, xnv, covv, _c, somv = synthesize_dual_batch(np.random.default_rng(99), 1200, **kw)
pa, pn = tr.predict_probs(xv, rescale_cov=covv, x_neg=xnv)
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
