import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from clairs_to_tpu.bench.synth import synthesize_batch
from clairs_to_tpu.bench.demo import TINY_CVT, TINY_BIGRU
from clairs_to_tpu.train import DualTrainer, TrainConfig, save_checkpoint, calibrate_likelihood, save_likelihood_matrix
import jax
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(7)
kw = dict(depth_range=(25, 95), somatic_af_range=(0.08, 0.35))
x, cov, som = synthesize_batch(rng, 8000, **kw)
print("train:", x.shape, "pos:", (som>=0).sum(), flush=True)
tr = DualTrainer(mode="snv", tc=TrainConfig(batch_size=256, epochs=70, learning_rate=1e-3),
                 cvt_config=TINY_CVT, bigru_config=TINY_BIGRU)
t0 = time.time()
for chunk in range(7):
    tr.fit(x, som, epochs=10, rescale_cov=cov)
    save_checkpoint("/root/repo/assets/demo_ont_snv/aff.npz", tr.params["aff"])
    save_checkpoint("/root/repo/assets/demo_ont_snv/neg.npz", tr.params["neg"])
    print(f"epoch {(chunk+1)*10} saved, {time.time()-t0:.0f}s", flush=True)
# calibration matrix from a fresh synth set
xc, covc, somc = synthesize_batch(np.random.default_rng(55), 3000, **kw)
pa, pn = tr.predict_probs(xc, rescale_cov=covc)
lik = calibrate_likelihood(pa, pn, somc)
save_likelihood_matrix("/root/repo/assets/demo_ont_snv/likelihood_matrix.txt", lik)
xv, covv, somv = synthesize_batch(np.random.default_rng(99), 800, **kw)
pa, pn = tr.predict_probs(xv, rescale_cov=covv)
m = somv >= 0
print("VAL p_aff@som:", np.mean([pa[i, somv[i]] for i in np.where(m)[0]]).round(3),
      "@neg:", pa[~m].max(axis=1).mean().round(3),
      "p_neg@som:", np.mean([pn[i, somv[i]] for i in np.where(m)[0]]).round(3), flush=True)
from clairs_to_tpu.ops.posterior import posterior_probs_np, quality_score_np
post = posterior_probs_np(pa, pn, lik)
pm = np.array([post[i, somv[i]] for i in np.where(m)[0]])
print("VAL posterior@som median:", np.median(pm).round(3),
      "qual>8 frac:", (quality_score_np(pm) >= 8).mean().round(3),
      "posterior@neg max mean:", post[~m].max(axis=1).mean().round(4), flush=True)
