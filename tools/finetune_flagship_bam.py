"""Fine-tune flagship checkpoints on BAM-derived pipeline tensors.

Synth-tensor training (bench/synth.py) leaves a domain gap to the tensors
the production pileup actually builds — measured round 2: a synth-trained
ilmn SNV model scored F1 0.807 on the ilmn held-out eval while the
ONT-flagship fallback scored 0.928.  This tool closes the gap by training on
labeled tensors extracted from simulated BAMs through the REAL pileup
(bench/demo.py::build_labeled_tensors_dual), optionally initialized from an
existing checkpoint directory.

Phases are separable so tensor building (host-bound) can overlap other TPU
work: --build_only writes tensors.npz; a later run with --train reads it.
Promotion stays gated on tools/eval_flagship.py beating the committed
fallback on held-out seeds.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default="ilmn", choices=["ont", "ilmn", "hifi"])
ap.add_argument("--mode", default="snv", choices=["snv", "indel"])
ap.add_argument("--out", required=True)
ap.add_argument("--init_dir", default=None,
                help="checkpoint dir to fine-tune from (aff.npz/neg.npz); "
                     "fresh init when omitted")
ap.add_argument("--train_seeds", default="1001,1002,1003,1004,1005,1006,1007,1008,1009,1010")
ap.add_argument("--cal_seeds", default="1101,1102,1103")
ap.add_argument("--genome_len", type=int, default=150_000)
ap.add_argument("--coverage", type=int, default=55)
ap.add_argument("--n_var", type=int, default=120)
ap.add_argument("--epochs", type=int, default=40)
ap.add_argument("--lr", type=float, default=1e-4)
ap.add_argument("--mix_synth", type=int, default=6000,
                help="synth tensors mixed in for volume/regularization")
ap.add_argument("--build_only", action="store_true")
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--domain_rand", action="store_true",
                help="attach DOMAIN-RANDOMIZED structured-error profiles "
                     "(homopolymer/strand/decay/burst params sampled from "
                     "ranges DISJOINT from the held-out eval point in "
                     "bench/profiles.py) to every second dataset — the "
                     "round-5 robustness recipe: the model sees structured "
                     "error without ever seeing the eval configuration")
a = ap.parse_args()

if a.cpu or a.build_only:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

from clairs_to_tpu.bamio import simulate  # noqa: E402
from clairs_to_tpu.bench.demo import build_labeled_tensors_dual  # noqa: E402

os.makedirs(a.out, exist_ok=True)
TENSORS = os.path.join(a.out, "tensors.npz")


def _rand_profile(rng):
    """Structured-error params from ranges DISJOINT from the eval point.

    The held-out ONT eval profile is fixed at hp=4.0 strand=1.6 decay=6.0
    burst_rate=0.08 burst_len=40 burst_qual=8 (bench/profiles.py:16-19);
    every dimension here samples strictly below or strictly above that
    value, so training never sees the eval configuration — robustness must
    come from generalizing over the error-structure FAMILY."""
    def pick(lo1, hi1, lo2, hi2):
        return float(rng.uniform(lo1, hi1) if rng.random() < 0.5
                     else rng.uniform(lo2, hi2))

    return dict(
        hp_error_mult=pick(1.5, 3.2, 5.0, 8.0),
        strand_err_mult=pick(1.0, 1.45, 1.8, 2.6),
        qual_decay=pick(0.0, 4.5, 8.0, 14.0),
        burst_rate=pick(0.0, 0.055, 0.11, 0.2),
        burst_len=int(pick(10, 32, 50, 90)),
        burst_qual=int(pick(4, 7, 10, 14)),
    )


def build_tensors():
    """Simulate PLATFORM-SHAPED genomes (read length / error rate / coverage
    from bench/profiles.py, WITHOUT the eval-grade error structure — that
    stays held out for evaluation) on seeds disjoint from the eval seeds,
    and extract labeled dual-view tensors.  Without the platform shaping,
    ilmn and hifi would train on byte-identical data (both families run
    min_bq=0, and the simulator is platform-blind).

    With --domain_rand, every second dataset gets a randomized structured-
    error profile (see _rand_profile) — plain and structured data mix in
    both the training and the calibration split."""
    from clairs_to_tpu.bench.profiles import PROFILES

    shape = dict(PROFILES[a.platform])
    shape.pop("eval_profile", None)
    xs, xns, covs, soms = [], [], [], []
    for which, seeds in (("train", a.train_seeds), ("cal", a.cal_seeds)):
        for k, seed in enumerate(int(s) for s in seeds.split(",")):
            d = os.path.join(a.out, f"ds_{seed}")
            kw = dict(seed=seed, genome_len=a.genome_len,
                      n_germline=max(a.genome_len // 4000, 6), **shape)
            if a.domain_rand and k % 2 == 1:
                kw["eval_profile"] = _rand_profile(
                    np.random.default_rng(seed * 7 + 3))
            if a.mode == "indel":
                kw.update(n_snv=a.n_var // 4, n_indel=a.n_var)
            else:
                kw.update(n_snv=a.n_var)
            ds = simulate.make_dataset(d, **kw)
            xa, xn, cov, som, _pos = build_labeled_tensors_dual(
                ds, platform=a.platform, mode=a.mode, seed=seed)
            xs.append(xa); xns.append(xn); covs.append(cov); soms.append(som)
            print(f"[build] {which} seed {seed}: {len(som)} sites, "
                  f"{(som >= 0).sum()} somatic", flush=True)
    n_cal = sum(len(s) for s in soms[-len(a.cal_seeds.split(",")):])
    np.savez_compressed(
        TENSORS,
        x=np.concatenate(xs), x_neg=np.concatenate(xns),
        cov=np.concatenate(covs), som=np.concatenate(soms),
        n_cal=np.int64(n_cal),
        build_params=np.array(_build_params_str()),
    )
    print("[build] wrote", TENSORS, flush=True)


def _build_params_str():
    return (f"platform={a.platform};mode={a.mode};train_seeds={a.train_seeds};"
            f"cal_seeds={a.cal_seeds};genome_len={a.genome_len};"
            f"n_var={a.n_var};domain_rand={a.domain_rand}")


if os.path.exists(TENSORS):
    # a stale tensors.npz from a different platform/mode/seed run would
    # silently train on the wrong family's data — validate and rebuild
    _z = np.load(TENSORS)
    _have = str(_z["build_params"]) if "build_params" in _z else "<unversioned>"
    _z.close()
    if _have != _build_params_str():
        print(f"[build] {TENSORS} was built with different parameters\n"
              f"        have: {_have}\n        want: {_build_params_str()}\n"
              "        rebuilding", flush=True)
        os.unlink(TENSORS)
if not os.path.exists(TENSORS):
    build_tensors()
if a.build_only:
    sys.exit(0)

import jax  # noqa: E402

from clairs_to_tpu.bench.synth import synthesize_dual_batch  # noqa: E402
from clairs_to_tpu.models import cvt as cvt_mod, bigru as bigru_mod  # noqa: E402
from clairs_to_tpu.train import (  # noqa: E402
    DualTrainer, TrainConfig, save_checkpoint, load_checkpoint,
    calibrate_likelihood, save_likelihood_matrix,
)

print("devices:", jax.devices(), flush=True)
z = np.load(TENSORS)
x, x_neg, cov, som, n_cal = z["x"], z["x_neg"], z["cov"], z["som"], int(z["n_cal"])
xt, xnt, covt, somt = x[:-n_cal], x_neg[:-n_cal], cov[:-n_cal], som[:-n_cal]
xc, xnc, covc, somc = x[-n_cal:], x_neg[-n_cal:], cov[-n_cal:], som[-n_cal:]
print(f"train {len(somt)} ({(somt >= 0).sum()} som) cal {len(somc)}", flush=True)

if a.mix_synth:
    rng = np.random.default_rng(17)
    kw = dict(depth_range=(25, 95), somatic_af_range=(0.08, 0.35), mode=a.mode,
              beta_subsample=True, platform=a.platform)
    sx, sxn, scov, _c, ssom = synthesize_dual_batch(rng, a.mix_synth, **kw)
    xt = np.concatenate([xt, sx]); xnt = np.concatenate([xnt, sxn])
    covt = np.concatenate([covt, scov]); somt = np.concatenate([somt, ssom])

tr = DualTrainer(mode=a.mode,
                 tc=TrainConfig(batch_size=256, epochs=a.epochs,
                                learning_rate=a.lr))
if a.init_dir:
    tr.params = {
        "aff": load_checkpoint(os.path.join(a.init_dir, "aff.npz"),
                               tr.params["aff"]),
        "neg": load_checkpoint(os.path.join(a.init_dir, "neg.npz"),
                               tr.params["neg"]),
    }
    tr.opt_state = tr.tx.init(tr.params)
    print("[init] fine-tuning from", a.init_dir, flush=True)

t0 = time.time()
remaining = a.epochs
done = 0
while remaining > 0:
    step = min(10, remaining)
    tr.fit(xt, somt, epochs=step, rescale_cov=covt, x_neg=xnt)
    remaining -= step
    done += step
    save_checkpoint(f"{a.out}/aff.npz", tr.params["aff"])
    save_checkpoint(f"{a.out}/neg.npz", tr.params["neg"])
    print(f"epoch {done} saved, {time.time() - t0:.0f}s", flush=True)

n_all = 4 if a.mode == "snv" else 6
pa, pn = tr.predict_probs(xc, rescale_cov=covc, x_neg=xnc)
lik = calibrate_likelihood(pa, pn, somc, n_alleles=n_all)
save_likelihood_matrix(f"{a.out}/likelihood_matrix.txt", lik)
m = somc >= 0
print("CAL p_aff@som:",
      np.mean([pa[i, somc[i]] for i in np.where(m)[0]]).round(3),
      "@neg:", pa[~m].max(axis=1).mean().round(3), flush=True)
