"""End-to-end F1 evaluation of a flagship checkpoint directory.

Simulates held-out tumor genomes (optionally with low-BQ artifact noise —
the failure mode the reference's dual-BQ AFF/NEG asymmetry targets,
run_clairs_to:1237 vs :1264), runs the full calling pipeline with the given
checkpoints, and reports som.py-semantics P/R/F1 per dataset.

Used to decide checkpoint promotion: run it on the committed assets and on a
freshly trained candidate, compare.  Runs on CPU by default so the TPU stays
free for training (--tpu to override).
"""
import argparse
import json
import os
import sys
import tempfile

ap = argparse.ArgumentParser()
ap.add_argument("--model_dir", required=True)
ap.add_argument("--mode", default="snv", choices=["snv", "indel"])
ap.add_argument("--seeds", default="301,302,303")
ap.add_argument("--lowbq_rate", type=float, default=0.0)
ap.add_argument("--genome_len", type=int, default=150_000)
ap.add_argument("--coverage", type=int, default=55)
ap.add_argument("--qual_cutoff", type=float, default=8)
ap.add_argument("--platform", default="ont")
ap.add_argument("--tpu", action="store_true")
ap.add_argument("--eval_grade", action="store_true",
                help="platform-shaped reads + evaluation-grade error "
                     "structure (quick_demo PROFILES) instead of the plain "
                     "sim process")
a = ap.parse_args()

if not a.tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

if not a.tpu:
    # the axon TPU plugin re-pins jax_platforms at import time; the config
    # update (post-import) wins over it (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

from clairs_to_tpu.bamio import simulate  # noqa: E402
from clairs_to_tpu.bench.compare import compare_vcf  # noqa: E402
from clairs_to_tpu.genome.chunks import plan_chunks  # noqa: E402
from clairs_to_tpu.genome.fasta import FastaFile  # noqa: E402
from clairs_to_tpu.infer.engine import InferenceEngine  # noqa: E402
from clairs_to_tpu.infer.pipeline import CallingPipeline, PipelineOptions  # noqa: E402
from clairs_to_tpu.models import cvt as cvt_mod, bigru as bigru_mod  # noqa: E402
from clairs_to_tpu.ops.posterior import load_likelihood_matrix  # noqa: E402
from clairs_to_tpu.train import load_checkpoint  # noqa: E402
from clairs_to_tpu.vcf.writer import VcfWriter  # noqa: E402
from clairs_to_tpu.vcf.sort import merge_vcf_files  # noqa: E402

indel_mode = a.mode == "indel"


def build_engine(model_dir, mode):
    n_alleles = 6 if mode == "indel" else 4
    if mode == "indel":
        cvt_config = cvt_mod.INDEL_CVT_CONFIG
        bigru_config = bigru_mod.INDEL_BIGRU_CONFIG
    else:
        cvt_config = cvt_mod.SNV_CVT_CONFIG
        bigru_config = bigru_mod.SNV_BIGRU_CONFIG
    aff = load_checkpoint(os.path.join(model_dir, "aff.npz"),
                          cvt_mod.init(jax.random.PRNGKey(0), cvt_config))
    neg = load_checkpoint(os.path.join(model_dir, "neg.npz"),
                          bigru_mod.init(jax.random.PRNGKey(1), bigru_config))
    lik = load_likelihood_matrix(
        os.path.join(model_dir, "likelihood_matrix.txt"), n_alleles=n_alleles)
    return InferenceEngine(aff, neg, lik, mode=mode, device_batch=512,
                           cvt_config=cvt_config, bigru_config=bigru_config)


engine = build_engine(a.model_dir, a.mode)
# indel mode still needs an SNV engine for the pipeline's SNV lane; use the
# committed flagship (its calls are ignored by the indel-only comparison)
snv_engine = engine if not indel_mode else build_engine(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 "assets", "flagship_ont_snv"), "snv")

results = []
for seed in [int(s) for s in a.seeds.split(",")]:
    out = tempfile.mkdtemp(prefix=f"eval_{a.mode}_{seed}_")
    n_var = max(a.genome_len // 1200, 12)
    kw = dict(seed=seed, genome_len=a.genome_len, coverage=a.coverage,
              n_germline=max(a.genome_len // 4000, 6),
              lowbq_rate=a.lowbq_rate)
    if a.eval_grade:
        # platform-shaped reads + evaluation-grade error STRUCTURE
        # (homopolymer/strand/burst processes the training synthesizer does
        # not model) — same decoupling as tools/quick_demo.py PROFILES.
        # Explicit user flags win over the profile values; announce the
        # effective shape so overrides are never silent.
        from clairs_to_tpu.bench.profiles import PROFILES
        from clairs_to_tpu.config import platform_family
        prof = dict(PROFILES[platform_family(a.platform)])
        explicit = {s.lstrip("-").split("=")[0] for s in sys.argv[1:]}
        for k in list(prof):
            if k in explicit:
                prof.pop(k)
        kw.update(prof)
        print(f"[eval_grade] effective coverage={kw.get('coverage')} "
              f"read_length={kw.get('read_length', 'default')} "
              f"error_rate={kw.get('error_rate', 'default')}", flush=True)
    if indel_mode:
        kw.update(n_snv=0, n_indel=n_var)
    else:
        kw.update(n_snv=n_var)
    ds = simulate.make_dataset(out, **kw)
    fasta = FastaFile(ds["fasta"])
    pipe = CallingPipeline(
        fasta, ds["bam"],
        snv_engine=snv_engine,
        indel_engine=engine if indel_mode else None,
        options=PipelineOptions(platform=a.platform, qual_cutoff=a.qual_cutoff,
                                select_indel_candidates=indel_mode),
    )
    paths = []
    for ch in plan_chunks(fasta, chunk_size=max(a.genome_len // 3, 10_000)):
        res = pipe.call_chunk(ch)
        p = os.path.join(out, f"p_{ch.chunk_id}.vcf")
        w = VcfWriter(p, ctg_name=ds["ctg"], ref_fn=ds["fasta"])
        for row in (res.indel_rows if indel_mode else res.snv_rows):
            w.write_row(**row)
        w.close()
        paths.append(p)
    vcf_path = os.path.join(out, f"{a.mode}.vcf")
    merge_vcf_files(paths, vcf_path)
    truth = ds["truth_indel"] if indel_mode and "truth_indel" in ds else ds["truth"]
    r = compare_vcf(truth, vcf_path, input_filter_tag="PASS",
                    benchmark_indel=indel_mode)
    results.append(dict(seed=seed, f1=r.f1, precision=r.precision,
                        recall=r.recall, tp=r.tp, fp=r.fp, fn=r.fn))
    print(json.dumps(results[-1]), flush=True)

mean_f1 = float(np.mean([r["f1"] for r in results]))
print(json.dumps({"model_dir": a.model_dir, "mode": a.mode,
                  "lowbq_rate": a.lowbq_rate, "mean_f1": round(mean_f1, 4)}))
