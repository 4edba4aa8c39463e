"""Benchmark: somatic-calling throughput, end-to-end and device-only, with a
MEASURED torch reference figure (no hard-coded baselines).

Prints ONE JSON line:
  {"metric": "candidates_end_to_end_per_sec", "value": N,
   "unit": "candidates/s/chip", "vs_baseline": N,
   "device_only_per_sec": N, "reference_measured_per_sec": N, ...}

Three measurements on the same deterministic workload (1 Mb @ 60x ONT-like
simulated tumor BAM, ~1-2k candidate sites):

- end_to_end: the production CLI (native BAM decode -> candidate gating ->
  dual 33x34 tensor views -> fused TPU dual-net + posterior -> filters ->
  VCF rows), candidates / calling-stage-seconds from RunMetricsSummary.
- device_only: the fused device program alone (rescale -> CvT + BiGRU ->
  softmax -> digitize+Bayes posterior -> argmax + QUAL) on synthetic
  batches.
- reference_measured: the reference's torch CvT + BiGRU_NACGT imported from
  /root/reference, batch 250 with torch.set_num_threads(1)
  (clairs/predict.py:475, shared/param.py:85), forward + per-allele softmax
  on the same number of candidates.  This EXCLUDES the reference's
  mpileup/pypy tensor generation (samtools does not exist in this image),
  i.e. it overstates reference throughput — vs_baseline =
  end_to_end / reference_measured is therefore a conservative ratio.
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BENCH_DIR = "/tmp/clairs_bench_v2"
GENOME_LEN = 1_000_000
COVERAGE = 60
SEED = 7


def build_workload():
    from clairs_to_tpu.bamio import simulate

    marker = os.path.join(BENCH_DIR, "DONE_v2")
    if os.path.exists(marker):
        return BENCH_DIR
    ds = simulate.make_dataset(
        BENCH_DIR, seed=SEED, genome_len=GENOME_LEN, coverage=COVERAGE,
        read_length=800, n_snv=60, n_indel=0, n_germline=900,
        error_rate=0.01, af_choices=(0.1, 0.15, 0.25, 0.4),
        somatic_hap_aware=True,
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return BENCH_DIR


def measure_end_to_end():
    """Run the production CLI; return (candidates, calling_seconds)."""
    out_dir = os.path.join(BENCH_DIR, "out")
    cmd = [
        sys.executable, "-m", "clairs_to_tpu", "run",
        "-T", os.path.join(BENCH_DIR, "tumor.bam"),
        "-R", os.path.join(BENCH_DIR, "ref.fa"),
        "-o", out_dir,
        "-p", "ont", "-t", "2",
        "--disable_verdict",
        "--disable_indel_calling", "true",
    ]
    env = dict(os.environ)
    proc = subprocess.run(
        cmd, cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=1200,
    )
    m = re.search(r"RunMetricsSummary: (\{.*\})", proc.stdout)
    if not m:
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:] + "\n")
        raise RuntimeError("no RunMetricsSummary in CLI output")
    summary = json.loads(m.group(1))
    cands = summary["counters"].get("candidates", 0)
    secs = summary["stages"].get("calling", summary["total_seconds"])
    return cands, secs


def measure_device_only():
    import jax
    import jax.numpy as jnp

    from clairs_to_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from clairs_to_tpu.models import cvt, bigru
    from clairs_to_tpu.ops import posterior as post

    batch = 2048
    use_pallas = jax.default_backend() == "tpu"
    aff_params = cvt.init(jax.random.PRNGKey(0))
    neg_params = bigru.init(jax.random.PRNGKey(1))
    lik = post.uniform_likelihood_data(4)
    lik_mat = jnp.asarray(lik.matrices, jnp.float32)
    aff_edges = jnp.asarray(lik.aff_edges, jnp.float32)
    neg_edges = jnp.asarray(lik.neg_edges, jnp.float32)

    @jax.jit
    def step(aff_p, neg_p, x_aff, x_neg, cov):
        scale = jnp.where(cov > 50.0, 50.0 / cov, 1.0).astype(jnp.float32)
        xa = x_aff * scale[:, None, None]
        xn = x_neg * scale[:, None, None]
        pa = jax.nn.softmax(cvt.forward(aff_p, xa), axis=-1)[..., 1]
        pn = jax.nn.softmax(
            bigru.forward(neg_p, xn, use_pallas=use_pallas), axis=-1
        )[..., 1]
        posterior = post.posterior_probs_jnp(pa, pn, lik_mat, aff_edges, neg_edges)
        best = jnp.argmax(posterior, axis=1)
        qual = post.quality_score_jnp(jnp.max(posterior, axis=1))
        return best, qual

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-40, 40, size=(batch, 33, 34)), jnp.float32)
    cov = jnp.asarray(rng.integers(10, 120, size=(batch,)), jnp.float32)

    jax.block_until_ready(step(aff_params, neg_params, x, x, cov))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(aff_params, neg_params, x, x, cov)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_reference(n_candidates):
    """Reference torch dual forward + softmax, batch 250, 1 thread
    (clairs/predict.py:475,644-684) — measured, not assumed."""
    if not os.path.isdir("/root/reference"):
        return None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import torch
        from clairs import model as ref_model
    except Exception:
        return None
    torch.set_num_threads(1)
    aff = ref_model.CvT(num_classes=2, model_type="acgt").eval()
    neg = ref_model.BiGRU_NACGT(num_classes=2, model_type="nacgt").eval()
    rng = np.random.default_rng(0)
    batch = 250  # shared/param.py:85 predictBatchSize
    n = max(min(int(n_candidates), 2000), 500)
    x = torch.tensor(
        rng.integers(-40, 40, size=(n, 33, 34)).astype(np.float32))
    with torch.no_grad():
        _ = aff(x[:8]); _ = neg(x[:8])  # warm
        t0 = time.perf_counter()
        done = 0
        while done < n:
            xb = x[done : done + batch]
            la = aff(xb)
            ln = neg(xb)
            for t in la:
                torch.softmax(t, dim=-1)
            for t in ln:
                torch.softmax(t, dim=-1)
            done += len(xb)
        dt = time.perf_counter() - t0
    return n / dt


def main():
    build_workload()
    cands, call_secs = measure_end_to_end()
    e2e = cands / call_secs if call_secs > 0 else 0.0
    device = measure_device_only()
    ref = measure_reference(cands)
    vs = round(e2e / ref, 2) if ref else None
    print(json.dumps({
        "metric": "candidates_end_to_end_per_sec",
        "value": round(e2e, 1),
        "unit": "candidates/s/chip",
        "vs_baseline": vs,
        "device_only_per_sec": round(device, 1),
        "reference_measured_per_sec": round(ref, 1) if ref else None,
        "reference_note": "torch fwd+softmax only (batch 250, 1 thread); "
                          "excludes reference mpileup tensor-gen, so "
                          "vs_baseline is conservative",
        "candidates": cands,
        "calling_stage_seconds": round(call_secs, 2),
        "workload": f"{GENOME_LEN//1000}kb@{COVERAGE}x ONT-like sim, seed {SEED}",
    }))


if __name__ == "__main__":
    main()
