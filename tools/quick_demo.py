"""Per-platform quick demo: simulate -> full CLI run -> som.py-semantics F1.

The framework analog of the reference's demo/{ont,ilmn,pacbio_hifi}_quick_demo.sh
(reference docs/*_quick_demo.md): since HCC1395 chr17 data and trained
reference checkpoints cannot be downloaded in this environment, each platform
demo simulates tumor reads with a platform-shaped profile (read length /
error rate), runs the complete calling pipeline through the CLI (candidate
extraction -> dual-network TPU inference -> posterior -> platform filter
chain -> Verdict), and benchmarks against the simulated truth.

Usage:  python tools/quick_demo.py --platform ont|ilmn|hifi [--seed N]
Expected outputs are committed in docs/{ont,illumina,pacbio_hifi}_quick_demo.md.
"""
import argparse
import os
import sys
import tempfile

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default="ont", choices=["ont", "ilmn", "hifi"])
ap.add_argument("--seed", type=int, default=78)
ap.add_argument("--genome_len", type=int, default=50_000)
ap.add_argument("--out", default=None, help="Output dir (default: tempdir).")
ap.add_argument("--cpu", action="store_true", help="Force the CPU backend.")
ap.add_argument("--include_indels", action="store_true",
                help="Also simulate somatic indels and benchmark indel.vcf "
                     "(long-read platforms; the reference calls indels for "
                     "ont/hifi only by default).")
a = ap.parse_args()

if a.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

if a.cpu:
    jax.config.update("jax_platforms", "cpu")

from clairs_to_tpu.bamio import simulate  # noqa: E402
from clairs_to_tpu.bench.compare import compare_vcf, format_report  # noqa: E402
from clairs_to_tpu.cli.run import main as cli_main  # noqa: E402

# Platform read profiles (read length / per-base error / coverage), shaped
# after the reference demo datasets: ONT Q20+ ~70x, Illumina ~50x 150 bp,
# PacBio Revio HiFi ~60x (reference docs/*_quick_demo.md headers).
# The eval_profile adds error STRUCTURE (homopolymer context, strand
# asymmetry, quality decay, bursts) that the training tensor synthesizer
# (bench/synth.py) does not model — held-out evaluation is decoupled from
# the training noise process, so these F1 tables measure generalization,
# not memorization.  They remain simulation-local numbers, NOT comparable
# to the reference's HCC1395 tables.
PROFILES = {
    "ont": dict(read_length=500, error_rate=0.002, coverage=65,
                eval_profile=dict(hp_error_mult=4.0, strand_err_mult=1.6,
                                  qual_decay=6.0, burst_rate=0.08,
                                  burst_len=40, burst_qual=8)),
    "ilmn": dict(read_length=150, error_rate=0.001, coverage=50,
                 eval_profile=dict(hp_error_mult=1.5, strand_err_mult=2.0,
                                   qual_decay=10.0, burst_rate=0.02,
                                   burst_len=20, burst_qual=6)),
    "hifi": dict(read_length=1500, error_rate=0.001, coverage=60,
                 eval_profile=dict(hp_error_mult=3.0, strand_err_mult=1.2,
                                   qual_decay=2.0, burst_rate=0.03,
                                   burst_len=60, burst_qual=10)),
}
# Continuous somatic AF spectrum (training uses a bounded uniform range;
# the demo draws a dense grid including AFs outside the training band).
AF_GRID = tuple(round(0.05 + 0.01 * i, 2) for i in range(41))  # 0.05..0.45

d = a.out or tempfile.mkdtemp(prefix=f"demo_{a.platform}_")
ds = simulate.make_dataset(
    os.path.join(d, "data"), seed=a.seed, genome_len=a.genome_len,
    n_snv=20, n_indel=12 if a.include_indels else 0, n_germline=12,
    somatic_hap_aware=True, af_choices=AF_GRID, **PROFILES[a.platform],
)
argv = ["-T", ds["bam"], "-R", ds["fasta"], "-o", os.path.join(d, "out"),
        "-t", "2", "-p", a.platform]
if not a.include_indels:
    argv += ["--disable_indel_calling", "true"]
cli_main(argv)
print(f"\n=== {a.platform} quick demo (seed {a.seed}) ===")
print(format_report(compare_vcf(ds["truth_snv"],
                                os.path.join(d, "out", "snv.vcf"),
                                input_filter_tag="PASS")))
if a.include_indels:
    print(format_report(compare_vcf(
        ds["truth_indel"], os.path.join(d, "out", "indel.vcf"),
        input_filter_tag="PASS", benchmark_indel=True)))
