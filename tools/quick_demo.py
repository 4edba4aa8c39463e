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
ap.add_argument("--real", action="store_true",
                help="Dry-run the REAL HCC1395 quick-demo command plan "
                     "(docs/REAL_DATA.md): print the download/run/compare "
                     "commands for the chosen platform and validate that "
                     "the run command parses. No network is touched.")
a = ap.parse_args()

if a.real:
    import shlex

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    D = os.path.expanduser("~/clairs_to_tpu_demo")
    plat_data = {
        "ont": ("ont", "HCC1395_tumor_chr17_demo.bam",
                "ont_r10_guppy_sup_4khz"),
        "ilmn": ("ilmn", "HCC1395_tumor_chr17_demo.bam", "ilmn"),
        "hifi": ("hifi", "HCC1395_tumor_chr17_demo.bam", "hifi_revio"),
    }[a.platform]
    sub, bam, plat = plat_data
    base = "http://www.bio8.cs.hku.hk/clairs/quick_demo"
    downloads = [
        f"wget -P {D} -nc {base}/ilmn/SEQC2_high-confidence_sSNV_in_HC_regions_v1.2_chr17.vcf.gz",
        f"wget -P {D} -nc {base}/ilmn/SEQC2_high-confidence_sSNV_in_HC_regions_v1.2_chr17.vcf.gz.tbi",
        f"wget -P {D} -nc {base}/ilmn/SEQC2_High-Confidence_Regions_v1.2_chr17.bed",
        f"wget -P {D} -nc {base}/{sub}/GRCh38_no_alt_chr17.fa",
        f"wget -P {D} -nc {base}/{sub}/GRCh38_no_alt_chr17.fa.fai",
        f"wget -P {D} -nc {base}/{sub}/{bam}",
        f"wget -P {D} -nc {base}/{sub}/{bam}.bai",
    ]
    run_argv = [
        "-T", f"{D}/{bam}", "-R", f"{D}/GRCh38_no_alt_chr17.fa",
        "-o", f"{D}/output", "-t", "4", "-p", plat,
        "-r", "chr17:80000000-80100000",
    ]
    compare_argv = [
        "--truth_vcf_fn",
        f"{D}/SEQC2_high-confidence_sSNV_in_HC_regions_v1.2_chr17.vcf.gz",
        "--input_vcf_fn", f"{D}/output/snv.vcf.gz",
        "--bed_fn", f"{D}/SEQC2_High-Confidence_Regions_v1.2_chr17.bed",
        "--output_dir", f"{D}/output/benchmark",
        "--input_filter_tag", "PASS", "--ctg_name", "chr17",
        "--ctg_start", "80000000", "--ctg_end", "80100000",
    ]
    # validate the run command against the real parser (dry)
    from clairs_to_tpu.cli.run import build_parser

    build_parser().parse_args(run_argv)
    print(f"# REAL-DATA PLAN ({a.platform}) — docs/REAL_DATA.md")
    print(f"mkdir -p {D}")
    for c in downloads:
        print(c)
    print("python -m clairs_to_tpu run " +
          " ".join(shlex.quote(x) for x in run_argv))
    print("python -m clairs_to_tpu compare_vcf " +
          " ".join(shlex.quote(x) for x in compare_argv))
    expected = {"ont": "F1 0.9655 (28 TP, 1 FP, 1 FN)",
                "hifi": "F1 0.9655 (28 TP, 1 FP, 1 FN)",
                "ilmn": "F1 0.9831 (29 TP, 1 FP, 0 FN)"}[a.platform]
    print(f"# expected: {expected}  (reference committed table)")
    sys.exit(0)

if a.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

if a.cpu:
    jax.config.update("jax_platforms", "cpu")

from clairs_to_tpu.bamio import simulate  # noqa: E402
from clairs_to_tpu.bench.compare import compare_vcf, format_report  # noqa: E402
from clairs_to_tpu.cli.run import main as cli_main  # noqa: E402

# Platform read profiles + evaluation-grade error structure: shared with
# tools/eval_flagship.py --eval_grade (see bench/profiles.py docstring for
# the decoupling rationale).
from clairs_to_tpu.bench.profiles import PROFILES  # noqa: E402
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
