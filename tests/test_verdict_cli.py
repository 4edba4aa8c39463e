"""Verdict stage through the CLI: runs (or skips) gracefully on flat data."""

import os

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


def test_verdict_stage_runs(tmp_path, capsys):
    ds = simulate.make_dataset(
        str(tmp_path / "sim"), seed=19, genome_len=40_000, coverage=55,
        n_snv=10, n_germline=20,  # plenty of het loci for the verdict input
    )
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing",
        # verdict enabled (no --disable_verdict)
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # the stage must either report a result or a graceful skip — never crash
    assert ("Verdict" in out) or ("Verdict skipped" in out), out[-500:]
    assert os.path.exists(os.path.join(out_dir, "snv.vcf"))
    # diploid flat-coverage sim: verdict must not have destroyed PASS calls
    body = [l for l in open(os.path.join(out_dir, "snv.vcf")) if not l.startswith("#")]
    assert sum(1 for l in body if "\tPASS\t" in l) >= 5
    # when the verdict sub-pipeline actually ran, the reference's cna_output/
    # file layout must be on disk (tmp/cna_output/<sample>_Tumor_*.txt)
    cna_dir = os.path.join(out_dir, "tmp", "cna_output")
    if "Verdict:" in out and os.path.isdir(cna_dir):
        names = os.listdir(cna_dir)
        assert any(n.endswith("_Tumor_LogR.txt") for n in names), names
        assert any(n.endswith("_Tumor_BAF.txt") for n in names), names


def test_verdict_cna_resource_dir(tmp_path, capsys):
    """--cna_resource_dir: loci from G1000-layout allele files + GC/RT
    correction tracks (run_clairs_to:988-1005 resource bundle)."""
    import numpy as np

    rng = np.random.default_rng(5)
    ds = simulate.make_dataset(
        str(tmp_path / "sim"), seed=23, genome_len=40_000, coverage=55,
        n_snv=8, n_germline=25,
    )
    # germline het positions from the truth VCF become the "G1000" loci
    loci = []
    code = {"A": "1", "C": "2", "G": "3", "T": "4"}
    for line in open(ds["truth"]):
        if line.startswith("#"):
            continue
        cols = line.split("\t")
        if len(cols[3]) == 1 and len(cols[4]) == 1 and "germline" in line.lower():
            loci.append((int(cols[1]), cols[3], cols[4]))
    if not loci:  # truth may not mark germline; fall back to sampled sites
        for line in open(ds["truth"]):
            if not line.startswith("#"):
                cols = line.split("\t")
                if len(cols[3]) == 1 and len(cols[4]) == 1:
                    loci.append((int(cols[1]), cols[3], cols[4]))
    res_dir = tmp_path / "cna_resources"
    (res_dir / "allele_files").mkdir(parents=True)
    with open(res_dir / "allele_files" / "G1000_alleles_hg38_chrS.txt", "w") as f:
        f.write("position\tallele_A\tallele_B\n")
        for pos1, ref, alt in loci:
            f.write(f"{pos1}\t{code[ref]}\t{code[alt]}\n")
    for track in ("GC_G1000_hg38.txt", "RT_G1000_hg38.txt"):
        with open(res_dir / track, "w") as f:
            f.write("idx\tchr\tpos\t" + "\t".join(f"c{i}" for i in range(12)) + "\n")
            for k, (pos1, _r, _a) in enumerate(loci):
                vals = "\t".join(f"{rng.random():.4f}" for _ in range(12))
                f.write(f"{k}\tS\t{pos1}\t{vals}\n")
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing",
        "--cna_resource_dir", str(res_dir),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "G1000 loci from" in out, out[-800:]
    assert os.path.exists(os.path.join(out_dir, "snv.vcf"))
