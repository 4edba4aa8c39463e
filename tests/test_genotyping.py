"""Genotyping (-G) and hybrid (-H) calling modes + add-back."""

import os

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main
from clairs_to_tpu.postcall.addback import add_back_missing
from clairs_to_tpu.genome.fasta import FastaFile

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("gsim")
    return simulate.make_dataset(
        str(out), seed=91, genome_len=40_000, coverage=55, n_snv=10, n_germline=5
    )


def _write_sites_vcf(path, sites):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for (ctg, pos, ref, alt) in sites:
            f.write(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t30\tPASS\t.\tGT\t0/1\n")
    return path


def test_genotyping_mode_emits_every_requested_site(dataset, tmp_path):
    somatic = [v for v in dataset["variants"] if v.kind == "snv" and not v.germline][:4]
    # two real sites + one site with no variant + one out-of-coverage site
    sites = [("chrS", v.pos + 1, v.ref, v.alt) for v in somatic[:2]]
    sites.append(("chrS", 5000, "N", "A"))
    sites.append(("chrS", 39990, "N", "A"))  # contig-edge, likely unprocessable
    gvcf = _write_sites_vcf(str(tmp_path / "sites.vcf"), sites)
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing", "--disable_verdict",
        "-G", gvcf,
    ])
    assert rc == 0
    body = {}
    for line in open(os.path.join(out_dir, "snv.vcf")):
        if line.startswith("#"):
            continue
        cols = line.split("\t")
        body[int(cols[1])] = cols
    # every requested site is present
    for (_c, pos, _r, _a) in sites:
        assert pos in body, (pos, sorted(body))
    # the real somatic sites should be non-ref calls
    for v in somatic[:2]:
        assert body[v.pos + 1][4] == v.alt
    # no extra de-novo sites in genotyping mode
    assert set(body) == {pos for (_c, pos, _r, _a) in sites}


def test_hybrid_mode_unions_discovery(dataset, tmp_path):
    sites = [("chrS", 7000, "N", "A")]
    gvcf = _write_sites_vcf(str(tmp_path / "sites.vcf"), sites)
    out_dir = str(tmp_path / "outh")
    rc = cli_main([
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing", "--disable_verdict",
        "-H", gvcf,
    ])
    assert rc == 0
    positions = {
        int(l.split("\t")[1])
        for l in open(os.path.join(out_dir, "snv.vcf"))
        if not l.startswith("#")
    }
    assert 7000 in positions          # requested site present
    assert len(positions) > 1         # plus discovered candidates


def test_add_back_missing(dataset, tmp_path):
    out = str(tmp_path / "o.vcf")
    with open(out, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        f.write("chrS\t100\t.\tA\tC\t20.0\tPASS\t.\tGT:GQ:DP:AF\t0/1:20:30:0.2\n")
    gvcf = _write_sites_vcf(
        str(tmp_path / "g.vcf"), [("chrS", 100, "A", "C"), ("chrS", 200, "N", "T")]
    )
    fasta = FastaFile(dataset["fasta"])
    n = add_back_missing(out, gvcf, fasta)
    assert n == 1
    lines = [l for l in open(out) if not l.startswith("#")]
    assert len(lines) == 2
    added = [l for l in lines if l.split("\t")[1] == "200"][0]
    assert "0/0" in added and "RefCall" in added
    # ref base comes from the FASTA, not the placeholder N
    assert added.split("\t")[3] == fasta.fetch("chrS", 199, 200)
