"""External phaser integration (--use_longphase/--use_whatshap flags).

No longphase/whatshap ships in this image, so a STUB phaser binary (a
python script implementing `longphase phase -s ... -o prefix` by emitting
a phased VCF with a deterministic orientation pattern) exercises the whole
subprocess path: binary resolution, invocation, phased-VCF parsing,
orientation-driven haplotagging, the CLI flag wiring with graceful
fallback, and the comparison tool.
"""

import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import native, simulate
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.genome.fasta import FastaFile
from clairs_to_tpu.phasing import external as extph

STUB = r'''#!/usr/bin/env python
import sys

# stub longphase: `phase -s in.vcf -b bam -r ref -t N -o prefix --ont`
# phases every row, alternating GT orientation per KB bucket (a switch-
# dense adversarial pattern for the comparison tool)
args = sys.argv[1:]
assert args[0] == "phase"
opts = dict(zip(args[1::2], args[2::2]))
inp, out = opts["-s"], opts["-o"]
with open(inp) as f, open(out + ".vcf", "w") as g:
    for line in f:
        if line.startswith("#"):
            g.write(line)
            continue
        cols = line.rstrip("\n").split("\t")
        orient = (int(cols[1]) // 1000) % 2
        cols[8], cols[9] = "GT:PS", ("0|1" if orient == 0 else "1|0") + ":1"
        g.write("\t".join(cols) + "\n")
'''


@pytest.fixture()
def stub_longphase(tmp_path):
    path = tmp_path / "longphase"
    path.write_text(STUB)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("extph"))
    return simulate.make_dataset(
        d, seed=5, genome_len=50_000, coverage=35, read_length=600,
        n_snv=6, n_indel=0, n_germline=80, error_rate=0.01,
        af_choices=(0.2, 0.4), somatic_hap_aware=True)


def test_run_external_phase_and_tag(ds, stub_longphase, tmp_path):
    fa = FastaFile(ds["fasta"])
    ctg = ds["ctg"]
    L = fa.contig_length(ctg)
    ref_seq = fa.fetch(ctg, 0, L)
    table = native.load_entry_table(
        ds["bam"], ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe = PileupEngine.from_entry_table(table, ref_seq, 0, platform="ont")
    het = [(v.pos, v.ref, v.alt) for v in ds["variants"] if v.germline]

    het_vcf = extph.write_het_vcf(str(tmp_path / "het.vcf"), ctg, het)
    phased = extph.run_external_phase(
        "longphase", stub_longphase, het_vcf, ds["bam"], ds["fasta"],
        str(tmp_path / "phased"), ctg)
    assert phased is not None and os.path.exists(phased)
    orients = extph.load_phase_orientations(phased, het)
    assert len(orients) == len(het)
    hp = extph.phase_and_tag_with_orientations(pe, het, orients)
    assert (hp > 0).sum() > 0
    # entry table hp updated
    a = pe._finalize()
    assert (a["hp"] > 0).any()


def test_missing_binary_graceful():
    assert extph.resolve_binary("/definitely/not/here", "longphase") is None
    assert extph.run_external_phase(
        "longphase", None, "x.vcf", "y.bam", "r.fa", "p", "chr1") is None


def test_compare_haplotags_swap_invariance():
    a = np.array([1, 1, 2, 2, 0, 1], np.int8)
    b = np.array([2, 2, 1, 1, 1, 0], np.int8)  # perfect under swap
    st = extph.compare_haplotags(a, b)
    assert st["agreement"] == 1.0
    assert st["n_both_tagged"] == 4


def test_comparison_tool(ds, stub_longphase):
    r = subprocess.run(
        [sys.executable, "tools/compare_phasers.py",
         "--bam", ds["bam"], "--ref", ds["fasta"], "--ctg", ds["ctg"],
         "--het_vcf", os.path.join(os.path.dirname(ds["bam"]), "truth.vcf"),
         "--binary", stub_longphase],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    # truth.vcf includes somatic rows too; the tool only needs SNV rows
    assert r.returncode == 0, r.stdout + r.stderr
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["n_both_tagged"] > 0
    assert 0.0 <= stats["agreement"] <= 1.0


def test_cli_flag_with_stub(ds, stub_longphase, tmp_path):
    """--use_longphase_for_intermediate_phasing with a stub binary drives
    the external path end-to-end through the production CLI."""
    out = str(tmp_path / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "clairs_to_tpu", "run",
         "-T", ds["bam"], "-R", ds["fasta"], "-o", out, "-p", "ont",
         "-t", "1", "--disable_verdict", "--disable_indel_calling", "true",
         "--use_longphase_for_intermediate_phasing", "true",
         "--longphase", stub_longphase],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    ph_dir = os.path.join(out, "tmp", "phasing_output")
    assert os.path.isdir(ph_dir) and any(
        f.startswith("tumor_phased_") for f in os.listdir(ph_dir))
    assert os.path.exists(os.path.join(out, "snv.vcf"))


def test_cli_flag_missing_binary_falls_back(ds, tmp_path):
    out = str(tmp_path / "out_fb")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PATH="/usr/bin:/bin")
    r = subprocess.run(
        [sys.executable, "-m", "clairs_to_tpu", "run",
         "-T", ds["bam"], "-R", ds["fasta"], "-o", out, "-p", "ont",
         "-t", "1", "--disable_verdict", "--disable_indel_calling", "true",
         "--use_longphase_for_intermediate_phasing", "true",
         "--longphase", "/nonexistent/longphase"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "falling back to the internal phaser" in r.stdout
    assert os.path.exists(os.path.join(out, "snv.vcf"))
