"""compare_vcf extras: cal_af support counting, AF-aware FN exclusion,
stratification BEDs."""

import numpy as np
import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.af_distribution import cal_af
from clairs_to_tpu.bench.compare import compare_vcf
from clairs_to_tpu.genome.fasta import FastaFile


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    out = tmp_path_factory.mktemp("cmpx")
    return simulate.make_dataset(
        str(out), seed=13, genome_len=30_000, coverage=50, n_snv=10, n_germline=4
    )


def test_cal_af_counts_match_truth(ds):
    fasta = FastaFile(ds["fasta"])
    somatic = [v for v in ds["variants"] if v.kind == "snv" and not v.germline]
    sites = [("chrS", v.pos + 1, v.ref, v.alt) for v in somatic]
    support = cal_af(ds["bam"], fasta, sites)
    for v in somatic:
        cov, alt_n = support[("chrS", v.pos + 1)]
        assert cov > 30
        af_obs = alt_n / cov
        assert af_obs == pytest.approx(v.af, abs=0.15), (v.pos, v.af, af_obs)


def test_af_aware_fn_exclusion(ds, tmp_path):
    # empty query: normally every truth site is an FN; with min_af=0.5 all
    # sub-0.5 truth sites must be excluded from the FN pool
    empty = str(tmp_path / "empty.vcf")
    with open(empty, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    fasta = FastaFile(ds["fasta"])
    base = compare_vcf(ds["truth_snv"], empty, input_filter_tag="PASS")
    filtered = compare_vcf(
        ds["truth_snv"], empty, input_filter_tag="PASS",
        min_af=0.5, tumor_bam_fn=ds["bam"], fasta=fasta,
    )
    assert base.fn > 0
    assert filtered.fn < base.fn  # simulated somatic AFs are all < 0.5


def test_stratification_bed_restricts_both_sides(ds, tmp_path):
    strat = str(tmp_path / "strat.bed")
    with open(strat, "w") as f:
        f.write("chrS\t0\t15000\n")
    full = compare_vcf(ds["truth_snv"], ds["truth_snv"], input_filter_tag="PASS")
    part = compare_vcf(
        ds["truth_snv"], ds["truth_snv"], input_filter_tag="PASS",
        strat_bed_fns=[strat],
    )
    assert full.tp > part.tp > 0
    assert part.fn == 0 and part.fp == 0  # self-comparison stays perfect
