"""Internal phaser: recover simulated haplotypes from reads."""

import numpy as np
import pytest

from clairs_to_tpu.bamio import bam_writer
from clairs_to_tpu.bamio.bam import BamFile
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.phasing.phaser import (
    phase_and_tag,
    phase_het_snps,
    select_hetero_snps,
)
from clairs_to_tpu.vcf.reader import VcfRecord


def test_select_hetero_snps():
    recs = [
        VcfRecord("c", 10, "A", "C", 0, 1, qual="30"),
        VcfRecord("c", 20, "A", "C", 1, 1, qual="40"),   # hom -> excluded
        VcfRecord("c", 30, "A", "CT", 0, 1, qual="40"),  # indel -> excluded
        VcfRecord("c", 40, "A", "G", 0, 1, qual="5"),    # lowest 30% dropped
        VcfRecord("c", 50, "A", "T", 0, 1, qual="50"),
        VcfRecord("c", 60, "G", "T", 0, 1, qual="45"),
    ]
    sites = select_hetero_snps(recs, var_pct_full=0.3)
    assert (40, "A", "G") not in sites
    assert (10, "A", "C") in sites and (50, "A", "T") in sites


def _simulated_haplotype_reads(tmp_path, n_reads=40, seed=0):
    """Two haplotypes differing at het sites; reads drawn from one haplotype."""
    rng = np.random.default_rng(seed)
    ref = "".join(rng.choice(list("ACGT"), size=2000))
    het_sites = []
    hap1 = list(ref)
    for p in range(100, 1900, 150):
        alt = "ACGT"[("ACGT".index(ref[p]) + 1) % 4]
        het_sites.append((p, ref[p], alt))
        hap1[p] = alt  # hap1 carries the alt allele at every site
    hap1 = "".join(hap1)
    recs = []
    truth_hap = []
    for i in range(n_reads):
        start = int(rng.integers(0, 1400))
        length = 600
        h = int(rng.integers(0, 2))
        truth_hap.append(h)
        src = hap1 if h == 0 else ref
        seq = src[start : start + length]
        recs.append(
            bam_writer.encode_record(f"r{i}", 0, 0, start, 60, [("M", length)], seq, [30] * length)
        )
    recs_sorted = sorted(zip([r for r in recs], truth_hap), key=lambda x: 0)
    path = str(tmp_path / "p.bam")
    bam_writer.write_bam(path, ["c"], [2000], [r for r, _h in recs_sorted])
    eng = PileupEngine(ref, 0, platform="ont")
    order_truth = []
    for read, (rec, h) in zip(BamFile(path), recs_sorted):
        eng.add_read(read)
        order_truth.append(h)
    return eng, het_sites, np.array(order_truth)


def test_phasing_recovers_haplotypes(tmp_path):
    eng, het_sites, truth = _simulated_haplotype_reads(tmp_path)
    hp = phase_and_tag(eng, het_sites)
    assert len(hp) == len(truth)
    tagged = hp != 0
    assert tagged.mean() > 0.9  # nearly all reads span a het site
    # consistency up to global hap swap
    agree = (hp[tagged] == (truth[tagged] + 1)).mean()
    acc = max(agree, 1 - agree)
    assert acc > 0.95, acc


def test_phasing_updates_entry_table_hp(tmp_path):
    eng, het_sites, truth = _simulated_haplotype_reads(tmp_path, seed=2)
    assert (eng._finalize()["hp"] == 0).all()
    phase_and_tag(eng, het_sites)
    a = eng._finalize()
    assert (a["hp"] != 0).any()
    # HP channels now populate in the tensor view
    counts, _ = eng.channel_counts(0, 0, 2000, with_phasing=True)
    assert counts[:, 34:].sum() > 0
