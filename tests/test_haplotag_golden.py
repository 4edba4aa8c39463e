"""Haplotag-consumption golden vs whatshap's published algorithm
(round-5 verdict item 7).

The reference pipeline haplotags reads with `longphase haplotag` /
`whatshap haplotag` (/root/reference/run_clairs_to:1414-1438); this
framework instead feeds phase orientations (internal or external) into a
majority-vote assigner (phasing/phaser.py::haplotag_reads).  Neither
external binary exists in this image, so this suite pins the assigner
against an INDEPENDENT transcription of whatshap haplotag's documented
decision rule — "a read is tagged with the haplotype it shares more
alleles with; ties stay untagged" (WhatsHap docs, `whatshap haplotag`;
Martin et al. 2016) — on fixtures with ambiguous, conflicting, and
partially-covering reads, plus a BAM-backed end-to-end case.

Known scope limit (documented, deliberate): the assigner assumes ONE
phase set per contig chunk, which holds for the pipeline's per-chunk
phasing (the internal phaser emits a single connected orientation per
chunk; run_external_phase consumes only '|'-phased rows).  whatshap's
multi-PS tie-breaking (assign by the phase set covering most of the
read's variants) therefore has no analog here.
"""

import numpy as np
import pytest

from clairs_to_tpu.phasing.phaser import haplotag_reads


def whatshap_haplotag_oracle(n_reads, orientations, site_alleles):
    """Direct transcription of the documented whatshap haplotag rule.

    For read r: m1 = #variants where r's allele equals haplotype-1's
    allele, m2 = likewise for haplotype 2.  Tag 1 if m1 > m2, 2 if
    m2 > m1, untagged (0) otherwise.  orientation o at a site means:
    haplotype 1 carries allele o (0=ref, 1=alt); haplotype 2 carries
    1-o."""
    m1 = np.zeros(n_reads, np.int64)
    m2 = np.zeros(n_reads, np.int64)
    for o, alleles in zip(orientations, site_alleles):
        for rid, al in alleles.items():
            if al == o:
                m1[rid] += 1
            elif al == 1 - o:
                m2[rid] += 1
    hp = np.zeros(n_reads, np.int8)
    hp[m1 > m2] = 1
    hp[m2 > m1] = 2
    return hp


def _agree(n_reads, orientations, site_alleles):
    ours = haplotag_reads(n_reads, orientations, site_alleles)
    ws = whatshap_haplotag_oracle(n_reads, orientations, site_alleles)
    np.testing.assert_array_equal(ours, ws)
    return ours


def test_clean_separation():
    # reads 0,1 carry alt at both sites; reads 2,3 ref; orientation:
    # alt on hap1 at site A, ref on hap1 at site B (anti-correlated sites)
    orientations = [1, 0]
    site_alleles = [
        {0: 1, 1: 1, 2: 0, 3: 0},
        {0: 0, 1: 0, 2: 1, 3: 1},
    ]
    hp = _agree(4, orientations, site_alleles)
    assert hp.tolist() == [1, 1, 2, 2]


def test_ambiguous_read_stays_untagged():
    # read 0 agrees with hap1 at one site and hap2 at the other -> tie
    orientations = [1, 1]
    site_alleles = [{0: 1}, {0: 0}]
    hp = _agree(1, orientations, site_alleles)
    assert hp.tolist() == [0]


def test_read_with_no_phased_sites_untagged():
    orientations = [1]
    site_alleles = [{0: 1}]
    hp = _agree(3, orientations, site_alleles)
    assert hp[1] == 0 and hp[2] == 0


def test_majority_wins_over_single_conflict():
    # read 0: 3 sites say hap1, 1 says hap2
    orientations = [1, 1, 1, 1]
    site_alleles = [{0: 1}, {0: 1}, {0: 1}, {0: 0}]
    hp = _agree(1, orientations, site_alleles)
    assert hp.tolist() == [1]


def test_partial_overlap_mixed_population():
    rng = np.random.default_rng(7)
    n_reads, n_sites = 200, 12
    orientations = rng.integers(0, 2, n_sites).tolist()
    true_hap = rng.integers(1, 3, n_reads)
    site_alleles = []
    for s in range(n_sites):
        alleles = {}
        for r in range(n_reads):
            if rng.random() < 0.5:   # read covers site with p=0.5
                continue
            o = orientations[s]
            want = o if true_hap[r] == 1 else 1 - o
            # 5% allele-detection errors
            alleles[r] = want if rng.random() > 0.05 else 1 - want
        site_alleles.append(alleles)
    hp = _agree(n_reads, orientations, site_alleles)
    tagged = hp > 0
    # the vast majority of covered reads must be tagged AND correct
    correct = (hp[tagged] == true_hap[tagged]).mean()
    assert tagged.mean() > 0.9
    assert correct > 0.97


def test_bam_backed_agreement():
    """End-to-end: simulate a phased tumor BAM, extract real per-read
    alleles, and require assigner == whatshap-rule on actual data."""
    from clairs_to_tpu import config as cfg
    from clairs_to_tpu.bamio import simulate
    from clairs_to_tpu.bamio.bam import BamFile
    from clairs_to_tpu.bamio.pileup import PileupEngine
    from clairs_to_tpu.phasing.phaser import (
        _site_read_alleles, phase_het_snps, select_hetero_snps)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ds = simulate.make_dataset(
            td, seed=33, genome_len=20_000, coverage=30, n_snv=4,
            n_germline=50, somatic_hap_aware=True)
        pe = PileupEngine(ds["genome"], 0, platform="ont")
        for read in BamFile(ds["bam"]).fetch(
                "chrS", 0, 20_000, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG):
            pe.add_read(read)
        a = pe._finalize()
        n_reads = int(a["read_id"].max()) + 1
        # germline het sites from the simulator's variant plan
        het_sites = [(v.pos, v.ref, v.alt)
                     for v in ds["variants"] if v.germline]
        if len(het_sites) < 4:
            pytest.skip("not enough het sites in sim")
        orientations, site_alleles = phase_het_snps(pe, het_sites)
        ours = haplotag_reads(n_reads, orientations, site_alleles)
        ws = whatshap_haplotag_oracle(n_reads, orientations, site_alleles)
        np.testing.assert_array_equal(ours, ws)
        assert (ours > 0).mean() > 0.4   # most site-covering reads tagged
