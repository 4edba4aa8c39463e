"""Verdict chain: allele counts, LogR/BAF, genotyping, ASPCF, ASCAT, tagging."""

import numpy as np
import pytest

from clairs_to_tpu.verdict import aspcf, ascat, logr_baf, tagging
from clairs_to_tpu.verdict.allele_counter import allele_counts_at
from clairs_to_tpu.bamio import bam_writer
from clairs_to_tpu.bamio.bam import BamFile
from clairs_to_tpu.bamio.pileup import PileupEngine


def test_allele_counts(tmp_path):
    ref = "ACGT" * 50
    recs = []
    for i in range(10):
        seq = ref[:100]
        if i < 4:
            seq = seq[:50] + "T" + seq[51:]  # alt T at pos 50 (ref G? ref[50]='G')
        recs.append(bam_writer.encode_record(f"r{i}", 0, 0, 0, 60, [("M", 100)], seq, [30] * 100))
    path = str(tmp_path / "t.bam")
    bam_writer.write_bam(path, ["c"], [200], recs)
    eng = PileupEngine(ref, 0)
    for r in BamFile(path):
        eng.add_read(r)
    counts = allele_counts_at(eng, [50, 51])
    assert counts[0].tolist() == [0, 0, 6, 4]  # 6 ref G + 4 alt T
    assert counts[0].sum() == 10


def test_logr_baf_basic():
    rng = np.random.default_rng(0)
    ref = np.array([30, 40, 0, 25])
    alt = np.array([30, 0, 0, 26])
    lr, baf, keep = logr_baf.logr_baf(ref, alt, rng=rng)
    assert keep.tolist() == [True, True, False, True]
    assert len(lr) == 3
    # het locus BAF ~ 0.5; hom locus BAF in {0, 1}
    assert baf[0] == pytest.approx(0.5)
    assert baf[1] in (0.0, 1.0)
    # LogR sums to ~0 (log of ratios around mean)
    assert abs(np.mean(2.0 ** lr) - 1.0) < 0.1


def test_germline_genotypes_split():
    # ASCAT's genotyper assumes a population-panel prior (~65% of loci are
    # homozygous in any individual, predict_germline_genotypes.py defaults);
    # use a realistic 70/30 hom/het mix.
    rng = np.random.default_rng(1)
    n_het, n_hom = 120, 280
    het_baf = np.clip(rng.normal(0.5, 0.04, n_het), 0, 1)
    hom_baf = np.where(rng.random(n_hom) < 0.5, 0.002, 0.998)
    baf = np.concatenate([het_baf, hom_baf])
    chrom = np.zeros(n_het + n_hom, dtype=int)
    hom = logr_baf.predict_germline_genotypes(baf, chrom)
    assert hom[:n_het].mean() < 0.25     # hets mostly classified het
    assert hom[n_het:].mean() > 0.9      # homs classified hom


def test_exact_pcf_finds_step():
    y = np.concatenate([np.zeros(50), np.ones(50)]) + 0.01 * np.random.default_rng(0).normal(size=100)
    yhat = aspcf.exact_pcf(y, kmin=5, gamma=1.0)
    assert abs(yhat[:50].mean() - 0.0) < 0.05
    assert abs(yhat[50:].mean() - 1.0) < 0.05
    # crisp breakpoint
    assert np.sum(np.abs(np.diff(yhat)) > 0.5) == 1


def test_fast_aspcf_segments_dual_signal():
    rng = np.random.default_rng(2)
    n = 300
    logr = np.concatenate([np.zeros(150), np.full(150, 0.58)]) + 0.05 * rng.normal(size=n)
    baf = np.concatenate([np.full(150, 0.5), np.full(150, 0.33)]) + 0.02 * rng.normal(size=n)
    yhat1, yhat2 = aspcf.fast_aspcf(logr, baf, kmin=6, gamma=50)
    assert abs(yhat1[:140].mean() - 0.0) < 0.1
    assert abs(yhat1[160:].mean() - 0.58) < 0.1
    assert abs(yhat2[160:].mean() - (0.5 + abs(0.33 - 0.5))) < 0.05


def test_make_segments():
    r = np.array([0.0, 0.0, 0.5, 0.5, 0.5])
    b = np.array([0.5, 0.5, 0.7, 0.7, 0.7])
    s = ascat.make_segments(r, b)
    assert s.shape == (2, 3)
    assert s[0].tolist() == [0.0, 0.5, 2]
    assert s[1].tolist() == [0.5, 0.7, 3]


def test_ascat_recovers_diploid_with_deletion():
    """Synthetic: 60% purity tumor, one-copy deletion over half the genome."""
    rng = np.random.default_rng(3)
    n = 600
    purity = 0.5
    # segment A: normal 1+1; segment B: deletion 1+0
    n_major = np.concatenate([np.ones(n // 2), np.ones(n // 2)])
    n_minor = np.concatenate([np.ones(n // 2), np.zeros(n // 2)])
    tot = purity * (n_major + n_minor) + (1 - purity) * 2
    baf_true = (purity * n_minor + (1 - purity)) / tot
    ploidy_t = np.sum(tot) / n
    logr = np.log2(tot / ploidy_t)
    # simulated segmentation outputs (piecewise constant already)
    het_mask = np.ones(n, dtype=bool)
    baf_obs = np.where(rng.random(n) < 0.5, baf_true, 1 - baf_true)
    res = ascat.run_ascat(logr, baf_true, het_mask, baf_obs, gamma=1.0)
    assert res is not None
    assert res.purity == pytest.approx(purity, abs=0.1)
    assert res.ploidy == pytest.approx(2.0 - purity / 2, abs=0.4)
    # deletion segment should be 1+0
    cn = {(int(a), int(b)) for (_s, _e, a, b) in res.segments}
    assert (1, 0) in cn or (1, 1) in cn


def test_tagging_decision_tree():
    # germline-like: AF ~0.5 at purity 0.4 in 1+1 region -> germline
    status, tag = tagging.classify_call(0.5, 60, 0.4, 1, 1)
    assert tag == "Verdict_Germline" or status.startswith(("germline", "probable germline"))
    # somatic-like: AF ~0.2 at purity 0.4 in 1+1 region (expected somatic
    # AF = .4*1/2 = 0.2; germline AF = (0.4+0.6)/2 = 0.5)
    status, tag = tagging.classify_call(0.2, 60, 0.4, 1, 1)
    assert tag == "Verdict_Somatic" or status in ("somatic", "probable somatic")
    # very low AF subclonal
    status, tag = tagging.classify_call(0.03, 100, 0.4, 1, 1)
    assert tag == "Verdict_SubclonalSomatic"
    # AF ~1.0 -> germline
    status, tag = tagging.classify_call(0.98, 60, 0.4, 1, 1)
    assert tag == "Verdict_Germline"


def test_tag_vcf_rows_purity_gate():
    rows = [dict(CHROM="chr1", POS=100, AF=0.5, DP=60, FILTER="PASS", INFO=".")]
    segs = [("chr1", 1, 1000, 1, 1)]
    assert tagging.tag_vcf_rows(rows, purity=0.8, segments=segs) == 0
    n = tagging.tag_vcf_rows(rows, purity=0.4, segments=segs)
    if n:
        assert "Verdict" in rows[0]["INFO"]


def test_write_cna_outputs_layout(tmp_path):
    """Reference cna_output/ layout: SAMPLE_Tumor_{LogR,BAF,GG,LogR_PCFed,
    Purity_Ploidy,CNA}.txt (src/cna_germline_tagging.py output files)."""
    import numpy as np
    from clairs_to_tpu.verdict.pipeline import write_cna_outputs, VerdictResult

    n = 6
    res = VerdictResult(
        purity=0.42, ploidy=2.1,
        segments=[("chr1", 100, 5000, 1, 1)], n_tagged=0, applied=True,
    )
    out = str(tmp_path / "cna_output")
    write_cna_outputs(
        out, "S1", ["chr1"], np.zeros(n, int), np.arange(n) * 100,
        np.linspace(-0.2, 0.2, n), np.linspace(0.3, 0.7, n),
        np.array([True, False] * 3), np.zeros(n), res,
    )
    for name in ("Tumor_LogR", "Tumor_BAF", "Tumor_GG", "Tumor_LogR_PCFed"):
        path = tmp_path / "cna_output" / f"S1_{name}.txt"
        lines = path.read_text().splitlines()
        assert lines[0] == "Chromosome\tPosition\tS1"
        assert len(lines) == 1 + n
        assert lines[1].startswith("chr1\t1\t")
    pp = (tmp_path / "cna_output" / "S1_Tumor_Purity_Ploidy.txt").read_text()
    assert pp.splitlines()[1] == "0.42\t2.1"
    cna = (tmp_path / "cna_output" / "S1_Tumor_CNA.txt").read_text().splitlines()
    assert cna[0] == "\tchr\tstartpos\tendpos\tnMajor\tnMinor"
    assert cna[1] == "1\tchr1\t100\t5000\t1\t1"
