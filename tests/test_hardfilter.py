"""Hard-filter verdicts on crafted pileups."""

import numpy as np
import pytest

from clairs_to_tpu.bamio import bam_writer
from clairs_to_tpu.bamio.bam import BamFile
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.postcall.hardfilter import (
    HardFilterEngine,
    apply_hard_filters,
    fisher_exact,
    calculate_sequence_entropy,
)
from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine, apply_haplotype_filters

REF = ("ACGT" * 200)[:600]  # 600bp, pos 300 is ref 'A'
POS = 300
assert REF[POS] == "A"


def mk_read(name, pos, seq, flag=0, mapq=60, qual=35, hp=None, cigar=None):
    tags = b""
    if hp is not None:
        tags = bam_writer.encode_tag_int("HP", hp)
    cigar = cigar or [("M", len(seq))]
    return bam_writer.encode_record(name, flag, 0, pos, mapq, cigar, seq,
                                    [qual] * len(seq), tags=tags)


def build_engine(tmp_path, records, platform="ont"):
    path = str(tmp_path / "hf.bam")
    bam_writer.write_bam(path, ["chrT"], [len(REF)], records)
    eng = PileupEngine(REF, 0, platform=platform)
    for read in BamFile(path):
        eng.add_read(read)
    return eng


def reads_with_alt(n_alt, n_ref, start=100, length=400, alt_pos=POS, alt="C",
                   alt_flag_fn=None, ref_flag_fn=None, name_prefix="r", **kw):
    """n_alt reads carrying alt at alt_pos + n_ref reference reads."""
    recs = []
    for i in range(n_alt):
        seq = REF[start : start + length]
        off = alt_pos - start
        seq = seq[:off] + alt + seq[off + 1 :]
        flag = alt_flag_fn(i) if alt_flag_fn else (16 if i % 2 else 0)
        recs.append(mk_read(f"{name_prefix}a{i}", start, seq, flag=flag, **kw))
    for i in range(n_ref):
        flag = ref_flag_fn(i) if ref_flag_fn else (16 if i % 2 else 0)
        recs.append(mk_read(f"{name_prefix}r{i}", start, REF[start : start + length], flag=flag, **kw))
    return recs


def test_balanced_site_passes(tmp_path):
    eng = build_engine(tmp_path, reads_with_alt(8, 12))
    hf = HardFilterEngine(eng)
    v = hf.verdict(POS, "A", "C")
    assert v.pass_all, vars(v)


def test_strand_bias_fails(tmp_path):
    # all 18 alt reads forward, 36 ref reads balanced (Fisher p ~ 1e-4)
    recs = reads_with_alt(18, 36, alt_flag_fn=lambda i: 0)
    eng = build_engine(tmp_path, recs)
    hf = HardFilterEngine(eng)
    v = hf.verdict(POS, "A", "C")
    assert not v.pass_strand_bias
    assert v.strand_bias_p < 0.001


def test_read_start_end_fails(tmp_path):
    # alt reads all START at pos-2 (boundary near variant); deep ref coverage
    recs = []
    for i in range(8):
        seq = "C" + REF[POS + 1 : POS + 200]
        recs.append(mk_read(f"a{i}", POS, seq, flag=16 if i % 2 else 0))
    for i in range(12):
        recs.append(mk_read(f"r{i}", 100, REF[100:500], flag=16 if i % 2 else 0))
    eng = build_engine(tmp_path, recs)
    hf = HardFilterEngine(eng)
    v = hf.verdict(POS, "A", "C")
    assert not v.pass_read_start_end


def test_variant_cluster_fails(tmp_path):
    # alt reads share 3 extra non-ref bases nearby at intermediate ratios
    recs = []
    extra = [POS - 40, POS - 20, POS + 24]
    for i in range(10):
        seq = list(REF[100:500])
        seq[POS - 100] = "C"
        if i < 6:  # only some alt reads carry the co-variants
            for e in extra:
                seq[e - 100] = "T" if REF[e] != "T" else "G"
        recs.append(mk_read(f"a{i}", 100, "".join(seq), flag=16 if i % 2 else 0))
    for i in range(10):
        recs.append(mk_read(f"r{i}", 100, REF[100:500], flag=16 if i % 2 else 0))
    eng = build_engine(tmp_path, recs)
    hf = HardFilterEngine(eng)
    v = hf.verdict(POS, "A", "C")
    assert not v.pass_co_exist


def test_entropy_only_for_indels(tmp_path):
    low_ref = "A" * 600
    recs = [mk_read(f"r{i}", 100, low_ref[100:500]) for i in range(10)]
    path = str(tmp_path / "ent.bam")
    bam_writer.write_bam(path, ["chrT"], [600], recs)
    eng = PileupEngine(low_ref, 0, platform="ont")
    for read in BamFile(path):
        eng.add_read(read)
    hf = HardFilterEngine(eng)
    v_snp = hf.verdict(POS, "A", "C")
    assert v_snp.pass_sequence_entropy  # SNVs skip entropy
    v_ins = hf.verdict(POS, "A", "AT")
    assert not v_ins.pass_sequence_entropy  # homopolymer -> low entropy


def test_apply_hard_filters_tags():
    from clairs_to_tpu.postcall.hardfilter import FilterVerdict

    v = FilterVerdict()
    v.pass_strand_bias = False
    v.strand_bias_p = 0.0001
    rows = [dict(CHROM="chrT", POS=301, FILTER="PASS", QUAL=20.0, INFO="FAU=1")]
    n = apply_hard_filters(rows, {("chrT", 301): v})
    assert n == 1
    assert rows[0]["FILTER"] == "LowQual;StrandBias"
    assert rows[0]["QUAL"] == 0.0
    assert "SB=0.0001" in rows[0]["INFO"]


def test_fisher_exact_symmetry():
    assert fisher_exact([[5, 5], [5, 5]]) == 1.0
    p = fisher_exact([[10, 0], [0, 10]])
    assert p < 0.001
    # agreement with scipy on a moderate table
    scipy_stats = pytest.importorskip("scipy.stats")
    table = [[8, 12], [3, 17]]
    want = scipy_stats.fisher_exact(table)[1]
    assert fisher_exact(table) == pytest.approx(want, rel=1e-6)


def test_entropy_values():
    high = calculate_sequence_entropy("ACGTGGCTAACGTTAGCAGCTAGCTAGCATCGA", 33)
    low = calculate_sequence_entropy("A" * 33, 33)
    assert high > 0.9
    assert low < 0.1


# --- haplotype (long-read) filter ------------------------------------------


def test_haplotype_balanced_passes(tmp_path):
    recs = reads_with_alt(8, 12, hp=1)
    eng = build_engine(tmp_path, recs)
    hp = HaplotypeFilterEngine(eng)
    v = hp.verdict(POS, "A", "C", af=0.4)
    assert v.pass_all, vars(v)


def test_haplotype_low_bq_fails(tmp_path):
    recs = reads_with_alt(8, 12, qual=15)
    eng = build_engine(tmp_path, recs, platform="ilmn")  # min_bq 0 keeps bases
    hp = HaplotypeFilterEngine(eng, min_bq=0)
    v = hp.verdict(POS, "A", "C", af=0.4)
    assert not v.pass_bq


def test_haplotype_low_mq_fails(tmp_path):
    recs = reads_with_alt(8, 12, mapq=20)
    eng = build_engine(tmp_path, recs)
    hp = HaplotypeFilterEngine(eng, min_mq=0)
    v = hp.verdict(POS, "A", "C", af=0.4)
    assert not v.pass_mq


def test_haplotype_multihap_low_af(tmp_path):
    # low-AF alt spread evenly across both haplotypes -> MultiHap
    recs = []
    for i in range(8):
        seq = REF[100:500]
        seq = seq[: POS - 100] + "C" + seq[POS - 100 + 1 :]
        recs.append(mk_read(f"a{i}", 100, seq, hp=1 if i % 2 else 2,
                            flag=16 if i % 2 else 0))
    for i in range(90):
        recs.append(mk_read(f"r{i}", 100, REF[100:500], hp=1 if i % 2 else 2,
                            flag=16 if i % 2 else 0))
    eng = build_engine(tmp_path, recs)
    hp = HaplotypeFilterEngine(eng)
    v = hp.verdict(POS, "A", "C", af=8 / 98)
    assert not v.pass_hetero_both_side


def test_haplotype_phaseable_flag(tmp_path):
    # alt only on hap1, both haps present -> phaseable (INFO H)
    recs = []
    for i in range(6):
        seq = REF[100:500]
        seq = seq[: POS - 100] + "C" + seq[POS - 100 + 1 :]
        recs.append(mk_read(f"a{i}", 100, seq, hp=1, flag=16 if i % 2 else 0))
    for i in range(14):
        recs.append(mk_read(f"r{i}", 100, REF[100:500], hp=1 if i % 3 == 0 else 2,
                            flag=16 if i % 2 else 0))
    eng = build_engine(tmp_path, recs)
    hp = HaplotypeFilterEngine(eng)
    v = hp.verdict(POS, "A", "C", af=0.3)
    assert v.phaseable
    rows = [dict(CHROM="chrT", POS=POS + 1, FILTER="PASS", QUAL=20.0, INFO="FAU=1")]
    apply_haplotype_filters(rows, {("chrT", POS + 1): v})
    assert rows[0]["INFO"].startswith("H;")


def test_haplotype_no_ancestry_fails(tmp_path):
    # het germline at POS+30 on hap1; alt reads on hap1 do NOT carry it
    gpos = POS + 30
    recs = []
    for i in range(6):  # alt reads: hap1, alt at POS, ref at gpos
        seq = list(REF[100:500])
        seq[POS - 100] = "C"
        recs.append(mk_read(f"a{i}", 100, "".join(seq), hp=1, flag=16 if i % 2 else 0))
    for i in range(8):  # hap1 germline carriers: alt at gpos only
        seq = list(REF[100:500])
        seq[gpos - 100] = "T"
        recs.append(mk_read(f"g{i}", 100, "".join(seq), hp=1, flag=16 if i % 2 else 0))
    for i in range(8):  # hap2 reads: plain ref
        recs.append(mk_read(f"r{i}", 100, REF[100:500], hp=2, flag=16 if i % 2 else 0))
    eng = build_engine(tmp_path, recs)
    hp = HaplotypeFilterEngine(eng, hetero_germline=[(gpos, "T")])
    v = hp.verdict(POS, "A", "C", af=0.3)
    assert not v.pass_hetero
