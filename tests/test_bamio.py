"""BAM IO + pileup engine semantics."""

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import bam_writer, simulate
from clairs_to_tpu.bamio.bam import BamFile, BamRead
from clairs_to_tpu.bamio.pileup import PileupEngine

CH = cfg.CHANNEL_INDEX


def make_read(name, pos, cigar, seq, qual=30, flag=0, mapq=60, tags=None):
    rec = bam_writer.encode_record(
        name, flag, 0, pos, mapq, cigar, seq, [qual] * len(seq)
    )
    return rec


def load_reads(tmp_path, records, ref_len=1000):
    path = str(tmp_path / "t.bam")
    bam_writer.write_bam(path, ["chrT"], [ref_len], records)
    return list(BamFile(path))


def test_bam_roundtrip(tmp_path):
    rec = make_read("r1", 10, [("S", 2), ("M", 5), ("I", 2), ("M", 3), ("D", 2), ("M", 1)], "TTACGTACGTACG")
    reads = load_reads(tmp_path, [rec])
    r = reads[0]
    assert r.name == "r1"
    assert r.pos == 10
    assert r.seq == "TTACGTACGTACG"
    assert list(r.cigar_ops) == [4, 0, 1, 0, 2, 0]
    assert list(r.cigar_lens) == [2, 5, 2, 3, 2, 1]
    assert r.reference_end() == 10 + 5 + 3 + 2 + 1


def test_bam_tags_roundtrip(tmp_path):
    rec = bam_writer.encode_record(
        "r1", 0, 0, 5, 60, [("M", 4)], "ACGT", [30] * 4,
        tags=bam_writer.encode_tag_int("HP", 2) + bam_writer.encode_tag_str("RG", "grp"),
    )
    r = load_reads(tmp_path, [rec])[0]
    assert r.tags["HP"] == 2
    assert r.tags["RG"] == "grp"


REF = "ACGTACGTACGTACGTACGT"  # 20bp reference starting at 0


def engine_with(reads, platform="ont", **kw):
    eng = PileupEngine(REF, 0, platform=platform, **kw)
    for r in reads:
        eng.add_read(r)
    return eng


def test_simple_match_counts(tmp_path):
    # 3 fwd reads and 2 rev reads over full ref, all matching
    recs = [make_read(f"f{i}", 0, [("M", 20)], REF) for i in range(3)]
    recs += [make_read(f"r{i}", 0, [("M", 20)], REF, flag=16) for i in range(2)]
    eng = engine_with(load_reads(tmp_path, recs))
    counts, depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert (depth == 5).all()
    # position 0 ref A: fwd A channel gets 3, rev a gets 2 (pre-negation)
    assert counts[0, CH["A"]] == 3 and counts[0, CH["a"]] == 2
    eng.apply_reference_encoding(counts, 0)
    # ref channel overwritten with -(block sum)
    assert counts[0, CH["A"]] == -3 and counts[0, CH["a"]] == -2


def test_snv_counts_and_candidate(tmp_path):
    # ref pos 5 is 'C'; 4 reads carry G there, 6 carry ref
    recs = [make_read(f"v{i}", 0, [("M", 20)], REF[:5] + "G" + REF[6:]) for i in range(4)]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF) for i in range(6)]
    eng = engine_with(load_reads(tmp_path, recs))
    counts, depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert counts[5, CH["G"]] == 4
    assert counts[5, CH["C"]] == 6
    snvs, indels, infos = eng.find_candidates(0, 20)
    assert snvs == [5]
    info = infos[5]
    assert info.depth == 10
    assert info.alt_list[0] == ("G", 4)
    alt_map = eng.alt_info_at([5], min_bq=0)
    alt_info, depth5 = alt_map[5]
    assert alt_info.startswith("10-")
    assert "XG 4" in alt_info and "RC 6" in alt_info


def test_candidate_gates(tmp_path):
    # 2 alt reads of 10: af 0.2 but support < 3 -> no candidate
    recs = [make_read(f"v{i}", 0, [("M", 20)], REF[:5] + "G" + REF[6:]) for i in range(2)]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF) for i in range(8)]
    eng = engine_with(load_reads(tmp_path, recs))
    snvs, _, _ = eng.find_candidates(0, 20)
    assert snvs == []
    # depth gate: 3 alt of 4 total -> depth 4 not > 4 -> no candidate
    recs = [make_read(f"v{i}", 0, [("M", 20)], REF[:5] + "G" + REF[6:]) for i in range(3)]
    recs += [make_read("n0", 0, [("M", 20)], REF)]
    eng = engine_with(load_reads(tmp_path, recs))
    snvs, _, _ = eng.find_candidates(0, 20)
    assert snvs == []
    # 3 alt of 5: af .6, support 3, depth 5 > 4 -> candidate
    recs = [make_read(f"v{i}", 0, [("M", 20)], REF[:5] + "G" + REF[6:]) for i in range(3)]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF) for i in range(2)]
    eng = engine_with(load_reads(tmp_path, recs))
    snvs, _, _ = eng.find_candidates(0, 20)
    assert snvs == [5]


def test_low_mq_reads_excluded_from_candidates_but_in_lmq_channels(tmp_path):
    recs = [make_read(f"v{i}", 0, [("M", 20)], REF[:5] + "G" + REF[6:], mapq=10) for i in range(5)]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF) for i in range(5)]
    eng = engine_with(load_reads(tmp_path, recs))
    snvs, _, _ = eng.find_candidates(0, 20)
    assert snvs == []  # alt reads all mq<20
    counts, depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert counts[5, CH["GLMQ"]] == 5   # low-mq alt bases -> LMQ channel
    assert counts[5, CH["G"]] == 0
    assert depth[5] == 5  # only mq>=20 entries count toward tensor depth


def test_low_bq_filter_and_lbq_channel(tmp_path):
    # alt bases with bq 15: dropped by AFF view (ont min_bq 20), kept by NEG
    recs = [make_read(f"v{i}", 0, [("M", 20)], REF[:5] + "G" + REF[6:], qual=15) for i in range(4)]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF, qual=35) for i in range(6)]
    eng = engine_with(load_reads(tmp_path, recs))
    aff, aff_depth = eng.channel_counts(min_bq=20, region_start=0, region_end=20)
    neg, neg_depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert aff[5, CH["G"]] == 0 and aff_depth[5] == 6
    assert neg[5, CH["G"]] == 4 and neg_depth[5] == 10
    # LBQ channel counts bq<30 (ont) bases in the NEG view
    assert neg[5, CH["GLBQ"]] == 4


def test_insertion_entry_semantics(tmp_path):
    # 4 reads with 2bp insertion after pos 9; 6 plain reads
    ins_seq = REF[:10] + "TT" + REF[10:]
    recs = [
        make_read(f"v{i}", 0, [("M", 10), ("I", 2), ("M", 10)], ins_seq) for i in range(4)
    ]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF) for i in range(6)]
    eng = engine_with(load_reads(tmp_path, recs))
    counts, depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    # anchor pos 9: insertion entries count only in I channels (tensor view)
    assert counts[9, CH["I"]] == 4
    assert counts[9, CH["I1"]] == 4
    base9 = "ACGT".index(REF[9])
    assert counts[9, base9] == 6  # only the 6 pure reads
    assert depth[9] == 10
    # candidate view counts the anchor base too
    snvs, indels, infos = eng.find_candidates(0, 20, select_indel_candidates=True)
    assert indels == [9]
    alt_info, d = eng.alt_info_at([9], min_bq=0)[9]
    assert f"I{REF[9]}TT 4" in alt_info


def test_deletion_entry_semantics(tmp_path):
    # 4 reads with 2bp deletion of pos 10-11; 6 plain
    del_seq = REF[:10] + REF[12:]
    recs = [
        make_read(f"v{i}", 0, [("M", 10), ("D", 2), ("M", 8)], del_seq) for i in range(4)
    ]
    recs += [make_read(f"n{i}", 0, [("M", 20)], REF) for i in range(6)]
    eng = engine_with(load_reads(tmp_path, recs))
    counts, depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert counts[9, CH["D"]] == 4      # anchor at pos 9
    assert counts[9, CH["D1"]] == 4
    assert counts[10, CH["*"]] == 4     # fwd placeholder at deleted positions
    assert counts[11, CH["*"]] == 4
    assert depth[10] == 10
    alt_info, d = eng.alt_info_at([9], min_bq=0)[9]
    # D key = anchor ref base + deleted ref seq (create_tensor:195-196)
    assert f"D{REF[9]}{REF[10:12]} 4" in alt_info
    snvs, indels, infos = eng.find_candidates(0, 20, select_indel_candidates=True)
    assert indels == [9]


def test_reverse_deletion_placeholder_channel(tmp_path):
    recs = [
        make_read(f"v{i}", 0, [("M", 10), ("D", 2), ("M", 8)], REF[:10] + REF[12:], flag=16)
        for i in range(3)
    ]
    eng = engine_with(load_reads(tmp_path, recs))
    counts, _ = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert counts[10, CH["#"]] == 3
    assert counts[9, CH["d"]] == 3


def test_long_insertion_skipped_entirely(tmp_path):
    ins = "A" * 70
    seq = REF[:10] + ins + REF[10:]
    recs = [make_read("v0", 0, [("M", 10), ("I", 70), ("M", 10)], seq)]
    eng = engine_with(load_reads(tmp_path, recs))
    counts, depth = eng.channel_counts(min_bq=0, region_start=0, region_end=20)
    assert counts[9, CH["I"]] == 0
    assert depth[9] == 0  # entry contributes nothing, not even depth


def test_overlap_adjustment(tmp_path):
    # mates overlap at pos 5-9; same base -> mate2 qual zeroed
    r1 = make_read("p1", 0, [("M", 10)], REF[:10], flag=1 | 64)
    r2 = make_read("p1", 5, [("M", 10)], REF[5:15], flag=1 | 128)
    eng = engine_with(load_reads(tmp_path, [r1, r2]))
    counts, depth = eng.channel_counts(min_bq=20, region_start=0, region_end=20)
    # overlap span 5..9: only one of the two entries survives bq>=20
    assert (depth[5:10] == 1).all()
    assert (depth[0:5] == 1).all()
    assert (depth[10:15] == 1).all()


def test_simulated_dataset_candidates(tmp_path):
    ds = simulate.make_dataset(str(tmp_path), seed=3, genome_len=20_000, coverage=50,
                               n_snv=8, n_germline=4)
    bam = BamFile(ds["bam"])
    eng = PileupEngine(ds["genome"], 0, platform="ont")
    for read in bam.fetch(ds["ctg"], 0, 20_000, excl_flags=2316):
        eng.add_read(read)
    snvs, _, infos = eng.find_candidates(0, 20_000)
    truth = {v.pos for v in ds["variants"] if v.kind == "snv" and not v.germline}
    germline = {v.pos for v in ds["variants"] if v.germline}
    found = set(snvs)
    # all somatic + germline SNVs above AF threshold should be candidates
    missing = truth - found
    assert len(missing) <= 1, f"missed somatic candidates: {missing}"
    assert len(germline - found) == 0
    # false candidates should be rare at 0.2% error
    extra = found - truth - germline
    assert len(extra) <= 3


def test_somatic_hap_aware_cosegregation():
    """somatic_hap_aware=True places each somatic variant on ONE haplotype:
    carrier reads must agree on every co-covered germline het site."""
    import numpy as np

    rng = np.random.default_rng(7)
    genome = simulate.random_genome(rng, 20_000)
    variants = simulate.plan_variants(rng, genome, n_snv=6, n_germline=20,
                                      af_choices=(0.2, 0.3), margin=300,
                                      min_gap=60)
    reads = simulate.simulate_reads(rng, genome, variants, coverage=60,
                                    read_length=800, error_rate=0.0,
                                    somatic_hap_aware=True)
    germ = {v.pos: v for v in variants if v.germline}
    som = [v for v in variants if not v.germline]
    n_checked = 0
    for v in som:
        # base observed at a germline-het position, per carrier read
        het_obs = {}
        n_carriers = 0
        for (_name, _flag, start, cigar, seq, _q) in reads:
            assert len(cigar) == 1 and cigar[0][0] == "M"
            end = start + cigar[0][1]
            if not (start <= v.pos < end) or seq[v.pos - start] != v.alt:
                continue
            n_carriers += 1
            for gp in germ:
                if start <= gp < end:
                    het_obs.setdefault(gp, set()).add(seq[gp - start])
        assert n_carriers > 0, f"somatic at {v.pos} has no carriers"
        for gp, bases in het_obs.items():
            assert len(bases) == 1, (
                f"somatic {v.pos} carriers disagree at germline het {gp}: "
                f"{bases} — variant spans haplotypes")
            n_checked += 1
    assert n_checked >= 3  # the check actually exercised co-covered hets
