"""C++ fast paths for alt_info strings and the candidate exact gate vs the
Python folds (which remain the behavioral reference, golden-tested against
the executed reference decoders in test_reference_decoder_oracle.py)."""

import os

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import native, simulate
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.genome.fasta import FastaFile

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.fixture(scope="module", params=["ont", "ilmn"])
def ds(tmp_path_factory, request):
    plat = request.param
    d = str(tmp_path_factory.mktemp(f"altinfo_{plat}"))
    simulate.make_dataset(
        d, seed=67 if plat == "ont" else 71, genome_len=60_000, coverage=40,
        read_length=700 if plat == "ont" else 150,
        n_snv=25, n_indel=12, n_germline=80, error_rate=0.012,
        af_choices=(0.08, 0.2, 0.45), lowbq_rate=0.08,
        somatic_hap_aware=True)
    return d, plat


def _engine(d, plat):
    bam = os.path.join(d, "tumor.bam")
    fa = FastaFile(os.path.join(d, "ref.fa"))
    ctg = list(fa.index.keys())[0]
    L = fa.contig_length(ctg)
    ref_seq = fa.fetch(ctg, 0, L)
    table = native.load_entry_table(
        bam, ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe = PileupEngine.from_entry_table(table, ref_seq, 0, platform=plat)
    return pe, L, cfg.MIN_BQ_DICT.get(cfg.platform_family(plat), 0)


def test_alt_info_native_matches_python(ds):
    d, plat = ds
    pe, L, aff_bq = _engine(d, plat)
    snv, ind, _ = pe.find_candidates(0, L, min_bq=aff_bq,
                                     select_indel_candidates=True)
    want = sorted(set(snv + ind))
    assert len(want) > 30
    a = pe._finalize()
    pe._ensure_iseq_arrays()
    got = native.alt_info(a, pe._iseq_off, pe._iseq_blob, want,
                          aff_bq, cfg.LOW_MQ_THRESHOLD,
                          pe.max_indel_length, pe.ref_seq, pe.ref_start)
    assert got is not None
    # reference: the Python fold over _alt_groups (bypass the native
    # fast path inside alt_info_at by folding here)
    groups = pe._alt_groups(want, aff_bq, cfg.LOW_MQ_THRESHOLD)
    from collections import defaultdict

    for p in want:
        depth = 0
        alt_dict = {}
        ref_count = 0
        rb = pe._ref_base(p)
        for key, count in groups.get(p, []):
            if len(key) == 1:
                if key.upper() in "ACGT":
                    depth += count
                    if key.upper() != rb:
                        alt_dict["X" + key.upper()] = (
                            alt_dict.get("X" + key.upper(), 0) + count)
                    else:
                        ref_count += count
                elif key in "#*":
                    depth += count
            elif key[1] == "+":
                if len(key[2:]) > pe.max_indel_length:
                    continue
                depth += count
                k = "I" + key[0].upper() + key[2:].upper()
                alt_dict[k] = alt_dict.get(k, 0) + count
            elif key[1] == "-":
                if len(key[1:]) > pe.max_indel_length:
                    continue
                depth += count
                dl = len(key[2:])
                info = "".join(pe._ref_base(p + t) for t in range(0, dl + 1))
                alt_dict["D" + info] = alt_dict.get("D" + info, 0) + count
        if ref_count > 0:
            alt_dict["R" + rb] = ref_count
        expect = (str(depth) + "-"
                  + " ".join(f"{k} {v}" for k, v in alt_dict.items()) + "-")
        assert got[p] == (expect, depth), p


def test_alt_info_at_uses_native_and_matches(ds):
    """alt_info_at end-to-end equals the pure-Python fold (groups path)."""
    d, plat = ds
    pe, L, aff_bq = _engine(d, plat)
    snv, ind, _ = pe.find_candidates(0, L, min_bq=aff_bq,
                                     select_indel_candidates=True)
    want = sorted(set(snv + ind))
    fast = pe.alt_info_at(want, min_bq=aff_bq)
    # disable the native fast path to force the Python fold
    import clairs_to_tpu.bamio.native as nat

    real = nat.alt_info
    nat.alt_info = lambda *a, **k: None
    try:
        slow = pe.alt_info_at(want, min_bq=aff_bq)
    finally:
        nat.alt_info = real
    assert fast == slow


@pytest.mark.parametrize("select_indel", [False, True])
def test_candidate_gate_matches_python(ds, select_indel):
    d, plat = ds
    pe, L, aff_bq = _engine(d, plat)
    ref_py = pe.find_candidates(0, L, min_bq=aff_bq,
                                select_indel_candidates=select_indel)
    fast = pe.find_candidates(0, L, min_bq=aff_bq,
                              select_indel_candidates=select_indel,
                              with_infos=False)
    assert fast[0] == ref_py[0]
    assert fast[1] == ref_py[1]
    assert fast[2] == {}
    assert len(ref_py[0]) > 20


def test_candidate_gate_fused_window(ds):
    """Gate parity on the fused-window engine (production decode path)."""
    d, plat = ds
    bam = os.path.join(d, "tumor.bam")
    fa = FastaFile(os.path.join(d, "ref.fa"))
    ctg = list(fa.index.keys())[0]
    L = fa.contig_length(ctg)
    ref_seq = fa.fetch(ctg, 0, L)
    fam = cfg.platform_family(plat)
    aff_bq = cfg.MIN_BQ_DICT.get(fam, 0)
    sr = native.BamStreamReader(bam)
    win = sr.load_window_reduced(
        ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
        aff_min_bq=aff_bq, low_mq_thresh=cfg.LOW_MQ_THRESHOLD,
        low_bq_thresh=cfg.LOW_BQ_THRESHOLD.get(fam, 10),
        max_indel_length=cfg.MAX_INDEL_LENGTH)
    assert win is not None
    pe = PileupEngine.from_native_window(win, ref_seq, 0, platform=plat)
    ref_py = pe.find_candidates(0, L, min_bq=aff_bq,
                                select_indel_candidates=True)
    fast = pe.find_candidates(0, L, min_bq=aff_bq,
                              select_indel_candidates=True,
                              with_infos=False)
    assert fast[0] == ref_py[0] and fast[1] == ref_py[1]
