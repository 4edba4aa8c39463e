"""Native verdict batch kernel (postcall/verdict_native.cpp) vs the Python
per-site engines — every verdict field, the Fisher p-value (bit-exact), the
strand table, and the phaseable flag must agree on realistic pileups.

The Python engines remain the behavioral reference (they are golden-tested
against the reference modules in test_golden_filters.py); this suite pins
the C++ batch path to them on both index flavors (fused WindowFilterIndex
and classic FilterIndex) and both engine modes (9-verdict haplotype,
4-verdict hard)."""

import os

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import native, simulate
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.genome.fasta import FastaFile
from clairs_to_tpu.postcall import verdict_native as vn

pytestmark = pytest.mark.skipif(
    not (native.available() and vn.available()),
    reason="native libs unavailable")


def _load_engines(d, platform):
    """(fused-window engine, full-table engine, L, aff_bq)."""
    bam = os.path.join(d, "tumor.bam")
    fa = FastaFile(os.path.join(d, "ref.fa"))
    ctg = list(fa.index.keys())[0]
    L = fa.contig_length(ctg)
    ref_seq = fa.fetch(ctg, 0, L)
    fam = cfg.platform_family(platform)
    aff_bq = cfg.MIN_BQ_DICT.get(fam, 0)
    table = native.load_entry_table(
        bam, ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe_tab = PileupEngine.from_entry_table(table, ref_seq, 0,
                                           platform=platform)
    sr = native.BamStreamReader(bam)
    from clairs_to_tpu.postcall.hardfilter import _REF_TOK

    ref_tok = np.full(L + 2 * native.FILT_MARGIN, 10, np.int16)
    ref_u8 = np.frombuffer(ref_seq.upper().encode("latin-1"), np.uint8)
    ref_tok[native.FILT_MARGIN:native.FILT_MARGIN + L] = _REF_TOK[ref_u8]
    win = sr.load_window_reduced(
        ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
        aff_min_bq=aff_bq, low_mq_thresh=cfg.LOW_MQ_THRESHOLD,
        low_bq_thresh=cfg.LOW_BQ_THRESHOLD.get(fam, 10),
        max_indel_length=cfg.MAX_INDEL_LENGTH,
        filter_view=(ref_tok, cfg.MIN_BQ, cfg.MIN_MQ))
    assert win is not None and win.has_filter_data
    pe_win = PileupEngine.from_native_window(win, ref_seq, 0,
                                             platform=platform)
    return pe_win, pe_tab, L, aff_bq, sr


def _site_inventory(pe, L, aff_bq):
    """(snv_sites [(pos, ref, alt, af)], het_germ, hom_germ) from pileup."""
    snv_pos, _ind, infos = pe.find_candidates(0, L, min_bq=aff_bq)
    ai = pe.alt_info_at(snv_pos, min_bq=aff_bq)
    sites, het, hom = [], [], []
    for p in snv_pos:
        info = ai[p][0]
        body = info.split("-", 1)[1].rsplit("-", 1)[0]
        toks = body.split()
        alt = next((toks[k][1:] for k in range(0, len(toks), 2)
                    if toks[k].startswith("X")), None)
        if alt is None:
            continue
        cnt = next((int(toks[k + 1]) for k in range(0, len(toks), 2)
                    if toks[k].startswith("X")), 0)
        depth = int(info.split("-", 1)[0]) or 1
        af = min(cnt / depth, 1.0)
        sites.append((p, pe._ref_base(p), alt, af))
        if af >= 0.75:
            hom.append((p, alt))
        elif af >= 0.2:
            het.append((p, alt))
    return sites, sorted(het), sorted(hom)


@pytest.fixture(scope="module")
def ont_ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vnative_ont"))
    simulate.make_dataset(
        d, seed=47, genome_len=80_000, coverage=45, read_length=700,
        n_snv=40, n_indel=0, n_germline=120, error_rate=0.015,
        af_choices=(0.06, 0.12, 0.3, 0.5, 0.9), lowbq_rate=0.08,
        somatic_hap_aware=True)
    return d


@pytest.fixture(scope="module")
def ilmn_ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vnative_ilmn"))
    simulate.make_dataset(
        d, seed=53, genome_len=60_000, coverage=50, read_length=150,
        n_snv=25, n_indel=0, n_germline=90, error_rate=0.008,
        af_choices=(0.08, 0.15, 0.4), somatic_hap_aware=True)
    return d


def _assert_hap_match(engine, sites):
    from clairs_to_tpu.postcall.haplotype import HaplotypeVerdict

    batch = engine.verdict_batch([(p, r, a, af) for (p, r, a, af) in sites])
    for (p, r, a, af) in sites:
        v_py = engine.verdict(p, r, a, af=af)
        v_c = batch[p]
        for f in HaplotypeVerdict.FIELDS:
            assert getattr(v_py, f) == getattr(v_c, f), (p, f)
        assert v_py.phaseable == v_c.phaseable, p
        assert v_py.strand_bias_p == v_c.strand_bias_p, p
        assert v_py.strand_table == v_c.strand_table, p


@pytest.fixture(scope="module")
def ont_hom_ds(tmp_path_factory):
    """Hap-unaware 0.9-AF somatics -> near-hom pileup columns, so the ⑥
    verdict's af_g >= 0.75 deep branch runs (the simulator's germlines are
    all heterozygous, and hap-aware somatics cap at ~0.5 observed AF)."""
    d = str(tmp_path_factory.mktemp("vnative_ont_hom"))
    simulate.make_dataset(
        d, seed=59, genome_len=60_000, coverage=45, read_length=700,
        n_snv=35, n_indel=0, n_germline=90, error_rate=0.015,
        af_choices=(0.08, 0.3, 0.9), lowbq_rate=0.08,
        somatic_hap_aware=False)
    return d


@pytest.mark.parametrize("flavor", ["window", "table"])
def test_haplotype_batch_matches_python(ont_ds, flavor):
    from clairs_to_tpu.phasing.phaser import phase_and_tag
    from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine

    pe_win, pe_tab, L, aff_bq, _sr = _load_engines(ont_ds, "ont")
    pe = pe_win if flavor == "window" else pe_tab
    sites, het, hom = _site_inventory(pe, L, aff_bq)
    # hap-aware somatics cap near 0.5 observed AF: the hom list here is the
    # top-AF tail (the ⑥ deep branch is covered by test_..._hom_columns)
    hom = sorted((p, a) for (p, _r, a, af) in sites if af >= 0.55)
    assert len(sites) > 40 and len(het) > 5 and len(hom) > 3
    anchors = [(p, pe._ref_base(p), a) for (p, a) in het]
    phase_and_tag(pe, anchors)
    engine = HaplotypeFilterEngine(
        pe, hetero_germline=het, homo_germline=hom,
        site_positions=[p for (p, _r, _a, _af) in sites])
    _assert_hap_match(engine, sites)


def test_haplotype_batch_hom_columns(ont_hom_ds):
    """⑥ deep branch: near-hom columns (af_g >= 0.75) in the hom list."""
    from clairs_to_tpu.phasing.phaser import phase_and_tag
    from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine

    pe, _pe_tab, L, aff_bq, _sr = _load_engines(ont_hom_ds, "ont")
    sites, het, hom = _site_inventory(pe, L, aff_bq)
    assert len(hom) > 3, "fixture must produce af>=0.75 columns"
    phase_and_tag(pe, [(p, pe._ref_base(p), a) for (p, a) in het])
    engine = HaplotypeFilterEngine(
        pe, hetero_germline=het, homo_germline=hom,
        site_positions=[p for (p, _r, _a, _af) in sites])
    _assert_hap_match(engine, sites)


def test_haplotype_batch_low_af_both_side(ont_ds):
    """Force the ⑦ both-side branch: every site evaluated at af=0.01."""
    from clairs_to_tpu.phasing.phaser import phase_and_tag
    from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine

    pe, _pe_tab, L, aff_bq, _sr = _load_engines(ont_ds, "ont")
    sites, het, hom = _site_inventory(pe, L, aff_bq)
    phase_and_tag(pe, [(p, pe._ref_base(p), a) for (p, a) in het])
    engine = HaplotypeFilterEngine(
        pe, hetero_germline=het, homo_germline=hom,
        site_positions=[p for (p, _r, _a, _af) in sites])
    _assert_hap_match(engine, [(p, r, a, 0.01) for (p, r, a, _af) in sites])


@pytest.mark.parametrize("flavor", ["window", "table"])
def test_hard_batch_matches_python(ilmn_ds, flavor):
    from clairs_to_tpu.postcall.hardfilter import HardFilterEngine

    pe_win, pe_tab, L, aff_bq, _sr = _load_engines(ilmn_ds, "ilmn")
    pe = pe_win if flavor == "window" else pe_tab
    sites, _het, _hom = _site_inventory(pe, L, aff_bq)
    assert len(sites) > 30
    engine = HardFilterEngine(
        pe, site_positions=[p for (p, _r, _a, _af) in sites])
    batch = engine.verdict_batch([(p, r, a) for (p, r, a, _af) in sites])
    for (p, r, a, _af) in sites:
        v_py = engine.verdict(p, r, a)
        v_c = batch[p]
        for f in ("pass_read_start_end", "pass_co_exist",
                  "pass_strand_bias", "pass_sequence_entropy"):
            assert getattr(v_py, f) == getattr(v_c, f), (p, f)
        assert v_py.strand_bias_p == v_c.strand_bias_p, p
        assert v_py.strand_table == v_c.strand_table, p


def test_batch_mixed_indel_falls_back(ont_ds):
    """Indel ref/alt pairs route through the Python path inside the batch."""
    from clairs_to_tpu.phasing.phaser import phase_and_tag
    from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine

    pe, _pe_tab, L, aff_bq, _sr = _load_engines(ont_ds, "ont")
    sites, het, hom = _site_inventory(pe, L, aff_bq)
    phase_and_tag(pe, [(p, pe._ref_base(p), a) for (p, a) in het])
    some = sites[:5]
    mixed = [(p, r, a, af) for (p, r, a, af) in some]
    # synthesize an insertion-style site at an SNV position
    p0, r0, _a0, af0 = sites[5]
    mixed.append((p0, r0, r0 + "A", af0))
    engine = HaplotypeFilterEngine(
        pe, hetero_germline=het, homo_germline=hom,
        site_positions=[p for (p, _r, _a, _af) in mixed])
    batch = engine.verdict_batch(mixed)
    for (p, r, a, af) in mixed:
        v_py = engine.verdict(p, r, a, af=af)
        v_c = batch[p]
        for f in v_py.FIELDS:
            assert getattr(v_py, f) == getattr(v_c, f), (p, f)
        assert v_py.strand_bias_p == v_c.strand_bias_p


def test_fisher_native_bit_exact():
    from clairs_to_tpu.postcall.hardfilter import fisher_exact

    lib = vn.get_lib()
    rng = np.random.default_rng(11)
    for _ in range(2000):
        a, b, c, d = (int(x) for x in rng.integers(0, 180, 4))
        assert fisher_exact([[a, b], [c, d]]) == \
            lib.verdict_fisher_exact(a, b, c, d)
    for _ in range(100):
        a, b, c, d = (int(x) for x in rng.integers(0, 3000, 4))
        assert fisher_exact([[a, b], [c, d]]) == \
            lib.verdict_fisher_exact(a, b, c, d)
