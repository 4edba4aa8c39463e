"""FilterIndex native-vs-numpy fallback parity.

The native lib always builds in-image, so without this test the pure-numpy
fallback path (used when g++/zlib compilation fails) would ship untested.
Every derived array and the final verdicts must match bit-for-bit.
"""

import numpy as np
import pytest

from clairs_to_tpu.bamio import bam_writer, native, simulate
from clairs_to_tpu.bamio.bam import BamFile
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.postcall import hardfilter
from clairs_to_tpu.postcall.hardfilter import FilterIndex, HardFilterEngine


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    out = tmp_path_factory.mktemp("fidx")
    rng = np.random.default_rng(9)
    genome = simulate.random_genome(rng, 6_000)
    variants = simulate.plan_variants(rng, genome, n_snv=6, n_indel=3,
                                      n_germline=4)
    reads = simulate.simulate_reads(rng, genome, variants, coverage=40,
                                    read_length=300, error_rate=0.02)
    path = str(out / "t.bam")
    recs = [bam_writer.encode_record(n, f, 0, p, 60, c, s, q)
            for (n, f, p, c, s, q) in reads]
    bam_writer.write_bam(path, ["chrF"], [len(genome)], recs)
    pe = PileupEngine(genome, 0, platform="ont")
    for rd in BamFile(path):
        pe.add_read(rd)
    sites = [(v.pos, v.ref, v.alt) for v in variants if not v.germline]
    return pe, sites


def test_native_and_numpy_paths_identical(engine, monkeypatch):
    pe, sites = engine
    assert native.available()
    ix_nat = FilterIndex(pe, 0, 20)

    monkeypatch.setattr(native, "get_lib", lambda: None)
    ix_np = FilterIndex(pe, 0, 20)

    for name in ("orig", "depth", "col_start", "ref_tok", "col_only_ref",
                 "col_ins", "cum_ins", "nr_pos", "nr_read", "nr_token",
                 "nr_bare_del", "nr_entry", "colkey", "colkey_cnt",
                 "rse_pos", "rse_read"):
        a, b = getattr(ix_nat, name), getattr(ix_np, name)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    assert ix_nat.p0 == ix_np.p0 and ix_nat.p1 == ix_np.p1
    assert ix_nat.n_reads == ix_np.n_reads
    assert ix_nat.T == ix_np.T
    assert ix_nat._ins_id_of == ix_np._ins_id_of


def test_verdicts_identical_across_paths(engine, monkeypatch):
    pe, sites = engine
    eng_nat = HardFilterEngine(pe)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    eng_np = HardFilterEngine(pe)
    compared = 0
    for (pos0, ref, alt) in sites:
        v1 = eng_nat.verdict(pos0, ref, alt)
        v2 = eng_np.verdict(pos0, ref, alt)
        assert (v1.pass_read_start_end, v1.pass_co_exist, v1.pass_strand_bias,
                v1.pass_sequence_entropy, v1.strand_table) == \
               (v2.pass_read_start_end, v2.pass_co_exist, v2.pass_strand_bias,
                v2.pass_sequence_entropy, v2.strand_table)
        assert v1.strand_bias_p == v2.strand_bias_p
        compared += 1
    assert compared >= 5


def test_site_restricted_index_matches_full(engine):
    """The windowed index must produce identical verdicts for every listed
    site (all verdict reads stay within +-FLANKING of a site)."""
    pe, sites = engine
    full = HardFilterEngine(pe)
    restricted = HardFilterEngine(
        pe, site_positions=[p for (p, _r, _a) in sites])
    for (pos0, ref, alt) in sites:
        v1 = full.verdict(pos0, ref, alt)
        v2 = restricted.verdict(pos0, ref, alt)
        assert (v1.pass_read_start_end, v1.pass_co_exist,
                v1.pass_strand_bias, v1.pass_sequence_entropy,
                v1.strand_table, v1.strand_bias_p) == \
               (v2.pass_read_start_end, v2.pass_co_exist,
                v2.pass_strand_bias, v2.pass_sequence_entropy,
                v2.strand_table, v2.strand_bias_p)
    # and the restricted index is actually smaller
    assert len(restricted.ix.orig) < len(full.ix.orig)
