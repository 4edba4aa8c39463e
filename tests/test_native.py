"""Native C++ decoder vs pure-Python decoder: identical entry semantics."""

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import native, simulate
from clairs_to_tpu.bamio.bam import BamFile
from clairs_to_tpu.bamio.pileup import PileupEngine

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("simnat")
    return simulate.make_dataset(
        str(out), seed=7, genome_len=30_000, coverage=40,
        n_snv=10, n_indel=6, n_germline=5,
    )


def _python_engine(ds, start, end):
    eng = PileupEngine(ds["genome"], 0, platform="ont")
    bam = BamFile(ds["bam"])
    for read in bam.fetch(ds["ctg"], start, end, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG):
        eng.add_read(read)
    return eng


def _native_engine(ds, start, end):
    table = native.load_entry_table(ds["bam"], ds["ctg"], start, end)
    return PileupEngine.from_entry_table(table, ds["genome"], 0, platform="ont")


def test_entry_tables_match(dataset):
    start, end = 0, 30_000
    py = _python_engine(dataset, start, end)
    nat = _native_engine(dataset, start, end)
    a, b = py._finalize(), nat._finalize()
    assert len(a["pos"]) == len(b["pos"])
    for k in ("pos", "code", "bq", "mq", "hp", "ikind", "ilen", "read_id", "eflags"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert list(py._iseq) == list(nat._iseq)


@pytest.mark.parametrize("min_bq", [0, 20])
def test_channel_counts_match(dataset, min_bq):
    py = _python_engine(dataset, 0, 30_000)
    nat = _native_engine(dataset, 0, 30_000)
    ca, da = py.channel_counts(min_bq, 0, 30_000)
    cb, db = nat.channel_counts(min_bq, 0, 30_000)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(da, db)


def test_candidates_match(dataset):
    py = _python_engine(dataset, 0, 30_000)
    nat = _native_engine(dataset, 0, 30_000)
    sa, ia, _ = py.find_candidates(0, 30_000, select_indel_candidates=True)
    sb, ib, _ = nat.find_candidates(0, 30_000, select_indel_candidates=True)
    assert sa == sb
    assert ia == ib
    alt_a = py.alt_info_at(sa + ia, min_bq=20)
    alt_b = nat.alt_info_at(sb + ib, min_bq=20)
    assert alt_a == alt_b


@pytest.mark.parametrize("min_bq,phasing", [(0, False), (20, False), (0, True)])
def test_cpp_reduction_matches_numpy(dataset, min_bq, phasing):
    """entry_channel_counts (C++) vs the numpy reference reduction."""
    eng = _native_engine(dataset, 0, 30_000)
    a = eng._finalize()
    cpp, cpp_depth = eng.channel_counts(min_bq, 0, 30_000, with_phasing=phasing)
    ref, ref_depth = eng._channel_counts_np(a, min_bq, 0, 30_000, phasing)
    np.testing.assert_array_equal(cpp, ref)
    np.testing.assert_array_equal(cpp_depth, ref_depth)


def test_cpp_prefilter_matches_numpy(dataset):
    """entry_candidate_prefilter (C++) vs the numpy superset prefilter:
    identical final candidate sets through find_candidates."""
    from clairs_to_tpu.bamio import pileup as pileup_mod

    eng = _native_engine(dataset, 0, 30_000)
    s_native, i_native, _ = eng.find_candidates(0, 30_000, select_indel_candidates=True)
    # force the numpy branch
    orig = pileup_mod.PileupEngine._native_lib
    try:
        pileup_mod.PileupEngine._native_lib = lambda self: None
        eng2 = _native_engine(dataset, 0, 30_000)
        s_np, i_np, _ = eng2.find_candidates(0, 30_000, select_indel_candidates=True)
    finally:
        pileup_mod.PileupEngine._native_lib = orig
    assert s_native == s_np
    assert i_native == i_np


def test_bai_random_access_matches_linear(dataset, tmp_path):
    """Region load through the .bai index == index-less linear scan."""
    import os
    import shutil

    bam = dataset["bam"]
    assert os.path.exists(bam + ".bai")
    t_idx = native.load_entry_table(bam, dataset["ctg"], 20_000, 25_000)
    noidx = str(tmp_path / "noidx.bam")
    shutil.copy(bam, noidx)
    t_lin = native.load_entry_table(noidx, dataset["ctg"], 20_000, 25_000)
    assert len(t_idx["pos"]) == len(t_lin["pos"])
    np.testing.assert_array_equal(np.sort(t_idx["pos"]), np.sort(t_lin["pos"]))
    np.testing.assert_array_equal(np.sort(t_idx["bq"]), np.sort(t_lin["bq"]))


def test_region_subset(dataset):
    """Native region loading must include reads overlapping the boundary."""
    py = _python_engine(dataset, 10_000, 20_000)
    nat = _native_engine(dataset, 10_000, 20_000)
    ca, da = py.channel_counts(0, 10_000, 20_000)
    cb, db = nat.channel_counts(0, 10_000, 20_000)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(da, db)


def test_group_entries_at_native_matches_numpy_fallback():
    import numpy as np

    from clairs_to_tpu.bamio import native

    rng = np.random.default_rng(0)
    pos = rng.integers(0, 500, size=20000).astype(np.int64)
    want = np.unique(rng.integers(0, 500, size=40).astype(np.int64))
    got_native = native.group_entries_at(pos, want)
    # force the numpy fallback
    lib = native._lib
    native._lib = None
    native._load_error = RuntimeError("forced")
    try:
        got_np = native.group_entries_at(pos, want)
    finally:
        native._lib = lib
        native._load_error = None
    assert set(got_native) == set(got_np) == {int(p) for p in want}
    for p in want:
        a, b = got_native[int(p)], got_np[int(p)]
        assert np.array_equal(a, b), (p, a[:5], b[:5])
        # order preserved = ascending entry indices
        assert np.all(np.diff(a) > 0) or len(a) <= 1
