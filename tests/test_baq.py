"""BAQ property tests (exact htslib equality unvalidated; see baq.py)."""

import numpy as np
import pytest

from clairs_to_tpu.bamio.baq import apply_baq, baq_glocal


def _ref(seed=0, n=120):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_clean_match_keeps_quals():
    ref = _ref(1)
    read = ref[10:90]
    quals = np.full(len(read), 30)
    capped = apply_baq(ref, read, quals)
    # perfectly aligned unique read: interior bases keep their quality
    assert (capped[5:-5] == 30).mean() > 0.9, capped[:20]


def test_unmodeled_deletion_downgrades_flanks():
    ref = _ref(2, n=200)
    # read skips 6 ref bases but is treated as a contiguous match (the
    # misalignment BAQ exists to catch)
    read = ref[20:80] + ref[86:140]
    quals = np.full(len(read), 30)
    capped = apply_baq(ref, read, quals)
    join = 60  # position where the misalignment starts
    near = capped[join - 3 : join + 10]
    far = capped[5 : join - 20]
    assert near.min() < 20, near
    assert far.mean() > near.mean()


def test_repetitive_reference_lowers_confidence():
    ref = "ACAC" * 40
    read = ref[8:72]  # ambiguous placement in a repeat
    quals = np.full(len(read), 30)
    capped = apply_baq(ref, read, quals)
    assert capped.mean() < 15, capped.mean()  # many equally-good alignments


def test_caps_never_increase():
    ref = _ref(3)
    read = ref[5:100]
    quals = np.arange(len(read)) % 40 + 1
    capped = apply_baq(ref, read, quals)
    assert (capped <= quals).all()


def test_empty_inputs():
    assert list(baq_glocal("ACGT", "", [])) == []
