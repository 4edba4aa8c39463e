"""Native realignment: de Bruijn consensus + read realignment."""

import numpy as np
import pytest

from clairs_to_tpu import realign

pytestmark = pytest.mark.skipif(not realign.available(), reason="native lib unavailable")


def _ref(seed=0, n=300):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_consensus_recovers_ref_when_reads_match():
    ref = _ref(1)
    reads = [ref[i : i + 80] for i in range(0, 200, 10)]
    haps = realign.get_consensus(ref, reads)
    assert ref in haps


def test_consensus_discovers_insertion_haplotype():
    ref = _ref(2)
    alt = ref[:150] + "TTT" + ref[150:]  # 3bp insertion carried by many reads
    reads = [alt[i : i + 80] for i in range(80, 200, 6)]
    reads += [ref[i : i + 80] for i in range(80, 200, 12)]
    haps = realign.get_consensus(ref, reads)
    assert any("TTT" + ref[150:160] in h for h in haps), haps[:3]
    assert len(haps) <= 500


def test_realign_shifts_misplaced_read():
    ref = _ref(3)
    hap = ref  # reference haplotype only
    read = ref[100:180]
    pos, cigars = realign.realign_reads(ref, 1000, [read], [hap])
    assert pos[0] == 1000 + 100
    assert cigars[0] == "80M"


def test_realign_read_with_deletion():
    ref = _ref(4)
    hap_del = ref[:150] + ref[155:]  # 5bp deletion haplotype
    read = hap_del[100:200]
    pos, cigars = realign.realign_reads(ref, 0, [read], [ref, hap_del])
    assert pos[0] == 100
    assert "D" in cigars[0]
    assert "50M5D" in cigars[0] or "5D" in cigars[0]


def test_realign_many_reads():
    ref = _ref(5, n=400)
    reads = [ref[i : i + 90] for i in range(0, 300, 7)]
    pos, cigars = realign.realign_reads(ref, 0, reads, [ref])
    for k, i in enumerate(range(0, 300, 7)):
        assert pos[k] == i
        assert cigars[k] == "90M"
