"""VCF-row decision logic (infer/calling.py) vs reference semantics."""

import numpy as np
import pytest

from clairs_to_tpu.infer.calling import (
    CandidateRecord,
    call_from_posterior,
    decode_alt_info,
    rank_variant_alt,
)


def _post(vals):
    return np.asarray(vals, dtype=np.float64)


FWD = np.array([10, 5, 0, 0])
REV = np.array([8, 4, 0, 0])


def test_decode_alt_info():
    d, depth = decode_alt_info("30-XC 10 RA 20-")
    assert depth == 30
    assert d == {"XC": 10, "RA": 20}
    # all-deletion depth recovery (call_variants.py:143-147)
    d, depth = decode_alt_info("0-DACG 12-")
    assert depth == 12


def test_rank_variant_alt_orders_by_af():
    alts, counts = rank_variant_alt({"XC": 10, "XT": 15, "RA": 30}, 55)
    assert alts == ["XT", "XC"]
    assert counts == [15, 10]


def test_snv_variant_call():
    rec = CandidateRecord("chr1", 100, "A", "30-XC 10 RA 20-")
    row = call_from_posterior(rec, _post([0.1, 0.9, 0.1, 0.1]), FWD, REV, mode="snv")
    assert row["REF"] == "A" and row["ALT"] == "C"
    assert row["GT"] == "0/1"
    assert row["FILTER"] == "PASS"
    assert row["DP"] == 30
    assert row["AF"] == pytest.approx(10 / 30)
    assert row["AD"] == "20,10"
    assert row["AU"] == 18 and row["CU"] == 9
    assert "FAU=10" in row["INFO"] and "RAU=8" in row["INFO"]


def test_snv_reference_call_hidden_by_default():
    rec = CandidateRecord("chr1", 100, "A", "30-XC 10 RA 20-")
    row = call_from_posterior(rec, _post([0.9, 0.1, 0.1, 0.1]), FWD, REV, mode="snv")
    assert row is None
    row = call_from_posterior(
        rec, _post([0.9, 0.1, 0.1, 0.1]), FWD, REV, mode="snv", show_ref=True
    )
    assert row["FILTER"] == "RefCall" and row["ALT"] == "." and row["GT"] == "0/0"


def test_snv_downgrade_when_argmax_not_observed():
    # argmax = G but only C alt observed -> downgraded to reference call
    rec = CandidateRecord("chr1", 100, "A", "30-XC 10 RA 20-")
    row = call_from_posterior(rec, _post([0.1, 0.2, 0.9, 0.1]), FWD, REV, mode="snv")
    assert row is None  # RefCall hidden
    row = call_from_posterior(
        rec, _post([0.1, 0.2, 0.9, 0.1]), FWD, REV, mode="snv", show_ref=True
    )
    assert row["FILTER"] == "RefCall"


def test_snv_lowqual_below_cutoff():
    rec = CandidateRecord("chr1", 100, "A", "30-XC 10 RA 20-")
    # posterior barely above 0.5 -> low QUAL
    row = call_from_posterior(
        rec, _post([0.1, 0.52, 0.1, 0.1]), FWD, REV, mode="snv", qual_cutoff=8
    )
    assert row["FILTER"] == "LowQual"


def test_genotype_11_at_af_one():
    rec = CandidateRecord("chr1", 100, "A", "10-XC 10-")
    row = call_from_posterior(rec, _post([0.0, 0.99, 0.0, 0.0]), FWD, REV, mode="snv")
    assert row["GT"] == "1/1" and row["AF"] == 1.0


def test_indel_insertion_call():
    rec = CandidateRecord("chr1", 100, "A", "30-IATT 9 RA 21-")
    row = call_from_posterior(
        rec, _post([0.1, 0.1, 0.1, 0.1, 0.9, 0.1]), FWD, REV, mode="indel"
    )
    assert row["REF"] == "A" and row["ALT"] == "ATT"
    assert row["GT"] == "0/1"


def test_indel_insertion_hash_anchor():
    # v0.4.1 edge case: anchor '#' -> REF base + inserted seq
    rec = CandidateRecord("chr1", 100, "A", "30-I#TT 9 RA 21-")
    row = call_from_posterior(
        rec, _post([0.1, 0.1, 0.1, 0.1, 0.9, 0.1]), FWD, REV, mode="indel"
    )
    assert row["ALT"] == "ATT"


def test_indel_deletion_call():
    # deletion alt key = 'D' + anchor + deleted seq (create_tensor:195-196);
    # call_variants.py:362-364 strips 'D'+anchor via [2:]
    rec = CandidateRecord("chr1", 100, "A", "30-DACG 9 RA 21-")
    row = call_from_posterior(
        rec, _post([0.1, 0.1, 0.1, 0.1, 0.1, 0.9]), FWD, REV, mode="indel"
    )
    assert row["REF"] == "ACG" and row["ALT"] == "A"


def test_indel_mode_drops_snv_rows():
    rec = CandidateRecord("chr1", 100, "A", "30-XC 10 RA 20-")
    # argmax on an ACGT allele in indel mode = reference-ish -> hidden
    row = call_from_posterior(
        rec, _post([0.9, 0.1, 0.1, 0.1, 0.1, 0.1]), FWD, REV, mode="indel"
    )
    assert row is None


def test_zero_depth_variant_skipped():
    rec = CandidateRecord("chr1", 100, "A", "0--")
    row = call_from_posterior(rec, _post([0.1, 0.9, 0.1, 0.1]), FWD, REV, mode="snv")
    assert row is None
