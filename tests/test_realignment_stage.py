"""The Illumina realignment filter stage: decision parity + CLI wiring.

The reference always runs realign_variants for ilmn before the postfilter
(/root/reference/run_clairs_to:1449-1482); failing calls get QUAL 0 and
FILTER 'LowQual;Realignment' (src/realign_variants.py:160-180).
"""

import os

import numpy as np
import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.genome.fasta import FastaFile
from clairs_to_tpu.postcall import realignment
from clairs_to_tpu.postcall.realignment import realign_decision, realign_filter

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))


def _reference_rule(raw_support, raw_depth, realign_support, realign_depth):
    """The reference's literal expression (realign_variants.py:119-122),
    with its implicit skips: missing original or realigned pileup rows
    return pass (:86-88, :109-112)."""
    if raw_depth <= 0 or realign_depth <= 0:
        return False
    return (raw_support / float(raw_depth)
            > realign_support / realign_depth
            and realign_support < raw_support)


def test_decision_rule_golden_table():
    rng = np.random.default_rng(5)
    cases = [(0, 0, 0, 0), (3, 30, 3, 30), (3, 30, 2, 30), (3, 30, 2, 29),
             (3, 30, 3, 20), (4, 40, 0, 0), (4, 40, 4, 39), (5, 50, 4, 51)]
    for _ in range(500):
        rd = int(rng.integers(0, 60))
        nd = int(rng.integers(0, 60))
        cases.append((int(rng.integers(0, rd + 1)), rd,
                      int(rng.integers(0, nd + 1)), nd))
    for rs, rd, ns, nd in cases:
        assert realign_decision(rs, rd, ns, nd) == _reference_rule(rs, rd, ns, nd), \
            (rs, rd, ns, nd)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("realnsim")
    return simulate.make_dataset(
        str(out), seed=91, genome_len=30_000, coverage=50,
        read_length=150, n_snv=10, n_germline=5,
    )


def _rows_at(positions):
    return [
        dict(CHROM="chrS", POS=int(p) + 1, REF="A", ALT="C",
             QUAL=3.0, FILTER="PASS", INFO=".")
        for p in positions
    ]


def test_filter_runs_and_keeps_supported_calls(dataset):
    """True calls whose support survives realignment stay PASS."""
    if not realignment.realign.available():
        pytest.skip("native realign lib unavailable")
    fasta = FastaFile(dataset["fasta"])
    truth = []
    with open(dataset["truth"]) as f:
        for line in f:
            if line.startswith("#"):
                continue
            c = line.split("\t")
            if len(c[3]) == 1 and len(c[4]) == 1:
                truth.append((int(c[1]) - 1, c[3], c[4]))
    rows = [
        dict(CHROM="chrS", POS=p + 1, REF=r, ALT=a, QUAL=3.0, FILTER="PASS",
             INFO=".")
        for (p, r, a) in truth[:5]
    ]
    n = realign_filter(dataset["bam"], fasta, rows)
    # genuine variants: realignment must not reduce their support
    assert n == 0, [r for r in rows if r["FILTER"] != "PASS"]
    # qual >= 8 rows are never re-checked (realign_variants.py:72)
    high = [dict(CHROM="chrS", POS=100, REF="A", ALT="C", QUAL=30.0,
                 FILTER="PASS", INFO=".")]
    assert realign_filter(dataset["bam"], fasta, high) == 0


def test_filter_tags_on_decreased_support(dataset, monkeypatch):
    """When realignment demonstrably reduces alt support, the row fails
    with the reference's exact QUAL/FILTER rewrite."""
    if not realignment.realign.available():
        pytest.skip("native realign lib unavailable")
    fasta = FastaFile(dataset["fasta"])

    calls = {"n": 0}
    real_counts = realignment._counts

    def fake_counts(reads_info, pos0, alt_base):
        calls["n"] += 1
        alt, depth = real_counts(reads_info, pos0, alt_base)
        if calls["n"] % 2 == 0:   # second (realigned) count per site
            return 0, depth
        return max(alt, 2), depth  # ensure a nonzero "raw" alt support
    monkeypatch.setattr(realignment, "_counts", fake_counts)

    rows = _rows_at([5000])
    n = realign_filter(dataset["bam"], fasta, rows)
    assert n == 1
    assert rows[0]["FILTER"] == "LowQual;Realignment"
    assert rows[0]["QUAL"] == 0.0


@pytest.mark.skipif(not has_assets, reason="demo assets missing")
def test_cli_ilmn_runs_realignment_stage(dataset, tmp_path, capsys):
    """--enable_realignment defaults ON for ilmn; the stage is exercised
    in the production path (no silent skip)."""
    from clairs_to_tpu.cli.run import main as cli_main

    seen = {"called": False}
    real_rf = realign_filter

    def spy(*a, **kw):
        seen["called"] = True
        return real_rf(*a, **kw)

    import clairs_to_tpu.cli.run as runmod
    from unittest import mock
    with mock.patch.object(realignment, "realign_filter", side_effect=spy) as _:
        # cli imports the symbol from the module at call time
        rc = cli_main([
            "-T", dataset["bam"], "-R", dataset["fasta"],
            "-o", str(tmp_path / "out"), "-t", "1", "-p", "ilmn",
            "--disable_indel_calling", "true",
            "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        ])
    assert rc == 0
    assert seen["called"] or not realignment.realign.available()
