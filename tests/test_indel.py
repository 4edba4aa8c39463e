"""Indel calling end-to-end with the committed indel demo assets."""

import os

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.compare import compare_vcf
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_indel_assets = os.path.exists(
    os.path.join(DEFAULT_ASSET_DIR, "indel", "aff.npz")
)
pytestmark = pytest.mark.skipif(not has_indel_assets, reason="indel assets missing")


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = tmp_path_factory.mktemp("indel_e2e")
    ds = simulate.make_dataset(
        str(out / "sim"), seed=88, genome_len=50_000, coverage=55,
        n_snv=12, n_indel=12, n_germline=8,
    )
    out_dir = str(out / "out")
    rc = cli_main([
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-t", "2", "-p", "ont",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing", "--disable_verdict",
    ])
    assert rc == 0
    return ds, out_dir


def test_indel_f1(result):
    ds, out_dir = result
    res = compare_vcf(
        ds["truth_indel"], os.path.join(out_dir, "indel.vcf"),
        input_filter_tag="PASS", benchmark_indel=True,
    )
    print(f"\nINDEL F1={res.f1} TP={res.tp} FP={res.fp} FN={res.fn}")
    assert res.f1 >= 0.7, (res.f1, res.tp, res.fp, res.fn)


def test_snv_f1_with_indels_present(result):
    ds, out_dir = result
    res = compare_vcf(
        ds["truth_snv"], os.path.join(out_dir, "snv.vcf"), input_filter_tag="PASS"
    )
    print(f"\nSNV F1={res.f1} TP={res.tp} FP={res.fp} FN={res.fn}")
    assert res.f1 >= 0.8, (res.f1, res.tp, res.fp, res.fn)


def test_indel_ref_alt_match_truth(result):
    ds, out_dir = result
    truth = {
        v.pos + 1: v for v in ds["variants"] if v.kind in ("ins", "del") and not v.germline
    }
    for line in open(os.path.join(out_dir, "indel.vcf")):
        if line.startswith("#"):
            continue
        cols = line.split("\t")
        pos = int(cols[1])
        if pos in truth and cols[6] == "PASS":
            assert cols[3] == truth[pos].ref, (pos, cols[3], truth[pos].ref)
            assert cols[4] == truth[pos].alt, (pos, cols[4], truth[pos].alt)
