"""End-to-end PoN value test: realistic germline density.

Tumor-only calling cannot distinguish germline het sites from somatic
variants by evidence alone — the reference leans on its 4 default PoN
databases (run_clairs_to:821-878).  This pins that (a) without a PoN,
dense germline leaks into PASS calls, and (b) --panel_of_normals removes
them (FILTER NonSomatic) and restores precision.
"""

import os

import pytest

from clairs_to_tpu.bamio.simulate import make_multi_contig_dataset
from clairs_to_tpu.bench.compare import compare_vcf
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("ponsim")
    return make_multi_contig_dataset(
        str(out), n_contigs=2, seed=21, genome_len=60_000, coverage=50,
        n_snv=10, n_germline=70,
    )


def _run(dataset, out_dir, pon):
    argv = [
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--disable_verdict", "--model_dir", DEFAULT_ASSET_DIR,
        "--device_batch", "256",
    ]
    if pon:
        argv += ["--panel_of_normals", dataset["germline"]]
    assert cli_main(argv) == 0
    return os.path.join(out_dir, "snv.vcf")


def test_pon_restores_precision(dataset, tmp_path):
    no_pon = _run(dataset, str(tmp_path / "no_pon"), pon=False)
    with_pon = _run(dataset, str(tmp_path / "with_pon"), pon=True)

    r0 = compare_vcf(dataset["truth_snv"] if "truth_snv" in dataset else
                     os.path.join(os.path.dirname(dataset["truth"]),
                                  "truth_snv.vcf"),
                     no_pon, input_filter_tag="PASS")
    r1 = compare_vcf(os.path.join(os.path.dirname(dataset["truth"]),
                                  "truth_snv.vcf"),
                     with_pon, input_filter_tag="PASS")
    print(f"\nno-PoN  P={r0.precision} R={r0.recall} FP={r0.fp}")
    print(f"with-PoN P={r1.precision} R={r1.recall} FP={r1.fp}")

    # germline leaks without a PoN...
    assert r0.fp >= 10
    # ...and the PoN stage removes (almost) all of it without recall loss
    assert r1.fp <= max(2, r0.fp // 10)
    assert r1.recall >= r0.recall - 1e-9
    with open(with_pon) as f:
        body = f.read()
    assert "NonSomatic" in body and "PoN_1" in body
