"""Platform-family behavior: ilmn (postfilter path, min_bq 0) and hifi."""

import os

import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.compare import compare_vcf
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


def test_platform_family_collapse():
    assert cfg.platform_family("ont_r10_dorado_sup_5khz") == "ont"
    assert cfg.platform_family("hifi_revio_ss") == "hifi"
    assert cfg.platform_family("ilmn_ssrs") == "ilmn"


@pytest.mark.parametrize("platform", ["ilmn", "hifi_revio"])
def test_cli_other_platforms(platform, tmp_path):
    """The ilmn path exercises single-view tensors (min_bq 0 -> AFF==NEG) and
    the no-phasing postfilter; hifi exercises the long-read path with bq 0."""
    ds = simulate.make_dataset(
        str(tmp_path / "sim"), seed=55, genome_len=40_000, coverage=50,
        n_snv=14, n_germline=6,
    )
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-t", "1", "-p", platform, "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_verdict",
    ])
    assert rc == 0
    res = compare_vcf(ds["truth_snv"], os.path.join(out_dir, "snv.vcf"),
                      input_filter_tag="PASS")
    print(f"\n{platform}: F1={res.f1} TP={res.tp} FP={res.fp} FN={res.fn}")
    assert res.f1 >= 0.8, (platform, res.f1, res.tp, res.fp, res.fn)
