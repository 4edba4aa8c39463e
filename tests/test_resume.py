"""--resume: per-chunk outputs are reused across invocations."""

import os
import time

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


def test_resume_skips_completed_chunks(tmp_path, capsys):
    ds = simulate.make_dataset(
        str(tmp_path / "sim"), seed=33, genome_len=30_000, coverage=45,
        n_snv=8, n_germline=4,
    )
    out_dir = str(tmp_path / "out")
    common = [
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing", "--disable_verdict",
        "--chunk_size", "10000",
    ]
    assert cli_main(common) == 0
    first = open(os.path.join(out_dir, "snv.vcf")).read()

    t0 = time.time()
    assert cli_main(common + ["--resume"]) == 0
    resumed_elapsed = time.time() - t0
    out = capsys.readouterr().out
    assert out.count("resumed from existing output") == 3
    second = open(os.path.join(out_dir, "snv.vcf")).read()
    assert first == second
    assert resumed_elapsed < 20
