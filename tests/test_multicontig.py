"""Multi-contig calling: chunk planning, streaming across contigs, merge order."""

import os

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.compare import compare_vcf
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main
from clairs_to_tpu.vcf.sort import contig_sort_key

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


def test_multi_contig_end_to_end(tmp_path):
    ds = simulate.make_multi_contig_dataset(
        str(tmp_path / "sim"), n_contigs=3, seed=6,
        genome_len=25_000, n_snv=8, n_germline=4, coverage=50,
    )
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing", "--disable_verdict",
        "--chunk_size", "10000",
    ])
    assert rc == 0
    body = [l for l in open(os.path.join(out_dir, "snv.vcf")) if not l.startswith("#")]
    # contig ordering chr1 < chr2 < chr3, positions ascending within each
    keys = [(contig_sort_key(l.split("\t")[0]), int(l.split("\t")[1])) for l in body]
    assert keys == sorted(keys)
    ctgs_seen = {l.split("\t")[0] for l in body}
    assert ctgs_seen == {"chr1", "chr2", "chr3"}
    res = compare_vcf(ds["truth"], os.path.join(out_dir, "snv.vcf"),
                      input_filter_tag="PASS")
    print(f"\nmulti-contig F1={res.f1} TP={res.tp} FP={res.fp} FN={res.fn}")
    assert res.f1 >= 0.8, (res.f1, res.tp, res.fp, res.fn)
