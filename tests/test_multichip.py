"""Multi-chip / multi-host production-path tests.

Runs the REAL CLI pipeline (cli/run.py) on the 8-virtual-CPU-device mesh
(tests/conftest.py) and proves the distribution layer is output-invariant:

* mesh data parallelism: default run (mesh over all 8 devices) produces a
  byte-identical snv.vcf to a --device_count 1 run;
* multi-host chunk ownership: two simulated hosts (round-robin owned_chunks
  + shard handoff through the shared output dir + host-0 merge) reproduce
  the single-host VCF byte-for-byte.

The reference has no multi-device analog (GNU parallel over processes,
run_clairs_to:1196-1226); SURVEY.md §5.8 specifies this mapping.
"""

import os

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.cli.run import main as cli_main

import pytest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("mc_data")
    return simulate.make_dataset(
        str(d / "data"), seed=21, genome_len=40_000,
        n_snv=12, n_indel=0, n_germline=8,
        read_length=400, error_rate=0.002, coverage=55,
    )


def _run_cli(ds, out, extra=()):
    argv = [
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out, "-t", "2",
        "-p", "ont", "--disable_indel_calling", "true", "--chunk_num", "3",
    ] + list(extra)
    assert cli_main(argv) == 0
    with open(os.path.join(out, "snv.vcf")) as f:
        return f.read()


def test_mesh_vcf_identity(dataset, tmp_path):
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    single = _run_cli(dataset, str(tmp_path / "single"), ["--device_count", "1"])
    multi = _run_cli(dataset, str(tmp_path / "multi"))  # mesh over all 8
    assert [l for l in single.splitlines() if not l.startswith("#")], \
        "dataset produced no calls — test would be vacuous"
    assert multi == single


def test_multihost_chunk_ownership_vcf_identity(dataset, tmp_path, monkeypatch):
    from clairs_to_tpu.parallel import scheduler

    out = str(tmp_path / "mh")
    # single-host reference output FIRST (before init_distributed is patched)
    single = _run_cli(dataset, str(tmp_path / "ref"), ["--device_count", "1"])

    # host 1 first: processes its owned chunks, leaves the merge to host 0
    monkeypatch.setattr(scheduler, "init_distributed", lambda *a, **k: (2, 1))
    argv = [
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out, "-t", "2",
        "-p", "ont", "--disable_indel_calling", "true", "--chunk_num", "3",
    ]
    assert cli_main(argv) == 0
    assert not os.path.exists(os.path.join(out, "snv.vcf"))
    shard_dir = os.path.join(out, "tmp", "vcf_output")
    host1_shards = [p for p in os.listdir(shard_dir) if p.startswith("p_snv_")]
    assert len(host1_shards) == 1  # chunks 0,2 -> host 0; chunk 1 -> host 1

    # host 0: its own chunks + gather + merge + postcall
    monkeypatch.setattr(scheduler, "init_distributed", lambda *a, **k: (2, 0))
    assert cli_main(argv) == 0
    with open(os.path.join(out, "snv.vcf")) as f:
        merged = f.read()
    assert merged == single


def test_owned_chunks_partition():
    from clairs_to_tpu.parallel.scheduler import owned_chunks

    chunks = list(range(10))
    parts = [owned_chunks(chunks, i, 3) for i in range(3)]
    assert sorted(sum(parts, [])) == chunks
    assert not (set(parts[0]) & set(parts[1]))
