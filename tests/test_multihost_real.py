"""REAL two-process multi-host run over jax.distributed (CPU backend).

Round 2 only simulated host ownership by monkeypatching init_distributed;
this launches two actual CLI processes against one coordinator and a shared
output dir, and asserts the merged VCF equals the single-process run —
the analog of the reference's static CHUNK_LIST split + final sort_vcf
gather (run_clairs_to:553-561, src/sort_vcf.py:113-222).
"""

import os
import socket
import subprocess
import sys

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("mh2p")
    return simulate.make_dataset(
        str(out), seed=55, genome_len=40_000, coverage=45, n_snv=12,
        n_germline=6,
    )


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _argv(dataset, out_dir):
    return [
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--chunk_num", "4",
    ]


def test_two_process_run_matches_single(dataset, tmp_path):
    # single-process reference output (in-process; conftest CPU platform)
    ref_out = str(tmp_path / "single")
    assert cli_main(_argv(dataset, ref_out)) == 0
    with open(os.path.join(ref_out, "snv.vcf")) as f:
        single = [ln for ln in f if not ln.startswith("##")]

    port = _free_port()
    out = str(tmp_path / "multi")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["CLAIRS_TO_TPU_AOT"] = "0"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in (0, 1):
        cmd = [
            sys.executable, "-m", "clairs_to_tpu", "run",
            *_argv(dataset, out),
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out_text, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out_text)
    for pid, (p, text) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{text[-4000:]}"
    assert any("owns" in t for t in outs)  # chunk ownership actually split

    with open(os.path.join(out, "snv.vcf")) as f:
        merged = [ln for ln in f if not ln.startswith("##")]
    assert merged == single
