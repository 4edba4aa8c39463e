"""Warm-engine serving mode (clairs_to_tpu/serve.py).

Spawns the real HTTP server (CPU backend), drives two calls on a
simulated dataset, and asserts: both produce the VCF, the SECOND request
reuses the cached engines (engines_cached true), and /health reports
them.  The warm-reuse property is the point of the mode: on the tunneled
TPU the per-run engine load tax is a measured 8-90s.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", CLAIRS_TO_TPU_AOT="0")
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "clairs_to_tpu", "serve", "--port", str(port)],
        cwd="/root/repo", env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    base = f"http://127.0.0.1:{port}"
    for _ in range(120):
        try:
            with urllib.request.urlopen(base + "/health", timeout=2) as r:
                if json.load(r)["status"] == "ok":
                    break
        except OSError:
            time.sleep(0.5)
    else:
        proc.kill()
        raise RuntimeError("server did not come up")
    yield base
    proc.kill()
    proc.wait(timeout=30)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve_ds"))
    return simulate.make_dataset(
        d, seed=61, genome_len=25_000, coverage=35, read_length=500,
        n_snv=8, n_indel=0, n_germline=20, error_rate=0.01,
        af_choices=(0.2, 0.4), somatic_hap_aware=True)


def _call(base, payload, timeout=600):
    req = urllib.request.Request(
        base + "/v1/call", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.load(r)


def test_serve_two_calls_reuse_engines(server, ds, tmp_path):
    argv = ["-T", ds["bam"], "-R", ds["fasta"], "-p", "ont", "-t", "1",
            "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
            "--disable_verdict", "--disable_indel_calling", "true"]
    r1 = _call(server, {"argv": argv + ["-o", str(tmp_path / "o1")]})
    assert r1["returncode"] == 0, r1
    assert os.path.exists(r1["snv_vcf"])
    assert r1["engines_cached"] is False
    r2 = _call(server, {"argv": argv + ["-o", str(tmp_path / "o2")]})
    assert r2["returncode"] == 0, r2
    assert r2["engines_cached"] is True
    with open(r1["snv_vcf"]) as f1, open(r2["snv_vcf"]) as f2:
        b1 = [l for l in f1 if not l.startswith("##")]
        b2 = [l for l in f2 if not l.startswith("##")]
    assert b1 == b2 and len(b1) > 1
    assert "metrics" in r2 and r2["metrics"]["counters"]["candidates"] > 0

    with urllib.request.urlopen(server + "/health", timeout=10) as r:
        health = json.load(r)
    assert health["status"] == "ok" and len(health["engines"]) == 1


def test_serve_bad_request(server):
    req = urllib.request.Request(
        server + "/v1/call", data=b'{"argv": []}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_serve_concurrent_requests_serialize(server, ds, tmp_path):
    """Two simultaneous calls must both succeed (per-chip lock serializes
    them) and produce identical bodies."""
    import threading

    argv = ["-T", ds["bam"], "-R", ds["fasta"], "-p", "ont", "-t", "1",
            "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
            "--disable_verdict", "--disable_indel_calling", "true"]
    results = {}

    def go(tag):
        results[tag] = _call(
            server, {"argv": argv + ["-o", str(tmp_path / f"c_{tag}")]})

    ts = [threading.Thread(target=go, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results["a"]["returncode"] == 0
    assert results["b"]["returncode"] == 0
    with open(results["a"]["snv_vcf"]) as fa, \
            open(results["b"]["snv_vcf"]) as fb:
        assert [l for l in fa if not l.startswith("##")] == \
            [l for l in fb if not l.startswith("##")]
