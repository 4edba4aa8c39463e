#!/usr/bin/env python
"""Real 2-process multihost THROUGHPUT accounting -> MULTIHOST_r04.json.

Round-3 gap: the 2-process jax.distributed test proved correctness on a
40kb toy but carried no timing.  This harness runs a >=2 Mb workload
single-process and 2-process (one real coordinator, shared output dir,
CPU backend with gloo collectives) and computes

    scaling efficiency = T1 / (2 * T2)

where T is the per-process CALLING-stage wall (the parallelized work; the
per-process engine-load constant is reported separately).  Each process is
pinned to one host worker thread (-t 1) so the 2-CPU build box can
actually expose the parallelism: with -t 2 the two processes would fight
over the same two cores and the measurement would be a contention
benchmark, not a scaling one.  Chunk ownership is the static round-robin
split (parallel/scheduler.py::owned_chunks), the in-process analog of the
reference's CHUNK_LIST division (run_clairs_to:553-561).
"""

import json
import os
import re
import socket
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

WORK = "/tmp/clairs_multihost_r04"
GENOME_LEN = 2_400_000
COVERAGE = 40
CHUNK_NUM = 8


def build():
    from clairs_to_tpu.bamio import simulate

    marker = os.path.join(WORK, "DONE")
    if not os.path.exists(marker):
        simulate.make_dataset(
            WORK, seed=17, genome_len=GENOME_LEN, coverage=COVERAGE,
            read_length=700, n_snv=150, n_indel=0, n_germline=2000,
            error_rate=0.01, af_choices=(0.1, 0.2, 0.4),
            somatic_hap_aware=True)
        with open(marker, "w") as f:
            f.write("ok\n")


def base_argv(out_dir):
    return [
        "-T", os.path.join(WORK, "tumor.bam"),
        "-R", os.path.join(WORK, "ref.fa"),
        "-o", out_dir, "-t", "1", "-p", "ont",
        "--disable_indel_calling", "true", "--disable_verdict",
        "--chunk_num", str(CHUNK_NUM), "--device_batch", "512",
    ]


def run_proc(argv, env, cpu=None):
    t0 = time.time()
    prefix = ["taskset", "-c", str(cpu)] if cpu is not None else []
    r = subprocess.run(
        [*prefix, sys.executable, "-m", "clairs_to_tpu", "run", *argv],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=3600)
    wall = time.time() - t0
    m = re.search(r"RunMetricsSummary: (\{.*\})", r.stdout)
    summary = json.loads(m.group(1)) if m else None
    return r, wall, summary


def main():
    build()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 1 core per process EVERYWHERE (XLA intra-op, BLAS, OMP): efficiency
    # must compare equal per-process resources — without this, XLA-CPU and
    # BLAS in each process grab both cores of this 2-CPU box and the
    # 2-process run measures oversubscription, not scaling
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1 "
                        "--xla_cpu_multi_thread_eigen=false")
    env["OMP_NUM_THREADS"] = "1"
    env["OPENBLAS_NUM_THREADS"] = "1"
    env["MKL_NUM_THREADS"] = "1"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    # ---- single process (pinned to one core, like each member of the
    # 2-process run — the per-host resource unit being scaled) ----------
    out1 = os.path.join(WORK, "out_single")
    r, wall1, sum1 = run_proc(base_argv(out1), env, cpu=0)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    t1_call = sum1["stages"]["calling"]
    cands = sum1["counters"]["candidates"]

    # ---- two processes, one coordinator --------------------------------
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    out2 = os.path.join(WORK, "out_multi")
    procs = []
    t0 = time.time()
    for pid in (0, 1):
        argv = base_argv(out2) + [
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid)]
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(pid), sys.executable, "-m",
             "clairs_to_tpu", "run", *argv],
            env=env, cwd="/root/repo", stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    texts = []
    for p in procs:
        out_text, _ = p.communicate(timeout=3600)
        texts.append(out_text)
    wall2 = time.time() - t0
    for pid, (p, t) in enumerate(zip(procs, texts)):
        assert p.returncode == 0, f"proc {pid}:\n{t[-3000:]}"
    per_proc = []
    for t in texts:
        m = re.search(r"RunMetricsSummary: (\{.*\})", t)
        if m:
            sm = json.loads(m.group(1))
            per_proc.append({
                "calling_s": sm["stages"].get("calling", 0.0),
                "load_engines_s": sm["stages"].get("load_engines", 0.0),
                "total_s": sm["total_seconds"],
                "candidates": sm["counters"].get("candidates", 0),
            })
    t2_call = max(pp["calling_s"] for pp in per_proc)
    efficiency = t1_call / (2.0 * t2_call) if t2_call > 0 else 0.0

    # identity: merged 2-process VCF == single-process VCF
    with open(os.path.join(out1, "snv.vcf")) as f:
        single = [ln for ln in f if not ln.startswith("##")]
    with open(os.path.join(out2, "snv.vcf")) as f:
        merged = [ln for ln in f if not ln.startswith("##")]
    identical = merged == single

    result = {
        "workload": f"{GENOME_LEN//1000}kb@{COVERAGE}x ONT-like sim, "
                    f"{CHUNK_NUM} chunks, CPU backend, 1 worker/process",
        "candidates": cands,
        "single_calling_s": round(t1_call, 2),
        "single_wall_s": round(wall1, 1),
        "two_proc_calling_s_per_proc": [
            round(pp["calling_s"], 2) for pp in per_proc],
        "two_proc_candidates_per_proc": [
            pp["candidates"] for pp in per_proc],
        "two_proc_load_engines_s": [
            round(pp["load_engines_s"], 2) for pp in per_proc],
        "two_proc_wall_s": round(wall2, 1),
        "scaling_efficiency": round(efficiency, 3),
        "merged_vcf_identical_to_single": identical,
        "note": "efficiency = T1_calling / (2 * max per-proc T_calling); "
                "static round-robin chunk ownership "
                "(run_clairs_to:553-561 analog); every process pinned to "
                "one core with 1-thread XLA/BLAS so the 2-CPU build box "
                "measures scaling, not oversubscription",
    }
    with open("/root/repo/MULTIHOST_r04.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
