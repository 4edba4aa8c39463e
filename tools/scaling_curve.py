"""Scaling curve on the virtual CPU device mesh: 1/2/4/8 devices.

Runs the PRODUCTION CLI end-to-end at each device count (fresh subprocess
with XLA_FLAGS=--xla_force_host_platform_device_count=N, JAX_PLATFORMS=cpu),
checks VCF byte-identity across counts, and writes a MULTICHIP-style JSON
artifact with per-count calling-stage throughput.

CPU-mesh throughput is NOT a hardware-scaling measurement (virtual devices
share the same cores) — the artifact demonstrates (a) multi-device
correctness of the real pipeline at every mesh size and (b) that the batch
sharding machinery adds no pathological overhead; the real 2-host >=85%
efficiency target (BASELINE.md) needs real chips.

Usage: python tools/scaling_curve.py [--out MULTICHIP_scaling.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import sys
sys.path.insert(0, "/root/repo")
from clairs_to_tpu.cli.run import main
raise SystemExit(main(sys.argv[1:]))
"""


def run_one(ds, out_dir, n_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices} "
        + env.get("XLA_FLAGS", "")
    ).strip()
    argv = [
        sys.executable, "-c", RUNNER,
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir, "-t", "2",
        "-p", "ont", "--disable_indel_calling", "true", "--chunk_num", "2",
        "--disable_verdict",
    ]
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=1800,
                          cwd="/root/repo", env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(f"CLI failed at {n_devices} devices")
    m = re.search(r"RunMetricsSummary: (\{.*\})", proc.stdout)
    summary = json.loads(m.group(1))
    with open(os.path.join(out_dir, "snv.vcf")) as f:
        body = [l for l in f if not l.startswith("#")]
    return summary, body


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/MULTICHIP_scaling.json")
    ap.add_argument("--genome_len", type=int, default=400_000)
    ap.add_argument("--seed", type=int, default=13)
    args = ap.parse_args()

    from clairs_to_tpu.bamio import simulate

    work = tempfile.mkdtemp(prefix="scaling_")
    ds = simulate.make_dataset(
        os.path.join(work, "data"), seed=args.seed,
        genome_len=args.genome_len, coverage=60, read_length=700,
        n_snv=40, n_germline=300, error_rate=0.008,
        somatic_hap_aware=True,
    )

    results = {}
    ref_body = None
    identical = True
    for n in (1, 2, 4, 8):
        summary, body = run_one(ds, os.path.join(work, f"out{n}"), n)
        if ref_body is None:
            ref_body = body
        elif body != ref_body:
            identical = False
        cands = summary["counters"].get("candidates", 0)
        secs = summary["stages"].get("calling", summary["total_seconds"])
        results[str(n)] = {
            "candidates": cands,
            "calling_seconds": round(secs, 2),
            "cand_per_sec": round(cands / secs, 1) if secs else None,
        }
        print(f"devices={n}: {results[str(n)]}", flush=True)

    artifact = {
        "kind": "virtual_cpu_mesh_scaling",
        "workload": f"{args.genome_len//1000}kb@60x ONT-like sim, "
                    f"seed {args.seed}",
        "vcf_identical_across_device_counts": identical,
        "n_calls": len(ref_body or []),
        "per_device_count": results,
        "note": "virtual devices share host cores; correctness artifact, "
                "not a hardware scaling measurement",
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
