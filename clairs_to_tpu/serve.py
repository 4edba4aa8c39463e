"""Resident calling server — warm-engine serving mode.

The reference is strictly batch (one `run_clairs_to` process per run); a
TPU deployment wants the opposite: compiled programs are expensive to
load once and free to reuse, so a production service keeps ONE resident
process per chip with the jitted dual-network engines warm and feeds it
request after request.  This module is that service:

    python -m clairs_to_tpu serve --port 8577 [--preload ont]

    POST /v1/call   {"argv": ["-T", "tumor.bam", "-R", "ref.fa",
                              "-o", "out", "-p", "ont", ...]}
        -> {"returncode": 0, "snv_vcf": ..., "seconds": ...,
            "engines_cached": true|false, "counters": {...}}
    GET  /health    -> {"status": "ok", "engines": [...], "uptime_s": ...}

``argv`` is the FULL run-subcommand flag surface (cli/run.py) — the
server parses it with the same parser, so anything the batch CLI can do a
request can do.  Engines are cached by their identity key (model paths,
device batch, indel on/off, matmul precision); the first request per key
pays the AOT/exec-cache load, every later one starts calling immediately
— on the tunneled dev TPU that removes a measured 8-90s per-run
server-side load tax (docs/SCALING.md).  A process-wide lock serializes
calls: one chip, one compute stream (cross-request batching would go
here for a multi-tenant deployment).
"""

import argparse
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_START = time.time()
_LOCK = threading.Lock()          # one chip -> one run at a time
_ENGINES = {}                     # key -> (snv_engine, indel_engine)


def _engine_key(args):
    """Everything that changes which compiled engines a run needs."""
    return (
        args.model_dir,
        args.snv_pileup_affirmative_model_path,
        args.snv_pileup_negational_model_path,
        args.indel_pileup_affirmative_model_path,
        args.indel_pileup_negational_model_path,
        args.snv_likelihood_matrix_data,
        args.indel_likelihood_matrix_data,
        args.device_batch,
        str(args.disable_indel_calling).lower(),
        getattr(args, "matmul_precision", "highest"),
        args.device_count,
    )


def _get_engines(args):
    """Load-or-reuse the engines for this request; returns
    ((snv, indel), cached_bool)."""
    from clairs_to_tpu.cli.run import load_engines
    from clairs_to_tpu.infer.engine import make_mesh

    key = _engine_key(args)
    hit = _ENGINES.get(key)
    if hit is not None:
        return hit, True
    import jax
    import numpy as np

    local = jax.local_devices()
    n_dev = min(args.device_count or len(local), len(local))
    mesh = make_mesh(local[:n_dev]) if n_dev > 1 else None
    snv_e, indel_e = load_engines(args, mesh=mesh)
    for eng in (snv_e, indel_e):
        if eng is not None:  # absorb the server-side first-execution load
            z = np.zeros((1, 33, 34), np.float32)
            c = np.ones((1,), np.float32)
            eng.run_batch(z, z, c, c)
    _ENGINES[key] = (snv_e, indel_e)
    return (snv_e, indel_e), False


def handle_call(payload):
    from clairs_to_tpu.cli.run import _main_impl, build_parser

    argv = payload.get("argv")
    if not isinstance(argv, list) or not argv:
        return 400, {"error": "body must be {\"argv\": [run flags...]}"}
    try:
        args = build_parser().parse_args([str(a) for a in argv])
    except SystemExit:
        return 400, {"error": "invalid run arguments", "argv": argv}
    t0 = time.time()
    with _LOCK:
        engines, cached = _get_engines(args)
        rc = _main_impl(args, engines=engines)
    out = {
        "returncode": int(rc or 0),
        "seconds": round(time.time() - t0, 2),
        "engines_cached": cached,
        "output_dir": args.output_dir,
        "snv_vcf": os.path.join(args.output_dir,
                                f"{args.snv_output_prefix}.vcf"),
    }
    log = os.path.join(args.output_dir, "run_clairs_to_tpu.log")
    try:
        with open(log) as f:
            for line in f:
                if "RunMetricsSummary:" in line:
                    out["metrics"] = json.loads(
                        line.split("RunMetricsSummary: ", 1)[1])
    except OSError:
        pass
    return 200, out


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            self._send(200, {
                "status": "ok",
                "uptime_s": round(time.time() - _START, 1),
                "engines": [" ".join(str(x) for x in k if x is not None)
                            for k in _ENGINES],
            })
        else:
            self._send(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path != "/v1/call":
            self._send(404, {"error": "unknown path"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._send(400, {"error": "invalid JSON body"})
            return
        try:
            code, obj = handle_call(payload)
        except Exception as e:  # noqa: BLE001 — a request must not kill the server
            code, obj = 500, {"error": f"{type(e).__name__}: {e}"}
        self._send(code, obj)

    def log_message(self, fmt, *a):  # quiet default request logging
        print(f"[serve] {self.address_string()} {fmt % a}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="clairs_to_tpu serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8577)
    ap.add_argument("--preload", default=None,
                    help="Platform to preload engines for at startup "
                         "(e.g. 'ont') so the first request is warm.")
    a = ap.parse_args(argv)

    from clairs_to_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    if a.preload:
        from clairs_to_tpu.cli.run import build_parser

        args = build_parser().parse_args(
            ["-T", "/dev/null", "-R", "/dev/null", "-o", "/tmp",
             "-p", a.preload])
        print(f"[serve] preloading engines for platform {a.preload} ...")
        _get_engines(args)
        print("[serve] engines ready")
    srv = ThreadingHTTPServer((a.host, a.port), _Handler)
    print(f"[serve] listening on http://{a.host}:{a.port} "
          f"(POST /v1/call, GET /health)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
