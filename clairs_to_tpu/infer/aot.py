"""Ahead-of-time compilation + serialized-executable cache for the engine.

Why this exists: the reference's torch-CPU predictor starts calling within
seconds of process start (/root/reference/run_clairs_to:1181-1317 — no
compile step), while a fresh JAX process pays the XLA compile of the
dual-network forward.  Two measured facts on the tunneled TPU drive the
design (round-3 diagnosis):

  * the jit-dispatch compile of the production ``_forward`` is slow
    (~290 s/engine) and its persistent-cache key was observed to differ
    across otherwise identical CLI processes;
  * the AOT path (``jit(f).lower(args).compile()``) compiles the same
    program in ~25 s, its persistent-cache key IS stable across processes
    (second process: 0.9 s), and the compiled executable round-trips
    through ``jax.experimental.serialize_executable``.

So engines compile AOT at construction time, with two cache layers:

  1. our own serialized-executable file, keyed by a *self-computed* stable
     digest (model config + shapes + precision + backend identity) —
     immune to any volatility in JAX's internal cache key;
  2. the persistent XLA compilation cache (utils/jaxcache.py), which the
     AOT path hits reliably.

Cold start ≈ 25 s/engine, warm start ≈ 2-5 s/engine, either way the first
candidate batch runs immediately afterwards.
"""

import hashlib
import json
import os
import pickle
import zlib

_EXEC_CACHE_ENV = "CLAIRS_TO_TPU_EXEC_CACHE"
_DEFAULT_EXEC_CACHE = os.path.expanduser("~/.cache/clairs_to_tpu_exec")
_FORMAT_VERSION = 1


def exec_cache_dir():
    return os.environ.get(_EXEC_CACHE_ENV, _DEFAULT_EXEC_CACHE)


def aot_enabled():
    """AOT + exec cache is for real accelerator backends; CPU (tests,
    multi-device dryruns) compiles in seconds and would churn cache files
    for every tiny test config."""
    flag = os.environ.get("CLAIRS_TO_TPU_AOT", "auto")
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    import jax

    return jax.default_backend() == "tpu"


def stable_exec_key(desc: dict) -> str:
    """Self-computed cache key: everything that shapes the compiled program.

    Includes backend identity (platform, platform_version, device kind,
    jaxlib version) so a runtime/compiler upgrade or different TPU
    generation never reuses a stale executable.
    """
    import jax

    dev = jax.devices()[0]
    full = dict(desc)
    full.update(
        format=_FORMAT_VERSION,
        jax_version=jax.__version__,
        platform=dev.platform,
        platform_version=getattr(dev.client, "platform_version", ""),
        device_kind=getattr(dev, "device_kind", ""),
        n_devices=desc.get("n_devices", 1),
    )
    blob = json.dumps(full, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:32]


def _exec_path(key):
    return os.path.join(exec_cache_dir(), f"fwd_{key}.exec")


def load_serialized(key):
    """Deserialize a cached executable; None on any failure (compat drift,
    truncated file, backend refusal) — callers fall back to AOT compile."""
    path = _exec_path(key)
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            blob = pickle.loads(zlib.decompress(f.read()))
        return se.deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"]
        )
    except Exception as e:  # noqa: BLE001 — any failure means "rebuild"
        print(f"[INFO] AOT exec cache unusable ({type(e).__name__}: {e}); "
              "recompiling")
        try:
            os.unlink(path)
        except OSError:
            pass
        return None


def save_serialized(key, compiled):
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(exec_cache_dir(), exist_ok=True)
        tmp = _exec_path(key) + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(zlib.compress(pickle.dumps(
                {"payload": payload, "in_tree": in_tree, "out_tree": out_tree}
            ), level=1))
        os.replace(tmp, _exec_path(key))
    except Exception as e:  # noqa: BLE001 — cache write is best-effort
        print(f"[INFO] AOT exec cache write failed ({type(e).__name__}: {e})")


def load_or_compile(jitted, example_args, desc, verbose=True):
    """Return a callable with the jitted function's signature, compiled AOT.

    Layer 1: serialized-executable file keyed by ``stable_exec_key(desc)``.
    Layer 2: ``jitted.lower(*args).compile()`` — hits the persistent XLA
    cache with a process-stable key (measured; the jit-dispatch key is not).
    """
    key = stable_exec_key(desc)
    compiled = load_serialized(key)
    if compiled is not None:
        if verbose:
            print(f"[INFO] engine executable loaded from cache ({key[:12]})")
        return compiled
    import time

    t0 = time.perf_counter()
    compiled = jitted.lower(*example_args).compile()
    if verbose:
        print(f"[INFO] engine AOT compile: {time.perf_counter()-t0:.1f}s "
              f"({key[:12]})")
    save_serialized(key, compiled)
    return compiled
