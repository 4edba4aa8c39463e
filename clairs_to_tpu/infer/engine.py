"""Fused dual-network inference engine.

Replaces the reference's predict.py + call_variants.py process pair
(/root/reference/clairs/predict.py:452-718, clairs/call_variants.py:620-853)
with a single jitted device program:

    (B,33,34) AFF counts, (B,33,34) NEG counts, coverages
      -> depth rescale (predict.py:177-197: scale by 50/cov when cov>50)
      -> CvT logits  +  BiGRU logits
      -> per-allele softmax (class-1 prob)
      -> fused Bayesian posterior + QUAL (ops/posterior.py)

The posterior/QUAL also run on the host in float64 for exact parity with the
reference's scalar math (the host path is what feeds the VCF writer; the
device path serves the pure-TPU benchmark/serving loop).

Batches are padded to a static ``device_batch`` so XLA compiles exactly one
program; padded rows are masked out on the host side.  Data-parallel scaling
shards the batch axis across a 1-D ``jax.sharding.Mesh`` with replicated
params (models are ~4M params — DP is the only sensible parallelism; see
SURVEY.md §5.8).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clairs_to_tpu import config as cfg
from clairs_to_tpu.infer import aot
from clairs_to_tpu.models import cvt, bigru
from clairs_to_tpu.ops import posterior as post


@dataclass
class BatchResult:
    """Host-side per-candidate results (valid rows only)."""

    p_aff: np.ndarray        # (N, n_alleles) float32 — class-1 softmax of AFF
    p_neg: np.ndarray        # (N, n_alleles) float32 — class-1 softmax of NEG
    posterior: np.ndarray    # (N, n_alleles) float64 — exact host posterior
    forward_acgt: np.ndarray   # (N, 4) int — FAU..FTU recovered strand counts
    reverse_acgt: np.ndarray   # (N, 4) int — RAU..RTU


def _rescale(x, coverage, min_rescale_cov):
    # predict.py:177-197: multiply all channels by min_rescale_cov/cov
    # when cov > min_rescale_cov (float32 multiply, matching the reference).
    scale = jnp.where(
        coverage > min_rescale_cov, min_rescale_cov / coverage, 1.0
    ).astype(jnp.float32)
    return x * scale[:, None, None]


def recover_strand_counts(aff_raw_center):
    """Recover FAU..FTU / RAU..RTU from the raw AFF tensor's center row.

    The tensor encodes the reference base's count as the negated sum of its
    ACGT block (create_tensor_pileup_calling.py:223-228); predict.py:626-642
    undoes it: for each row with a negative entry, replace it by -(row sum).

    Args:
      aff_raw_center: (B, 34) float/int — the unrescaled center position row.
    Returns:
      (forward (B,4) int64, reverse (B,4) int64)
    """
    out = []
    for sl in (slice(0, 4), slice(9, 13)):
        block = np.asarray(aff_raw_center[:, sl], dtype=np.float64)
        # every negative entry in a row becomes -(row sum) — vectorized
        # (the reference fixes one negative per row; rows without one pass
        # through unchanged because the where mask is empty there)
        row_sums = block.sum(axis=1)
        fixed = np.where(block < 0, -row_sums[:, None], block)
        out.append(np.rint(fixed).astype(np.int64))
    return out[0], out[1]


class InferenceEngine:
    """Jit-compiled dual-network engine for one variant type (snv|indel)."""

    def __init__(
        self,
        aff_params,
        neg_params,
        likelihood: post.LikelihoodData,
        mode: str = "snv",
        device_batch: int = cfg.TPU_DEVICE_BATCH,
        min_rescale_cov: float = float(cfg.MIN_RESCALE_COV),
        mesh: Optional[Mesh] = None,
        cvt_config=None,
        bigru_config=None,
        use_pallas: Optional[bool] = None,
        matmul_precision: str = "highest",
    ):
        assert mode in ("snv", "indel")
        self.mode = mode
        self.cvt_config = cvt_config or (
            cvt.SNV_CVT_CONFIG if mode == "snv" else cvt.INDEL_CVT_CONFIG
        )
        self.bigru_config = bigru_config or (
            bigru.SNV_BIGRU_CONFIG if mode == "snv" else bigru.INDEL_BIGRU_CONFIG
        )
        self.n_alleles = len(self.cvt_config.alleles)
        if mesh is not None and device_batch % mesh.size:
            # the padded batch axis must shard evenly across the mesh
            device_batch = -(-device_batch // mesh.size) * mesh.size
        self.device_batch = device_batch
        self.min_rescale_cov = min_rescale_cov
        # fused VMEM-resident GRU recurrence (ops/gru_pallas.py): 1.31x over
        # lax.scan on the v5e; auto-on when the default backend is a TPU
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # "highest": fp32-exact MXU passes, numerical parity with the torch
        # reference; "default": single-pass bf16-input MXU — ~same decisions
        # (posterior digitizes into 10 coarse bins), much faster on TPU
        self.matmul_precision = matmul_precision
        self.likelihood = likelihood
        self.mesh = mesh

        self._lik_mat = jnp.asarray(likelihood.matrices, jnp.float32)
        self._aff_edges = jnp.asarray(likelihood.aff_edges, jnp.float32)
        self._neg_edges = jnp.asarray(likelihood.neg_edges, jnp.float32)

        if mesh is not None:
            self._data_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())
            self.aff_params = jax.device_put(aff_params, self._replicated)
            self.neg_params = jax.device_put(neg_params, self._replicated)
        else:
            self._data_sharding = None
            # commit params to the device once — otherwise every forward
            # re-transfers ~35 MB of host numpy through the (tunneled) PCIe
            self.aff_params = jax.device_put(aff_params)
            self.neg_params = jax.device_put(neg_params)

        # production wire format: int16 AFF counts + int16 NEG-minus-AFF
        # delta, NEG reconstructed on device.  Counts are depth-bounded small
        # integers (create_tensor stores them as ints; rescale to float
        # happens on device), so the f32 wire encoding wasted 2-2.7x of the
        # tunnel/PCIe bytes per batch — the round-4 profile's device_infer
        # was ~95% transfer.  The reference-encoding is linear per row
        # (ref channel := -(block sum), create_tensor:223-228), hence
        # encoded(NEG) == encoded(AFF) + encoded(NEG-AFF) exactly.
        self._forward = jax.jit(self._forward_delta_impl)
        self._forward_full = jax.jit(self._forward_impl)   # float fallback
        self._forward_fused = jax.jit(self._forward_fused_impl)
        self._zero_delta = None   # device-resident int16 zeros, lazy
        if aot.aot_enabled():
            try:
                self._aot_prepare()
            except Exception as e:  # noqa: BLE001 — AOT is an optimization
                print(f"[INFO] AOT compile unavailable "
                      f"({type(e).__name__}: {e}); using jit dispatch")

    def _aot_prepare(self):
        """AOT-compile ``_forward`` at construction (infer/aot.py).

        Replaces the first-batch jit compile — measured ~290 s/engine on the
        tunneled v5e with an unreliable persistent-cache key — with a ~25 s
        cold / ~2 s warm ahead-of-time compile keyed stably."""
        B = self.device_batch
        x = np.zeros((B, 34, 34), np.int16)
        d = np.zeros((B, 33, 34), np.int16)
        if self._data_sharding is not None:
            # compile for the shardings run_batch actually passes — a
            # Compiled rejects inputs whose shardings disagree with the
            # ones it was lowered with
            x = jax.device_put(x, self._data_sharding)
            d = jax.device_put(d, self._data_sharding)
        desc = dict(
            program="forward_packed_p1",   # packed int16 in, stacked class-1 out
            mode=self.mode,
            cvt_config=repr(self.cvt_config),
            bigru_config=repr(self.bigru_config),
            device_batch=B,
            matmul_precision=self.matmul_precision,
            use_pallas=self.use_pallas,
            min_rescale_cov=self.min_rescale_cov,  # traced constant
            n_devices=self.mesh.size if self.mesh is not None else 1,
            transfer="aff_i16+delta_i16",   # wire format of the program
        )
        self._forward = aot.load_or_compile(
            self._forward, (self.aff_params, self.neg_params, x, d),
            desc,
        )

    # ---- device programs ------------------------------------------------
    def _net_probs(self, aff_params, neg_params, x_aff, x_neg, cov_aff, cov_neg):
        with jax.default_matmul_precision(self.matmul_precision):
            x_aff = _rescale(x_aff.astype(jnp.float32), cov_aff, self.min_rescale_cov)
            x_neg = _rescale(x_neg.astype(jnp.float32), cov_neg, self.min_rescale_cov)
            logits_aff = cvt.forward(aff_params, x_aff, self.cvt_config)
            logits_neg = bigru.forward(neg_params, x_neg, self.bigru_config,
                                       use_pallas=self.use_pallas)
            probs_aff = jax.nn.softmax(logits_aff, axis=-1)
            probs_neg = jax.nn.softmax(logits_neg, axis=-1)
        return probs_aff, probs_neg

    def _stack_p1(self, probs_aff, probs_neg):
        # ONE output array per slice: the tunneled chip charges ~100-300 ms
        # of round-trip latency PER host fetch (measured round 5), so the
        # two (B,A,2) softmax outputs are fused into a single (B,2,A) of
        # class-1 probabilities — all the host posterior consumes (class-0
        # is 1−p by construction; the reference's predict TSV prints it as
        # such, predict.py:121-132)
        return jnp.stack((probs_aff[..., 1], probs_neg[..., 1]), axis=1)

    def _forward_impl(self, aff_params, neg_params, x_aff, x_neg, cov_aff, cov_neg):
        probs_aff, probs_neg = self._net_probs(
            aff_params, neg_params, x_aff, x_neg, cov_aff, cov_neg
        )
        return self._stack_p1(probs_aff, probs_neg)

    def _forward_delta_impl(self, aff_params, neg_params, packed, x_delta):
        """Production wire program: ONE packed int16 input + NEG delta.

        ``packed`` (B,34,34) int16: rows 0-32 the AFF count tensor, row 33
        column 0/1 the AFF/NEG coverages (integral depths).  ``x_delta``
        (B,33,34) int16 = NEG − AFF (exact: counts are integers and the
        reference encoding is linear per row).  Packing exists because the
        tunneled chip charges ~15-20 ms of fixed overhead PER host->device
        transfer (measured round 5) — one buffer per slice instead of four.
        The f32 adds happen before rescale, so numerics equal the full-view
        path bit-for-bit for integral counts (exact in f32 below 2^24).
        """
        x_aff = packed[:, :33, :]
        cov_aff = packed[:, 33, 0].astype(jnp.float32)
        cov_neg = packed[:, 33, 1].astype(jnp.float32)
        x_neg = x_aff.astype(jnp.float32) + x_delta.astype(jnp.float32)
        probs_aff, probs_neg = self._net_probs(
            aff_params, neg_params, x_aff, x_neg, cov_aff, cov_neg
        )
        return self._stack_p1(probs_aff, probs_neg)

    def _forward_fused_impl(self, aff_params, neg_params, x_aff, x_neg, cov_aff, cov_neg):
        """Forward + posterior + argmax + QUAL, all on device (bench path)."""
        probs_aff, probs_neg = self._net_probs(
            aff_params, neg_params, x_aff, x_neg, cov_aff, cov_neg
        )
        p = probs_aff[..., 1]
        q = probs_neg[..., 1]
        posterior = post.posterior_probs_jnp(
            p, q, self._lik_mat, self._aff_edges, self._neg_edges
        )
        best = jnp.argmax(posterior, axis=1)
        best_p = jnp.max(posterior, axis=1)
        qual = post.quality_score_jnp(best_p)
        return posterior, best, qual

    # ---- host API -------------------------------------------------------
    def _pad(self, arr, value=0):
        n = arr.shape[0]
        if n == self.device_batch:
            return arr
        pad_width = [(0, self.device_batch - n)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width, constant_values=value)

    def _put(self, arr):
        if self._data_sharding is not None:
            return jax.device_put(arr, self._data_sharding)
        return arr

    def _intify(self, arr):
        """int16 wire encoding of a count tensor, or None when unsafe.

        Counts are depth-bounded small integers; a float input qualifies
        only when every value is integral and within int16 (the cast-and-
        compare catches both — wrap-around and fractions mismatch)."""
        if arr.dtype == np.int16:
            return arr
        if arr.dtype.kind in "iu":
            if arr.size and (int(arr.max()) >= 32768 or int(arr.min()) < -32768):
                return None
            return arr.astype(np.int16)
        if arr.dtype.kind == "f":
            xi = arr.astype(np.int16)
            if bool((xi == arr).all()):
                return xi
            return None
        return None

    def _zero_delta_dev(self):
        """Device-resident int16 zero delta: identical AFF/NEG views (ilmn,
        hifi — run_clairs_to:1248-1252's symlink) ship ONE tensor per batch;
        the zero 'delta' transfers once per process, not per call."""
        if self._zero_delta is None:
            z = np.zeros((self.device_batch, 33, 34), np.int16)
            if self._data_sharding is not None:
                self._zero_delta = jax.device_put(z, self._data_sharding)
            else:
                self._zero_delta = jax.device_put(z)
        return self._zero_delta

    def run_batch(self, x_aff, x_neg, cov_aff, cov_neg) -> BatchResult:
        """Full-precision path: device forward, host float64 posterior.

        Synchronous convenience wrapper over ``run_batch_async`` — see
        there for the wire format and pipelining story.
        """
        return self.run_batch_async(x_aff, x_neg, cov_aff, cov_neg).result()

    def run_batch_async(self, x_aff, x_neg, cov_aff, cov_neg) -> "PendingBatch":
        """Dispatch a batch; the returned PendingBatch's .result() waits.

        Args: raw (unrescaled) count tensors (N,33,34) and coverages (N,).
        Arbitrary N: inputs larger than ``device_batch`` are processed in
        fixed-shape slices (one compiled program, no retraces).

        Wire format: int16 AFF + int16 (NEG−AFF) delta, NEG reconstructed
        on device (exact — integral counts, linear reference encoding); the
        f32 full-view program remains as the fallback for non-integral
        inputs or pileups deeper than int16 (never seen in practice).

        The async split exists because the tunneled chip charges a multi-
        hundred-ms round trip per batch: callers dispatch chunk N+1 (or do
        other host work) between dispatch and result of chunk N, hiding
        the wait entirely (cli/run.py's chunk loop).
        """
        n = x_aff.shape[0]
        identity = x_neg is x_aff
        x_aff = np.asarray(x_aff)
        cov_aff = np.asarray(cov_aff)
        cov_neg = cov_aff if cov_neg is cov_aff else np.asarray(cov_neg)
        xa16 = self._intify(x_aff)
        ca16 = self._intify(cov_aff) if xa16 is not None else None
        cn16 = (ca16 if cov_neg is cov_aff else
                (self._intify(cov_neg) if ca16 is not None else None))
        use_int = xa16 is not None and ca16 is not None and cn16 is not None
        d16 = None
        if use_int and not identity:
            xn16 = self._intify(np.asarray(x_neg))
            if xn16 is None:
                use_int = False
            else:
                delta = xn16.astype(np.int32) - xa16
                if delta.size and (int(delta.max()) >= 32768
                                   or int(delta.min()) < -32768):
                    use_int = False
                else:
                    d16 = delta.astype(np.int16)
        if use_int:
            # one packed buffer: AFF rows + coverage row (see
            # _forward_delta_impl).  Row 33 cols 2.. are never read by the
            # program — np.empty leaves them unset on purpose.
            packed = np.empty((n, 34, 34), np.int16)
            packed[:, :33, :] = xa16
            packed[:, 33, 0] = ca16
            packed[:, 33, 1] = cn16
        # software pipeline: DISPATCH every fixed-shape slice first (jax
        # dispatch and device_put are async), then consume in order — the
        # host's f64 posterior + transfers of slice k overlap the device
        # compute of slices k+1.., instead of ping-ponging (the round-3
        # profile's per-slice serialization on the tunneled chip)
        import os as _os
        import time as _t
        _prof = _os.environ.get("CLAIRS_ENGINE_PROFILE") == "1"
        _tp0 = _t.perf_counter()
        handles = []
        for i in range(0, n, self.device_batch):
            sl = slice(i, i + self.device_batch)
            ni = min(self.device_batch, n - i)
            if use_int:
                pk = self._put(self._pad(packed[sl]))
                xd = (self._zero_delta_dev() if d16 is None
                      else self._put(self._pad(d16[sl])))
                p1 = self._forward(self.aff_params, self.neg_params, pk, xd)
            else:
                ca = self._put(self._pad(np.asarray(cov_aff[sl], np.float32),
                                         value=1))
                cn = ca if cov_neg is cov_aff else self._put(
                    self._pad(np.asarray(cov_neg[sl], np.float32), value=1))
                xa = self._put(self._pad(np.asarray(x_aff[sl], np.float32)))
                xn = xa if identity else self._put(
                    self._pad(np.asarray(x_neg[sl], np.float32)))
                p1 = self._forward_full(
                    self.aff_params, self.neg_params, xa, xn, ca, cn)
            handles.append((ni, sl, p1))
        # start the d2h copies of EVERY slice before consuming any: the
        # tunneled chip's per-fetch round-trip is ~100-300 ms, so
        # synchronous per-slice fetches serialize into seconds — async
        # copies overlap each other and the remaining device compute
        # (np.asarray on these outputs is also pathologically slow —
        # measured 1.2-4 s per call on AOT-executable outputs — so
        # _consume uses jax.device_get)
        _tp1 = _t.perf_counter()
        for (_, _, p1) in handles:
            try:
                p1.copy_to_host_async()
            except AttributeError:
                break
        if _prof:
            print(f"[engine_profile] n={n} use_int={use_int} "
                  f"slices={len(handles)} dispatch={_tp1 - _tp0:.3f}s")
        return PendingBatch(self, handles, x_aff)


    def _consume(self, n, x_aff_slice, p1) -> BatchResult:
        # the reference round-trips probabilities through '%.8f' text between
        # predict and call_variants (predict.py:121-132); match that rounding
        # so the float64 posterior sees identical inputs.  device_get (not
        # np.asarray-with-dtype): fetch f32 bytes, convert on host — asarray
        # on compiled-executable outputs costs seconds over the tunnel.
        p1h = jax.device_get(p1).astype(np.float64)
        p_aff = np.round(p1h[:n, 0], 8)
        p_neg = np.round(p1h[:n, 1], 8)
        posterior = post.posterior_probs_np(p_aff, p_neg, self.likelihood)
        fwd, rev = recover_strand_counts(
            np.asarray(x_aff_slice)[:, cfg.FLANKING_BASE_NUM, :])
        return BatchResult(
            p_aff=p_aff,
            p_neg=p_neg,
            posterior=posterior,
            forward_acgt=fwd,
            reverse_acgt=rev,
        )

    def run_batch_fused(self, x_aff, x_neg, cov_aff, cov_neg):
        """Pure-device path (posterior+argmax+QUAL on TPU); returns device arrays."""
        xa = self._put(self._pad(np.asarray(x_aff, np.float32)))
        xn = self._put(self._pad(np.asarray(x_neg, np.float32)))
        ca = self._put(self._pad(np.asarray(cov_aff, np.float32), value=1))
        cn = self._put(self._pad(np.asarray(cov_neg, np.float32), value=1))
        return self._forward_fused(self.aff_params, self.neg_params, xa, xn, ca, cn)


class PendingBatch:
    """A dispatched run_batch: device slices in flight, host copies started."""

    def __init__(self, engine, handles, x_aff):
        self._engine = engine
        self._handles = handles
        self._x_aff = x_aff
        self._result = None

    def result(self) -> BatchResult:
        if self._result is not None:
            return self._result
        parts = [self._engine._consume(ni, self._x_aff[sl], p1)
                 for (ni, sl, p1) in self._handles]
        if len(parts) == 1:
            res = parts[0]
        else:
            res = BatchResult(
                p_aff=np.concatenate([p.p_aff for p in parts]),
                p_neg=np.concatenate([p.p_neg for p in parts]),
                posterior=np.concatenate([p.posterior for p in parts]),
                forward_acgt=np.concatenate([p.forward_acgt for p in parts]),
                reverse_acgt=np.concatenate([p.reverse_acgt for p in parts]),
            )
        self._result = res
        self._handles = None
        self._x_aff = None
        return res

def make_mesh(devices=None, axis_name="data") -> Mesh:
    """1-D data-parallel mesh over all local devices (SURVEY.md §5.8)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))
