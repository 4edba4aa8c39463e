"""Benchmark: fused dual-network somatic-calling throughput on TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: candidate sites scored per second through the full fused device
program (depth rescale -> CvT + BiGRU forward -> softmax -> Bayesian
posterior -> argmax + QUAL).  Baseline: the reference scores candidates with
torch-CPU at batch 250 and 1 thread/process (clairs/predict.py:475,
shared/param.py:85); measured on this host (see BASELINE.md — no published
throughput exists), a single reference process sustains ~O(100-200)
candidates/s; vs_baseline reports against a fixed 150 cand/s/process figure.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REFERENCE_CANDIDATES_PER_SEC = 150.0  # torch-CPU single-process figure


def main():
    import jax
    import jax.numpy as jnp

    from clairs_to_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from clairs_to_tpu.models import cvt, bigru
    from clairs_to_tpu.ops import posterior as post

    batch = 2048
    use_pallas = jax.default_backend() == "tpu"
    aff_params = cvt.init(jax.random.PRNGKey(0))
    neg_params = bigru.init(jax.random.PRNGKey(1))
    lik = post.uniform_likelihood_data(4)
    lik_mat = jnp.asarray(lik.matrices, jnp.float32)
    aff_edges = jnp.asarray(lik.aff_edges, jnp.float32)
    neg_edges = jnp.asarray(lik.neg_edges, jnp.float32)

    @jax.jit
    def step(aff_p, neg_p, x_aff, x_neg, cov):
        scale = jnp.where(cov > 50.0, 50.0 / cov, 1.0).astype(jnp.float32)
        xa = x_aff * scale[:, None, None]
        xn = x_neg * scale[:, None, None]
        pa = jax.nn.softmax(cvt.forward(aff_p, xa), axis=-1)[..., 1]
        pn = jax.nn.softmax(
            bigru.forward(neg_p, xn, use_pallas=use_pallas), axis=-1
        )[..., 1]
        posterior = post.posterior_probs_jnp(pa, pn, lik_mat, aff_edges, neg_edges)
        best = jnp.argmax(posterior, axis=1)
        qual = post.quality_score_jnp(jnp.max(posterior, axis=1))
        return best, qual

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-40, 40, size=(batch, 33, 34)), jnp.float32)
    cov = jnp.asarray(rng.integers(10, 120, size=(batch,)), jnp.float32)

    # warmup/compile
    out = step(aff_params, neg_params, x, x, cov)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(aff_params, neg_params, x, x, cov)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    cand_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "candidates_scored_per_sec",
                "value": round(cand_per_sec, 1),
                "unit": "candidates/s/chip",
                "vs_baseline": round(cand_per_sec / REFERENCE_CANDIDATES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
