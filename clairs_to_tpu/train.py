"""Training + calibration for the dual-network ensemble.

The reference ships only trained pickles (no training code in-repo; the
hyperparameters live in shared/param.py:69-97).  This module provides a
TPU-native training loop for both networks plus likelihood-matrix
calibration, so the framework is self-contained end-to-end: simulate ->
train -> calibrate -> call -> benchmark.

Label semantics (derived from the posterior formula, call_variants.py:193-213):
  AFF class-1 of allele k = P(the somatic variant is allele k)
  NEG class-1 of allele k = P(the somatic variant is NOT allele k)
so a somatic site with alt C has AFF labels (0,1,0,0) and NEG labels
(1,0,1,1); a non-somatic site is all-zero / all-one.

Calibration builds the per-platform likelihood matrix the reference loads
from likelihood_matrix.txt (call_variants.py:655-796): for each allele, the
10x10 joint distribution of (p_aff, 1-p_neg) is summarized as
W[i][j] = P(somatic | bins i,j), with decile bin edges from the calibration
set.  ``save_likelihood_matrix`` writes the exact reference file layout.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clairs_to_tpu import config as cfg
from clairs_to_tpu.models import cvt, bigru
from clairs_to_tpu.ops.posterior import LikelihoodData


@dataclass
class TrainConfig:
    learning_rate: float = cfg.INITIAL_LEARNING_RATE
    weight_decay: float = cfg.WEIGHT_DECAY
    grad_clip: float = cfg.GRAD_NORM_CLIP
    batch_size: int = cfg.TRAIN_BATCH_SIZE
    epochs: int = cfg.MAX_EPOCH
    focal_gamma: float = 2.0       # param.py:73 apply_focal_loss
    dropout_rate: float = 0.3      # model.py:179,407 dropout_fc
    seed: int = 0


def focal_ce(logits, labels, gamma):
    """Per-allele focal cross-entropy; labels (B, A) in {0,1}."""
    logp = jax.nn.log_softmax(logits, axis=-1)            # (B, A, 2)
    onehot = jax.nn.one_hot(labels, 2)                    # (B, A, 2)
    pt = jnp.sum(onehot * jnp.exp(logp), axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    return jnp.mean(((1.0 - pt) ** gamma) * ce)


class DualTrainer:
    """Trains AFF (CvT) and NEG (BiGRU) on the same tensors."""

    def __init__(self, mode="snv", tc: TrainConfig = None,
                 cvt_config=None, bigru_config=None):
        self.tc = tc or TrainConfig()
        self.cvt_config = cvt_config or (
            cvt.SNV_CVT_CONFIG if mode == "snv" else cvt.INDEL_CVT_CONFIG
        )
        self.bigru_config = bigru_config or (
            bigru.SNV_BIGRU_CONFIG if mode == "snv" else bigru.INDEL_BIGRU_CONFIG
        )
        key = jax.random.PRNGKey(self.tc.seed)
        k1, k2 = jax.random.split(key)
        self.params = {
            "aff": cvt.init(k1, self.cvt_config),
            "neg": bigru.init(k2, self.bigru_config),
        }
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.tc.grad_clip),
            optax.adamw(self.tc.learning_rate, weight_decay=self.tc.weight_decay),
        )
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._step_impl)

    def _loss(self, params, x, x_neg, aff_labels, neg_labels, rng):
        dr = self.tc.dropout_rate
        ka, kn = jax.random.split(rng)
        la = cvt.forward(params["aff"], x, self.cvt_config, dropout_rate=dr, rng=ka)
        ln = bigru.forward(params["neg"], x_neg, self.bigru_config, dropout_rate=dr, rng=kn)
        g = self.tc.focal_gamma
        return focal_ce(la, aff_labels, g) + focal_ce(ln, neg_labels, g)

    def _step_impl(self, params, opt_state, x, x_neg, aff_labels, neg_labels, rng):
        loss, grads = jax.value_and_grad(self._loss)(
            params, x, x_neg, aff_labels, neg_labels, rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def fit(self, x, somatic_allele, epochs=None, batch_size=None, log_every=0,
            rescale_cov=None, positive_fraction=0.3, x_neg=None):
        """Train on tensors x (N,33,34) with per-site somatic allele index
        (-1 = not somatic).  Returns the loss history.

        ``x_neg`` supplies the negational network's view when it differs
        from x (the reference's dual-BQ asymmetry: AFF tensors use platform
        min_bq, NEG tensors min_bq=0 — run_clairs_to:1237 vs :1264).

        Candidate sets are extremely imbalanced (somatic sites are rare), so
        batches are class-balanced: ~``positive_fraction`` of each batch is
        drawn from somatic sites with replacement.
        """
        tc = self.tc
        epochs = epochs or tc.epochs
        batch_size = batch_size or tc.batch_size
        n = x.shape[0]
        n_all = len(self.cvt_config.alleles)
        aff_labels = np.zeros((n, n_all), np.int32)
        neg_labels = np.zeros((n, n_all), np.int32)
        som = np.asarray(somatic_allele)
        for k in range(n_all):
            aff_labels[:, k] = (som == k).astype(np.int32)
            neg_labels[:, k] = (som != k).astype(np.int32)
        x = np.asarray(x, np.float32)
        x_neg = x if x_neg is None else np.asarray(x_neg, np.float32)
        if rescale_cov is not None:
            scale = np.where(rescale_cov > 50, 50.0 / rescale_cov, 1.0).astype(np.float32)
            x = x * scale[:, None, None]
            if x_neg is not x:
                x_neg = x_neg * scale[:, None, None]
            else:
                x_neg = x
        rng = np.random.default_rng(tc.seed)
        pos_idx = np.where(som >= 0)[0]
        neg_idx = np.where(som < 0)[0]
        balanced = positive_fraction and len(pos_idx) and len(neg_idx)
        n_pos = int(batch_size * positive_fraction) if balanced else 0
        history = []
        steps = max(n // batch_size, 1)
        drop_key = jax.random.PRNGKey(tc.seed + 1)
        for ep in range(epochs):
            perm = rng.permutation(n)
            for s in range(steps):
                if balanced:
                    idx = np.concatenate([
                        rng.choice(pos_idx, size=n_pos, replace=True),
                        rng.choice(neg_idx, size=batch_size - n_pos, replace=True),
                    ])
                else:
                    idx = perm[s * batch_size : (s + 1) * batch_size]
                    if len(idx) < batch_size:  # keep shapes static: wrap
                        idx = np.concatenate([idx, perm[: batch_size - len(idx)]])
                drop_key, sub = jax.random.split(drop_key)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state,
                    jnp.asarray(x[idx]), jnp.asarray(x_neg[idx]),
                    jnp.asarray(aff_labels[idx]),
                    jnp.asarray(neg_labels[idx]), sub,
                )
            history.append(float(loss))
            if log_every and (ep + 1) % log_every == 0:
                print(f"[train] epoch {ep + 1}/{epochs} loss={float(loss):.4f}")
        return history

    def predict_probs(self, x, rescale_cov=None, batch_size=512, x_neg=None):
        """Class-1 softmax probs from both nets: (p_aff, p_neg), each (N, A)."""
        x = np.asarray(x, np.float32)
        x_neg = x if x_neg is None else np.asarray(x_neg, np.float32)
        if rescale_cov is not None:
            scale = np.where(rescale_cov > 50, 50.0 / rescale_cov, 1.0).astype(np.float32)
            x2 = x * scale[:, None, None]
            x_neg = x2 if x_neg is x else x_neg * scale[:, None, None]
            x = x2

        @jax.jit
        def fwd(params, xb, xnb):
            pa = jax.nn.softmax(cvt.forward(params["aff"], xb, self.cvt_config), axis=-1)
            pn = jax.nn.softmax(bigru.forward(params["neg"], xnb, self.bigru_config), axis=-1)
            return pa[..., 1], pn[..., 1]

        outs_a, outs_n = [], []
        n = x.shape[0]
        for i in range(0, n, batch_size):
            xb = x[i : i + batch_size]
            xnb = x_neg[i : i + batch_size]
            if xb.shape[0] < batch_size:
                pad = batch_size - xb.shape[0]
                xb = np.pad(xb, [(0, pad), (0, 0), (0, 0)])
                xnb = np.pad(xnb, [(0, pad), (0, 0), (0, 0)])
            pa, pn = fwd(self.params, jnp.asarray(xb), jnp.asarray(xnb))
            outs_a.append(np.asarray(pa))
            outs_n.append(np.asarray(pn))
        p_aff = np.concatenate(outs_a)[:n]
        p_neg = np.concatenate(outs_n)[:n]
        return p_aff, p_neg


def calibrate_likelihood(p_aff, p_neg, somatic_allele, n_alleles=4,
                         n_bins=10, smooth=1.0) -> LikelihoodData:
    """Build LikelihoodData from calibration predictions.

    W[k][i][j] = smoothed P(somatic-k | p_aff-bin i, (1-p_neg)-bin j); bin
    edges are per-allele deciles of the observed values (interior points,
    with exact 0/1 endpoints like the reference loader).
    """
    som = np.asarray(somatic_allele)
    matrices = np.zeros((n_alleles, n_bins, n_bins))
    aff_edges = np.zeros((n_alleles, n_bins + 1))
    neg_edges = np.zeros((n_alleles, n_bins + 1))
    for k in range(n_alleles):
        a = np.asarray(p_aff[:, k], np.float64)
        q = 1.0 - np.asarray(p_neg[:, k], np.float64)
        pts_a = np.quantile(a, np.linspace(0, 1, n_bins + 1)[1:-1])
        pts_q = np.quantile(q, np.linspace(0, 1, n_bins + 1)[1:-1])
        pts_a = np.clip(np.sort(pts_a), 1e-6, 1 - 1e-6)
        pts_q = np.clip(np.sort(pts_q), 1e-6, 1 - 1e-6)
        aff_edges[k] = np.concatenate([[0.0], pts_a, [1.0]])
        neg_edges[k] = np.concatenate([[0.0], pts_q, [1.0]])
        ai = np.clip(np.digitize(a, aff_edges[k]) - 1, 0, n_bins - 1)
        qi = np.clip(np.digitize(q, neg_edges[k]) - 1, 0, n_bins - 1)
        pos = som == k
        for i in range(n_bins):
            for j in range(n_bins):
                m = (ai == i) & (qi == j)
                npos = float(np.sum(pos & m))
                ntot = float(np.sum(m))
                matrices[k, i, j] = (npos + smooth) / (ntot + 2 * smooth)
    return LikelihoodData(matrices=matrices, aff_edges=aff_edges, neg_edges=neg_edges)


def save_likelihood_matrix(path, lik: LikelihoodData):
    """Write the reference likelihood_matrix.txt layout
    (call_variants.py:655-796): per-allele 10-row matrices, then per allele
    an AFF point row and a NEG point row (each padded with a dropped
    sentinel element)."""
    rows = [lik.matrices[k] for k in range(lik.n_alleles)]
    point_rows = []
    for k in range(lik.n_alleles):
        point_rows.append(np.concatenate([lik.aff_edges[k][1:-1], [1.0]]))
        point_rows.append(np.concatenate([lik.neg_edges[k][1:-1], [1.0]]))
    data = np.vstack([np.vstack(rows), np.vstack(point_rows)])
    np.savetxt(path, data)
    return path


def save_checkpoint(path, params, arch=None):
    """Flat .npz checkpoint of a params pytree.

    ``arch``: optional dict describing the architecture (kind + config
    fields) stored under '__arch__' so loaders can rebuild the right config
    without out-of-band information.
    """
    import json

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for keypath, leaf in flat:
        key = "/".join(str(k) for k in keypath)
        arrays[key] = np.asarray(leaf)
    if arch is not None:
        arrays["__arch__"] = np.frombuffer(
            json.dumps(arch).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **arrays)
    return path


def checkpoint_arch(path):
    """Read the '__arch__' metadata dict from a checkpoint, or None."""
    import json

    data = np.load(path)
    if "__arch__" not in data.files:
        return None
    return json.loads(bytes(data["__arch__"]).decode())


def load_checkpoint(path, like_params):
    """Load a .npz checkpoint into the structure of ``like_params``.

    ``like_params`` only provides tree structure — ShapeDtypeStruct leaves
    (jax.eval_shape output) work.  Arrays are loaded host-side and shipped
    in ONE device_put (a per-leaf jnp.asarray loop costs one backend
    round-trip per parameter — minutes on a tunneled TPU)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like_params)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(k) for k in keypath)
        leaves.append(np.asarray(data[key]))
    host_tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like_params), leaves
    )
    return jax.device_put(host_tree)


def load_checkpoint_auto(path, mode="snv", kind="cvt"):
    """Load a checkpoint, rebuilding its architecture from '__arch__' (or
    the default flagship config when absent).  Returns (params, config)."""
    from clairs_to_tpu.models import bigru as bigru_mod
    from clairs_to_tpu.models import cvt as cvt_mod

    arch = checkpoint_arch(path)
    if kind == "cvt":
        if arch:
            config = cvt_mod.CvTConfig(
                **{k: tuple(v) if isinstance(v, list) else v
                   for k, v in arch.items() if k != "kind"}
            )
        else:
            config = cvt_mod.SNV_CVT_CONFIG if mode == "snv" else cvt_mod.INDEL_CVT_CONFIG
        # eval_shape: tree structure only, no device computation — running
        # the real init dispatches hundreds of tiny PRNG programs, which
        # costs minutes per process on a remote/tunneled TPU backend
        like = jax.eval_shape(lambda: cvt_mod.init(jax.random.PRNGKey(0), config))
    else:
        if arch:
            config = bigru_mod.BiGRUConfig(
                **{k: tuple(v) if isinstance(v, list) else v
                   for k, v in arch.items() if k != "kind"}
            )
        else:
            config = (
                bigru_mod.SNV_BIGRU_CONFIG if mode == "snv" else bigru_mod.INDEL_BIGRU_CONFIG
            )
        like = jax.eval_shape(lambda: bigru_mod.init(jax.random.PRNGKey(1), config))
    return load_checkpoint(path, like), config
