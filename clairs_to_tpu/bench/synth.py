"""Direct pileup-tensor synthesis for network training.

The reference trains on millions of labeled tensors extracted from real BAMs
(unavailable here).  This generator samples (33, 34) tensors straight from
the tensor specification (create_tensor_pileup_calling.py channel layout +
negative ref encoding), with class-conditional center columns:

  class 0: reference site        (alt = sequencing error only)
  class 1: germline het          (alt AF ~ 0.5)
  class 2: germline hom          (alt AF ~ 1.0)
  class 3: somatic               (alt AF in [0.05, 0.45])  -> positive label

Flanking columns are reference sites with errors plus occasional germline
SNPs.  Because ref bases are redrawn per sample, networks trained on this
stream cannot memorize genome context and must learn the allele-frequency /
strand / error-pattern rule — which transfers to tensors derived from
simulated (or real) BAMs.
"""

import numpy as np

from clairs_to_tpu import config as cfg

FLANK = cfg.FLANKING_BASE_NUM
WIN = cfg.NO_OF_POSITIONS
_CH = cfg.CHANNEL_INDEX


def _fill_column(t, col, ref_idx, depth, alt_idx=None, alt_count=0, rng=None,
                 error_rate=0.002):
    """Fill one position column with fwd/rev strand-split counts."""
    counts = np.zeros(4, np.int64)
    counts[ref_idx] = depth
    if alt_idx is not None and alt_count > 0:
        take = min(alt_count, depth)
        counts[ref_idx] -= take
        counts[alt_idx] += take
    # sequencing errors: move ~error_rate of bases to random other bases
    n_err = rng.binomial(depth, error_rate)
    for _ in range(n_err):
        src = rng.choice(np.nonzero(counts)[0]) if counts.sum() else ref_idx
        dst = rng.integers(0, 4)
        if counts[src] > 0 and dst != src:
            counts[src] -= 1
            counts[dst] += 1
    fwd = rng.binomial(counts, 0.5)
    rev = counts - fwd
    t[col, 0:4] = fwd
    t[col, 9:13] = rev


def _encode_ref(t, col, ref_idx):
    t[col, ref_idx] = -t[col, 0:4].sum()
    t[col, 9 + ref_idx] = -t[col, 9:13].sum()
    # LMQ/LBQ blocks are zero in this generator; their ref encoding is -0=0.


def synthesize_batch(
    rng,
    n,
    depth_range=(20, 100),
    somatic_af_range=(0.05, 0.45),
    flank_germline_rate=0.02,
    error_rate=0.002,
    class_probs=(0.45, 0.2, 0.05, 0.3),
    mode="snv",
    beta_subsample=False,
):
    """Returns (x (n,33,34) float32, cov (n,), somatic_allele (n,) int32).

    mode='snv': classes ref / germline-het / germline-hom / somatic-SNV
    (label = alt base index 0-3).  mode='indel': the somatic class splits
    evenly into SNV (negative for the 6-allele nets), insertion (label 4,
    I/I1 channels) and deletion (label 5, D/D1 + '*' placeholder columns).

    beta_subsample=True draws per-sample depth as max_depth x Beta(2.08,5.08)
    instead of uniform in depth_range — the reference's training-time coverage
    subsampling distribution (shared/param.py:98-115 beta_acc_per).
    """
    x = np.zeros((n, WIN, cfg.PILEUP_CHANNEL_SIZE), np.float32)
    cov = np.zeros(n, np.float32)
    som = np.full(n, -1, np.int32)
    classes = rng.choice(4, size=n, p=class_probs)
    for i in range(n):
        t = np.zeros((WIN, cfg.PILEUP_CHANNEL_SIZE), np.int64)
        if beta_subsample:
            depth = max(int(depth_range[1] * cfg.beta_subsample_fraction(rng)),
                        depth_range[0])
        else:
            depth = int(rng.integers(*depth_range))
        ref_indices = rng.integers(0, 4, size=WIN)
        for col in range(WIN):
            if col == FLANK:
                continue
            d = max(int(rng.normal(depth, depth * 0.06)), 4)
            if rng.random() < flank_germline_rate:
                alt = (ref_indices[col] + rng.integers(1, 4)) % 4
                ac = rng.binomial(d, 0.5)
                _fill_column(t, col, ref_indices[col], d, alt, ac, rng, error_rate)
            else:
                _fill_column(t, col, ref_indices[col], d, rng=rng, error_rate=error_rate)
            _encode_ref(t, col, ref_indices[col])

        ref_idx = int(ref_indices[FLANK])
        klass = classes[i]
        alt_idx = (ref_idx + int(rng.integers(1, 4))) % 4
        indel_kind = None  # 'ins' | 'del' for mode='indel' somatic class
        if klass == 0:
            af = 0.0
        elif klass == 1:
            af = float(np.clip(rng.normal(0.5, 0.03), 0.35, 0.65))
        elif klass == 2:
            af = float(np.clip(rng.normal(1.0, 0.01), 0.9, 1.0))
        else:
            af = float(rng.uniform(*somatic_af_range))
            if mode == "indel":
                indel_kind = ("snv", "ins", "del")[int(rng.integers(0, 3))]
        alt_count = rng.binomial(depth, af) if af > 0 else 0

        if indel_kind in ("ins", "del"):
            # center column: ref bases minus indel carriers; indel channels
            _fill_column(t, FLANK, ref_idx, depth - alt_count, rng=rng,
                         error_rate=error_rate)
            fwd_cnt = rng.binomial(alt_count, 0.5)
            rev_cnt = alt_count - fwd_cnt
            if indel_kind == "ins":
                t[FLANK, _CH["I"]] += fwd_cnt
                t[FLANK, _CH["i"]] += rev_cnt
                t[FLANK, _CH["I1"]] = fwd_cnt
                t[FLANK, _CH["i1"]] = rev_cnt
            else:
                dlen = int(rng.integers(1, 4))
                t[FLANK, _CH["D"]] += fwd_cnt
                t[FLANK, _CH["d"]] += rev_cnt
                t[FLANK, _CH["D1"]] = fwd_cnt
                t[FLANK, _CH["d1"]] = rev_cnt
                for dcol in range(FLANK + 1, min(FLANK + 1 + dlen, WIN)):
                    t[dcol, _CH["*"]] += fwd_cnt
                    t[dcol, _CH["#"]] += rev_cnt
            _encode_ref(t, FLANK, ref_idx)
            if alt_count >= cfg.ALTERNATIVE_BASE_NUM:
                som[i] = 4 if indel_kind == "ins" else 5
        else:
            _fill_column(t, FLANK, ref_idx, depth, alt_idx if af > 0 else None,
                         alt_count, rng, error_rate)
            _encode_ref(t, FLANK, ref_idx)
            if klass == 3 and alt_count >= cfg.ALTERNATIVE_BASE_NUM:
                # mode='indel': SNV sites are negatives for the I/D alleles
                # but positives for their base allele (label semantics match
                # the 6-allele nets: som index = allele index)
                som[i] = alt_idx
        x[i] = t.astype(np.float32)
        cov[i] = depth
    return x, cov, som
