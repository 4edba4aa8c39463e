"""Hard post-calling filters on the entry table.

Port of /root/reference/src/postfilter_variants.py (Illumina, no phasing):
for each PASS call, a ±100 bp window of the pileup yields four verdicts —

  ① pass_read_start_end  (>30% of alt reads start/end nearby -> fail;
     rows contribute their start/end reads only when marks >= 20% of the
     column, postfilter_variants.py:425-428; the larger of start/end set is
     used per row, :177)
  ② pass_co_exist        (variant cluster: >=3 co-segregating nearby
     variants among the alt reads, or inserted length/depth > 3, :296-345)
  ③ pass_strand_bias     (Fisher exact on alt/ref x fwd/rev, p<0.001,
     :347-356; exact pure-python Fisher :52-88)
  ④ pass_sequence_entropy (indels only: k=5-mer entropy of the 33 bp ref
     window < 0.9 -> fail, :90-141)

Failures turn the row LowQual (QUAL 0) plus tags ReadStartEnd /
VariantCluster / StrandBias / LowSeqEntropy; INFO gains SB=p (:484-520).

The same machinery, plus HP-phased verdicts, backs the long-read haplotype
filtering (postcall/haplotype.py).

The filter view matches the reference's mpileup invocation: --min-MQ 20
--min-BQ (platform), --excl-flags 2316 (:267-272).
"""

import math
from collections import Counter, defaultdict

import numpy as np

from clairs_to_tpu import config as cfg

MIN_HOM_GERMLINE_AF = 0.75
EPS = 0.5
EPS_RSE = 0.2
SEQUENCE_ENTROPY_THRESHOLD = 0.9
FLANKING = 100

BASE2NUM = dict(zip("ACGTURYSWKMBDHVN-", (0, 1, 2, 3, 3, 0, 1, 1, 0, 2, 0, 1, 0, 0, 0, 0, 4)))


def _log_binom(n, k):
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def fisher_exact(table):
    """Two-sided Fisher exact test on a 2x2 table.

    Same decision semantics as the reference's pure-Python test
    (postfilter_variants.py:52-88): sum P(X=x) over every table sharing the
    observed margins whose probability does not exceed the observed table's.
    Different formulation by design: the hypergeometric pmf is evaluated
    directly in log space (log-gamma) over its full support, instead of a
    multiplicative two-tail recurrence, with a scipy-style relative tie
    tolerance for the pmf comparison.

    Known divergence (deliberate): on symmetric-margin tables the opposite
    tail contains an exactly-tied mirror table; the reference's recurrence
    includes or excludes it depending on accumulated float round-off
    direction (measured: 238/341 included, 103/341 excluded on random
    symmetric tables), i.e. ~2x p-value noise irreproducible without copying
    its exact arithmetic.  This implementation always includes exact ties,
    matching scipy.stats.fisher_exact to <1e-12 relative error.
    """
    a, b, c, d = table[0][0], table[0][1], table[1][0], table[1][1]
    if a == b == c == d:
        return 1.0
    m, n, k = a + b, c + d, a + c
    log_denom = _log_binom(m + n, k)
    log_obs = _log_binom(m, a) + _log_binom(n, k - a) - log_denom
    cutoff = log_obs + 1e-7  # include ties: lp <= log_obs * (1 + ~1e-7)
    p = 0.0
    for x in range(max(0, k - n), min(k, m) + 1):
        lp = _log_binom(m, x) + _log_binom(n, k - x) - log_denom
        if lp <= cutoff:
            p += math.exp(lp)
    return min(p, 1.0)


def calculate_sequence_entropy(sequence, entropy_window, kmer=5):
    """Sliding k-mer entropy (postfilter_variants.py:90-135)."""
    count_repeat_kmer_counts = [0] * (entropy_window + 2)
    count_repeat_kmer_counts[0] = entropy_window
    entropy = [0.0] * (entropy_window + 2)
    for i in range(1, entropy_window + 2):
        e = 1.0 / entropy_window * i
        entropy[i] = e * math.log(e)
    entropy_mul = -1 / math.log(entropy_window)
    entropy_kmer_space = 1 << (2 * kmer)
    kmer_hash_counts = [0] * entropy_kmer_space
    mask = -1 if kmer > 15 else ~((-1) << (2 * kmer))
    kmer_suffix, kmer_prefix = 0, 0
    i = 0
    i2 = -entropy_window
    entropy_sum = 0.0
    while i2 < len(sequence):
        if i < len(sequence):
            n = BASE2NUM.get(sequence[i], 0)
            kmer_suffix = ((kmer_suffix << 2) | n) & mask
            count_repeat_kmer_counts[kmer_hash_counts[kmer_suffix]] -= 1
            entropy_sum -= entropy[kmer_hash_counts[kmer_suffix]]
            kmer_hash_counts[kmer_suffix] += 1
            count_repeat_kmer_counts[kmer_hash_counts[kmer_suffix]] += 1
            entropy_sum += entropy[kmer_hash_counts[kmer_suffix]]
        if i2 >= 0 and i < len(sequence):
            n2 = BASE2NUM.get(sequence[i2], 0)
            kmer_prefix = ((kmer_prefix << 2) | n2) & mask
            count_repeat_kmer_counts[kmer_hash_counts[kmer_prefix]] -= 1
            entropy_sum -= entropy[kmer_hash_counts[kmer_prefix]]
            kmer_hash_counts[kmer_prefix] -= 1
            count_repeat_kmer_counts[kmer_hash_counts[kmer_prefix]] += 1
            entropy_sum += entropy[kmer_hash_counts[kmer_prefix]]
        i += 1
        i2 += 1
    return entropy_sum * entropy_mul


class FilterVerdict:
    def __init__(self):
        self.pass_read_start_end = True
        self.pass_co_exist = True
        self.pass_strand_bias = True
        self.pass_sequence_entropy = True
        self.strand_bias_p = 1.0
        self.strand_table = None

    @property
    def pass_all(self):
        return (
            self.pass_read_start_end
            and self.pass_co_exist
            and self.pass_strand_bias
            and self.pass_sequence_entropy
        )


class HardFilterEngine:
    """Runs the no-phasing verdict set against a PileupEngine entry table."""

    def __init__(self, pileup_engine, min_bq=cfg.MIN_BQ, min_mq=cfg.MIN_MQ,
                 max_co_exist_read_num=2,
                 disable_read_start_end_filtering=False):
        """Defaults pin the reference driver's postfilter invocation:
        --min-BQ param.min_bq=0 and --min_alt_coverage 2
        (postfilter_variants.py:795-801; run_clairs_to passes neither).
        Verified by tests/test_golden_filters.py."""
        self.pe = pileup_engine
        self.min_bq = min_bq
        self.min_mq = min_mq
        self.max_co_exist = max_co_exist_read_num
        self.disable_rse = disable_read_start_end_filtering
        self._build_index()

    def _build_index(self):
        a = self.pe._finalize()
        # filter view: read mq >= min_mq, base bq >= min_bq, real entries
        self.sel = (
            (a["mq"] >= self.min_mq)
            & (a["bq"] >= self.min_bq)
            & (a["code"] != 10)
        )
        self.idx = np.nonzero(self.sel)[0]
        pos = a["pos"][self.idx]
        order = np.argsort(pos, kind="stable")
        self.idx = self.idx[order]
        self.pos_sorted = pos[order]
        self.a = a

    def _entries_at(self, p):
        lo = np.searchsorted(self.pos_sorted, p, side="left")
        hi = np.searchsorted(self.pos_sorted, p, side="right")
        return self.idx[lo:hi]

    def _entry_base_string(self, j):
        """Uppercased base + indel suffix (postfilter base_list after :179)."""
        return self.pe._entry_string(j).upper()

    def verdict(self, pos0, ref_base, alt_base):
        """Run the four verdicts for a call at 0-based pos0."""
        pe, a = self.pe, self.a
        v = FilterVerdict()
        is_snp = len(ref_base) == 1 and len(alt_base) == 1
        is_ins = len(ref_base) == 1 and len(alt_base) > 1
        is_del = len(ref_base) > 1 and len(alt_base) == 1

        win_lo = max(pos0 - FLANKING, 0)
        win_hi = pos0 + FLANKING

        # --- pos-column state --------------------------------------------
        center = self._entries_at(pos0)
        center_strings = {int(a["read_id"][j]): self._entry_base_string(j) for j in center}
        center_rev = {
            int(a["read_id"][j]): (4 <= a["code"][j] < 8) or a["code"][j] == 9
            for j in center
        }
        if is_snp:
            alt_reads = {
                rid for rid, s in center_strings.items() if s == alt_base
            }
        elif is_ins:
            alt_reads = {
                rid
                for rid, s in center_strings.items()
                if "+" in s and s.replace("+", "") == alt_base
            }
        elif is_del:
            alt_reads = {
                rid
                for rid, s in center_strings.items()
                if "-" in s and len(s.split("-")[1]) + 1 == len(ref_base)
            }
        else:
            alt_reads = set()

        # --- ① read start/end --------------------------------------------
        if not self.disable_rse:
            rse_reads = set()
            for p in range(win_lo, win_hi + 1):
                ents = self._entries_at(p)
                if len(ents) == 0:
                    continue
                starts = [j for j in ents if a["eflags"][j] & 1]
                ends = [j for j in ents if a["eflags"][j] & 2]
                marked = starts if len(starts) > len(ends) else ends
                if len(marked) >= len(ents) * EPS_RSE:
                    rse_reads |= {int(a["read_id"][j]) for j in marked}
            if len(alt_reads) >= 0 and len(rse_reads & alt_reads) >= 0.3 * len(alt_reads):
                v.pass_read_start_end = False

        # --- ② co-exist / variant cluster --------------------------------
        match_count = 0
        ins_length = 0
        for p in range(win_lo, win_hi + 1):
            if p == pos0:
                continue
            ents = self._entries_at(p)
            if len(ents) == 0:
                continue
            rb = pe._ref_base(p)
            strings = {int(a["read_id"][j]): self._entry_base_string(j) for j in ents}
            # inserted length among long insertions (postfilter:307-308)
            ins_length += sum(
                min(len(s.split("+")[1]), FLANKING * 2)
                for s in strings.values()
                if "+" in s and len(s.split("+")[1]) > 2
            )
            alt_list = [
                s
                for rid, s in strings.items()
                if rid in alt_reads and s != rb and s not in "#*"
            ]
            if not alt_list:
                continue
            top_base, top_count = Counter(alt_list).most_common(1)[0]
            if (
                top_count >= len(alt_reads) * (1 + EPS)
                or top_count <= len(alt_reads) * (1 - EPS)
            ):
                continue
            # column-level counter: skip pure-ref columns (postfilter:443-445)
            col_counter = Counter(s for s in strings.values())
            if len(col_counter) == 1 and col_counter.get(rb, 0) > 0:
                continue
            if col_counter[top_base] >= top_count * (1 + EPS):
                continue
            match_count += 1
        depth = max(len(center_strings), 1)
        if match_count >= self.max_co_exist or ins_length / depth > 3:
            v.pass_co_exist = False

        # --- ③ strand bias ------------------------------------------------
        a0 = sum(1 for rid in alt_reads if not center_rev.get(rid, False))
        a1 = sum(1 for rid in alt_reads if center_rev.get(rid, False))
        all0 = sum(1 for rev in center_rev.values() if not rev)
        all1 = sum(1 for rev in center_rev.values() if rev)
        r0, r1 = all0 - a0, all1 - a1
        v.strand_table = ((a0, r0), (a1, r1))
        v.strand_bias_p = fisher_exact([[a0, r0], [a1, r1]])
        if v.strand_bias_p < 0.001:
            v.pass_strand_bias = False

        # --- ④ sequence entropy (indels only) ----------------------------
        if not is_snp:
            lo = pos0 - cfg.FLANKING_BASE_NUM
            hi = pos0 + cfg.FLANKING_BASE_NUM + 1
            ref_seq = "".join(pe._ref_base(p) for p in range(lo, hi))
            ent = calculate_sequence_entropy(ref_seq, cfg.NO_OF_POSITIONS)
            if ent < SEQUENCE_ENTROPY_THRESHOLD:
                v.pass_sequence_entropy = False

        return v


def apply_hard_filters(rows, verdicts):
    """Update VCF row dicts in place per update_filter_info (:484-520).

    rows: list of row dicts (CHROM/POS/...); verdicts: {(chrom,pos): FilterVerdict}.
    Returns number of rows filtered.
    """
    n_filtered = 0
    for row in rows:
        key = (row["CHROM"], row["POS"])
        v = verdicts.get(key)
        if v is None:
            continue
        filt = row["FILTER"]
        if not v.pass_all:
            row["QUAL"] = 0.0
            filt = "LowQual"
            n_filtered += 1
        if not v.pass_read_start_end:
            filt += ";ReadStartEnd"
        if not v.pass_co_exist:
            filt += ";VariantCluster"
        if not v.pass_strand_bias:
            filt += ";StrandBias"
        if not v.pass_sequence_entropy:
            filt += ";LowSeqEntropy"
        row["FILTER"] = filt
        row["INFO"] = row["INFO"] + ";SB={}".format(round(v.strand_bias_p, 5))
    return n_filtered
