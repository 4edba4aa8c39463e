"""Long-read haplotype filtering — the 9-verdict hard-filter stage.

Port of /root/reference/src/haplotype_filtering.py:344-706 operating on the
entry table (bamio/pileup.py) of a haplotagged BAM (HP tags) instead of
re-mpileuping per site:

  ① pass_bq   — mean alt-allele BQ > 20 (:631-658, ont_min_bq)
  ② pass_mq   — mean alt-allele MQ > 20
  ③ pass_read_start_end — >=30% of alt reads near read boundaries (:369-373)
  ④ pass_co_exist — variant cluster: >=3 co-segregating nearby variants among
     alt reads, or inserted length/depth > 3 (:394-435, 531-534)
  ⑤ pass_hetero — phased alt reads must share ancestry with flanking het
     germline alleles on the same haplotype (:437-468)
  ⑥ pass_homo — alt reads must carry flanking hom germline alleles (:470-529)
  ⑦ pass_hetero_both_side — low-AF alt present on both haplotypes (:375-387)
  ⑧ pass_strand_bias — Fisher p >= 0.001 (SNV) / 0.01 (indel), with the
     reference's operator-precedence quirk kept verbatim: the `or a0==0 or
     a1==0` binds to the whole conjunction (:548-552)
  ⑨ pass_sequence_entropy — indels: 33bp ref k-mer entropy >= 0.9 (:554-557)

Fail => LowQual + tags LowAltBQ/LowAltMQ/ReadStartEnd/VariantCluster/
NoAncestry/MultiHap/StrandBias/LowSeqEntropy; phaseable calls get INFO 'H';
INFO gains SB=p (update_filter_info, :742-796).
"""

from collections import Counter, defaultdict

import numpy as np

from clairs_to_tpu import config as cfg
from clairs_to_tpu.postcall.hardfilter import (
    EPS,
    EPS_RSE,
    FLANKING,
    MIN_HOM_GERMLINE_AF,
    SEQUENCE_ENTROPY_THRESHOLD,
    calculate_sequence_entropy,
    fisher_exact,
)

LOW_AF_SNV = 0.1
LOW_AF_INDEL = 0.3


class HaplotypeVerdict:
    FIELDS = (
        "pass_bq", "pass_mq", "pass_read_start_end", "pass_co_exist",
        "pass_hetero", "pass_homo", "pass_hetero_both_side",
        "pass_strand_bias", "pass_sequence_entropy",
    )

    def __init__(self):
        for f in self.FIELDS:
            setattr(self, f, True)
        self.phaseable = False
        self.strand_bias_p = 1.0
        self.strand_table = None

    @property
    def pass_all(self):
        return all(getattr(self, f) for f in self.FIELDS)


class HaplotypeFilterEngine:
    """Runs the 9 verdicts against a (haplotagged) entry table."""

    def __init__(self, pileup_engine, min_bq=cfg.MIN_BQ, min_mq=cfg.MIN_MQ,
                 max_co_exist_read_num=2,
                 disable_read_start_end_filtering=False,
                 hetero_germline=None, homo_germline=None):
        """hetero/homo_germline: [(pos0, alt_base)] flanking germline calls
        from the pileup germline VCF (haplotype_filtering.py:901-939).

        Defaults pin the reference driver's: the filter-stage mpileup runs
        at --min-BQ param.min_bq=0 (NOT the platform tensor min_bq) and
        --min_alt_coverage defaults to 2 (haplotype_filtering.py:1252);
        run_clairs_to passes neither, so these are production values.
        Verified by tests/test_golden_filters.py."""
        self.pe = pileup_engine
        self.min_bq = min_bq
        self.min_mq = min_mq
        self.max_co_exist = max_co_exist_read_num
        self.disable_rse = disable_read_start_end_filtering
        self.hetero_germline = sorted(hetero_germline or [])
        self.homo_germline = sorted(homo_germline or [])
        a = self.pe._finalize()
        self.sel = (
            (a["mq"] >= self.min_mq) & (a["bq"] >= self.min_bq) & (a["code"] != 10)
        )
        idx = np.nonzero(self.sel)[0]
        pos = a["pos"][idx]
        order = np.argsort(pos, kind="stable")
        self.idx = idx[order]
        self.pos_sorted = pos[order]
        self.a = a

    def _entries_at(self, p):
        lo = np.searchsorted(self.pos_sorted, p, side="left")
        hi = np.searchsorted(self.pos_sorted, p, side="right")
        return self.idx[lo:hi]

    def _string(self, j):
        return self.pe._entry_string(j).upper()

    def _alt_match(self, s, suffix_len, ref_base, alt_base, is_snp, is_ins, is_del):
        if is_snp:
            return s == alt_base
        if is_ins:
            return "+" in s and s.replace("+", "") == alt_base
        if is_del:
            # reference: len(ref_base) == len(value[1]) where value[1] is
            # '-<deleted>' (suffix incl '-'); suffix_len = deleted length
            return suffix_len is not None and suffix_len + 1 == len(ref_base)
        return False

    def verdict(self, pos0, ref_base, alt_base, af=None):
        pe, a = self.pe, self.a
        v = HaplotypeVerdict()
        is_snp = len(ref_base) == 1 and len(alt_base) == 1
        is_ins = len(ref_base) == 1 and len(alt_base) > 1
        is_del = len(ref_base) > 1 and len(alt_base) == 1
        af = af if af is not None else 1.0

        win_lo = max(pos0 - FLANKING, 0)
        win_hi = pos0 + FLANKING

        center = self._entries_at(pos0)
        center_info = {}
        for j in center:
            rid = int(a["read_id"][j])
            suffix_len = int(a["ilen"][j]) if a["ikind"][j] == 2 else None
            center_info[rid] = (
                self._string(j),
                suffix_len,
                int(a["bq"][j]),
                int(a["mq"][j]),
                int(a["hp"][j]),
                (4 <= a["code"][j] < 8) or a["code"][j] == 9,
            )

        alt_reads = {
            rid
            for rid, (s, sl, _b, _m, _h, _r) in center_info.items()
            if self._alt_match(s, sl, ref_base, alt_base, is_snp, is_ins, is_del)
        }

        # ① / ② average alt BQ / MQ (haplotype_filtering.py:631-658)
        bqs = [center_info[r][2] for r in alt_reads]
        mqs = [center_info[r][3] for r in alt_reads]
        if bqs and sum(bqs) / len(bqs) <= cfg.ONT_MIN_BQ:
            v.pass_bq = False
        if mqs and sum(mqs) / len(mqs) <= cfg.MIN_MQ:
            v.pass_mq = False

        # ③ read start/end
        if not self.disable_rse and alt_reads:
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
            if len(rse_reads & alt_reads) >= 0.3 * len(alt_reads):
                v.pass_read_start_end = False

        # haplotype memberships (hap 0 = unphased)
        hap_of = {rid: info[4] for rid, info in center_info.items()}
        alt_hap = Counter(hap_of.get(r, 0) for r in alt_reads)
        hp1, hp2 = alt_hap[1], alt_hap[2]
        MAX, MIN = max(hp1, hp2), min(hp1, hp2)

        # ⑦ both-haplotype low-AF check (:375-387)
        low_af = LOW_AF_SNV if is_snp else LOW_AF_INDEL
        if af < low_af:
            if hp1 * hp2 > 0 and (MIN > self.max_co_exist or MAX / MIN <= 10):
                v.pass_hetero_both_side = False

        is_phasable = hp1 * hp2 == 0 or (
            MAX / MIN >= 5 and (hp1 > self.max_co_exist or hp2 > self.max_co_exist)
        )
        hap_index = 0 if not is_phasable else (1 if hp1 > hp2 else 2)

        # ④ co-exist / cluster
        match_count = 0
        ins_length = 0
        for p in range(win_lo, win_hi + 1):
            if p == pos0:
                continue
            ents = self._entries_at(p)
            if len(ents) == 0:
                continue
            rb = pe._ref_base(p)
            strings = {}
            for j in ents:
                strings[int(a["read_id"][j])] = self._string(j)
            ins_length += sum(
                min(len(s.split("+")[1]), FLANKING * 2)
                for s in strings.values()
                if "+" in s and len(s.split("+")[1]) > 2
            )
            alt_list = [
                s for rid, s in strings.items()
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
            col_counter = Counter(strings.values())
            if len(col_counter) == 1 and col_counter.get(rb, 0) > 0:
                continue
            if col_counter[top_base] >= top_count * (1 + EPS):
                continue
            match_count += 1
        depth = max(len(center_info), 1)
        if match_count >= self.max_co_exist or ins_length / depth > 3:
            v.pass_co_exist = False

        # ⑤ ancestral het-germline support (:437-468)
        if hap_index > 0:
            alt_on_hap = {r for r in alt_reads if hap_of.get(r, 0) == hap_index}
            for gp, gab in self.hetero_germline:
                if not (win_lo <= gp <= win_hi) or gp == pos0:
                    continue
                ents = self._entries_at(gp)
                if len(ents) == 0:
                    continue
                grb = pe._ref_base(gp)
                carriers = set()
                for j in ents:
                    rid = int(a["read_id"][j])
                    s = self._string(j)
                    sl = int(a["ilen"][j]) if a["ikind"][j] == 2 else None
                    if len(grb) == 1 and len(gab) == 1:
                        if s == gab:
                            carriers.add(rid)
                    elif len(grb) == 1 and len(gab) > 1:
                        if "+" in s and gab[:2] in s.split("+")[1]:
                            carriers.add(rid)
                    elif len(grb) > 1 and len(gab) == 1:
                        if "-" in s:
                            carriers.add(rid)
                hap_at = {
                    int(a["read_id"][j]): int(a["hp"][j]) for j in ents
                }
                phased_carriers = {r for r in carriers if hap_at.get(r, 0) == hap_index}
                if len(phased_carriers) == 0 or len(phased_carriers) * 2 < float(len(carriers)):
                    continue
                if len(alt_on_hap & phased_carriers) == 0:
                    v.pass_hetero = False
                    break

        # ⑥ hom-germline carryover (:470-529)
        for gp, gab in self.homo_germline:
            # the reference drops the candidate site itself when building
            # the HAP_INFO germline strings (p_gl == pos, :1011)
            if not (win_lo <= gp <= win_hi) or gp == pos0:
                continue
            ents = self._entries_at(gp)
            if len(ents) == 0:
                continue
            grb = pe._ref_base(gp)
            col = {}
            for j in ents:
                col[int(a["read_id"][j])] = (self._string(j), int(a["hp"][j]))
            if len(grb) == 1 and len(gab) == 1:
                homo_alt = {r for r, (s, _h) in col.items() if s == gab}
            elif len(grb) == 1 and len(gab) > 1:
                homo_alt = {
                    r for r, (s, _h) in col.items()
                    if "+" in s and gab[1:2] in s.split("+")[1]
                }
            elif len(grb) > 1 and len(gab) == 1:
                homo_alt = {r for r, (s, _h) in col.items() if "-" in s}
            else:
                homo_alt = set()
            hcount = Counter(col[r][1] for r in homo_alt)
            acount = Counter(h for (_s, h) in col.values())
            tot = acount[0] + acount[1] + acount[2]
            af_g = (hcount[0] + hcount[1] + hcount[2]) / float(tot) if tot else 0.0

            def _phasable(all_list, hlist):
                if all_list[1] * all_list[2] == 0:
                    return False
                mx, mn = max(hlist[1], hlist[2]), min(hlist[1], hlist[2])
                if hlist[1] * hlist[2] > 0 and mx / mn <= 10:
                    return False
                return True

            if af_g < MIN_HOM_GERMLINE_AF or _phasable(
                [acount[0], acount[1], acount[2]], [hcount[0], hcount[1], hcount[2]]
            ):
                continue
            inter = set(col.keys()) & alt_reads
            if len(inter) == 0:
                continue
            overlap = homo_alt & inter
            if len(overlap) == 0 or len(overlap) / len(inter) < EPS:
                v.pass_homo = False
                break

        # phaseability flag for INFO 'H' (:538-545)
        all_hap = Counter(hap_of.values())
        v.phaseable = (
            all_hap[1] * all_hap[2] > 0
            and hp1 * hp2 == 0
            and (hp1 > self.max_co_exist or hp2 > self.max_co_exist)
        )

        # ⑧ strand bias, with the reference's precedence quirk preserved
        a0 = sum(1 for r in alt_reads if not center_info[r][5])
        a1 = sum(1 for r in alt_reads if center_info[r][5])
        all0 = sum(1 for (_s, _sl, _b, _m, _h, rev) in center_info.values() if not rev)
        all1 = sum(1 for (_s, _sl, _b, _m, _h, rev) in center_info.values() if rev)
        r0, r1 = all0 - a0, all1 - a1
        v.strand_table = ((a0, r0), (a1, r1))
        p_value = fisher_exact([[a0, r0], [a1, r1]])
        v.strand_bias_p = p_value
        if is_snp and p_value < 0.001 or (a0 == 0 or a1 == 0):
            v.pass_strand_bias = False
        elif not is_snp and p_value < 0.01 or (a0 == 0 or a1 == 0):
            v.pass_strand_bias = False

        # ⑨ sequence entropy (indels)
        if not is_snp:
            lo = pos0 - cfg.FLANKING_BASE_NUM
            hi = pos0 + cfg.FLANKING_BASE_NUM + 1
            ref_seq = "".join(pe._ref_base(p) for p in range(lo, hi))
            if calculate_sequence_entropy(ref_seq, cfg.NO_OF_POSITIONS) < SEQUENCE_ENTROPY_THRESHOLD:
                v.pass_sequence_entropy = False

        return v


def apply_haplotype_filters(rows, verdicts):
    """update_filter_info (:742-796): LowQual + per-verdict tags + H + SB."""
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
        if not v.pass_bq:
            filt += ";LowAltBQ"
        if not v.pass_mq:
            filt += ";LowAltMQ"
        if not v.pass_read_start_end:
            filt += ";ReadStartEnd"
        if not v.pass_co_exist:
            filt += ";VariantCluster"
        if not v.pass_hetero:
            filt += ";NoAncestry"
        if not v.pass_hetero_both_side:
            filt += ";MultiHap"
        if not v.pass_strand_bias:
            filt += ";StrandBias"
        if not v.pass_sequence_entropy:
            filt += ";LowSeqEntropy"
        row["FILTER"] = filt
        if v.phaseable:
            row["INFO"] = "H;" + row["INFO"] if row["INFO"] != "." else "H"
        row["INFO"] = row["INFO"] + ";SB={}".format(round(v.strand_bias_p, 5))
    return n_filtered
