"""Shared helpers for golden-parity tests against /root/reference.

``emit_mpileup`` synthesizes samtools-mpileup text rows (``--output-MQ
--output-QNAME [--output-extra HP] --excl-flags 2316 --reverse-del``
semantics, see /root/reference/src/haplotype_filtering.py:309-341) from
decoded BAM reads via an independent CIGAR walk.  This lets the reference's
filter modules be driven on the exact same alignments this framework's
engines consume — without samtools, which does not exist in this image.

The walk is intentionally NOT shared with clairs_to_tpu.bamio.pileup: a bug
in the production CIGAR expansion would make the two sides diverge here and
fail the parity test, instead of being masked by a shared implementation.
"""

EXCL_FLAGS = 2316  # UNMAP,SECONDARY,QCFAIL,DUP,SUPPLEMENTARY
_CIGAR = "MIDNSHP=X"


def emit_mpileup(reads, ref_seq, ctg, lo1, hi1, min_mq=20, min_bq=0,
                 hp=None, with_hp=True):
    """Mpileup text rows for 1-based positions [lo1, hi1].

    reads: BamRead list (bamio.bam); ref_seq: full contig string (0-based);
    hp: optional per-read-index HP array (0 = untagged -> '*').
    Returns a list of tab-separated rows, each ending in a newline.
    """
    cols = {}
    for ridx, rd in enumerate(reads):
        if (rd.flag & EXCL_FLAGS) or rd.mapq < min_mq:
            continue
        rev = rd.is_reverse
        entries = []  # [pos1, basechar, suffix, bq]
        p = rd.pos
        q = 0
        for op, ln in zip(rd.cigar_ops, rd.cigar_lens):
            opc = _CIGAR[int(op)]
            ln = int(ln)
            if opc in "M=X":
                for k in range(ln):
                    b = rd.seq[q + k]
                    bc = b.lower() if rev else b.upper()
                    entries.append([p + k + 1, bc, "", int(rd.qual[q + k])])
                p += ln
                q += ln
            elif opc == "I":
                s = rd.seq[q : q + ln]
                s = s.lower() if rev else s.upper()
                if entries:
                    entries[-1][2] = "+%d%s" % (ln, s)
                q += ln
            elif opc == "D":
                dseq = ref_seq[p : p + ln]
                dseq = dseq.lower() if rev else dseq.upper()
                if entries:
                    entries[-1][2] = "-%d%s" % (ln, dseq)
                nxt = int(rd.qual[q]) if q < len(rd.qual) else (
                    int(rd.qual[-1]) if len(rd.qual) else 0)
                ph = "#" if rev else "*"
                for k in range(ln):
                    entries.append([p + k + 1, ph, "", nxt])
                p += ln
            elif opc == "N":
                p += ln
            elif opc == "S":
                q += ln
        if not entries:
            continue
        # samtools drops sub-min-BQ bases from the column (placeholders are
        # exempt — deletions carry no query base)
        kept = [e for e in entries if e[1] in "#*" or e[3] >= min_bq]
        if not kept:
            continue
        hpv = "*"
        if hp is not None and int(hp[ridx]) in (1, 2):
            hpv = str(int(hp[ridx]))
        head, tail = entries[0], entries[-1]
        for e in kept:
            pos1, bc, suffix, bq = e
            if not (lo1 <= pos1 <= hi1):
                continue
            txt = bc + suffix
            if e is kept[0] and e is head:  # '^' only at the alignment head
                txt = "^" + chr(min(rd.mapq, 93) + 33) + txt
            if e is kept[-1] and e is tail:
                txt += "$"
            cols.setdefault(pos1, []).append(
                (txt, bq, rd.mapq, rd.name, hpv))
    rows = []
    for pos1 in sorted(cols):
        ents = cols[pos1]
        fields = [
            ctg,
            str(pos1),
            ref_seq[pos1 - 1].upper(),
            str(len(ents)),
            "".join(t for t, _b, _m, _n, _h in ents),
            "".join(chr(min(b, 93) + 33) for _t, b, _m, _n, _h in ents),
            "".join(chr(min(m, 93) + 33) for _t, _b, m, _n, _h in ents),
            ",".join(n for _t, _b, _m, n, _h in ents),
        ]
        if with_hp:
            fields.append(",".join(h for _t, _b, _m, _n, h in ents))
        rows.append("\t".join(fields) + "\n")
    return rows


def parse_bool_line(line, names):
    """Parse a reference finalize line ('ctg pos <fields...>') into a dict.

    names: field names after ctg/pos, in order; values 'True'/'False' become
    bools, anything else stays a string."""
    parts = line.split(" ")
    out = {"ctg": parts[0], "pos": int(parts[1])}
    for name, raw in zip(names, parts[2:]):
        out[name] = raw == "True" if raw in ("True", "False") else raw
    return out
