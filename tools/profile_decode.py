"""Decode-stage profiler: break the fused window reduce into its parts.

Times, for the bench workload's 4Mb@60x chunk (run twice — cold arena then
pooled arena):
  - BGZF/record selection (load via a reduce with accumulation disabled is
    not separable, so we time the full reduce and its pieces via env knobs)
  - pileup_window_reduce wall (the fused decode+accumulate)
  - filter_assembly wall
  - channel window stacking + engine-side delta

Usage:  python tools/profile_decode.py [--chunk-mb 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BENCH_DIR = "/tmp/clairs_bench_v4"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-mb", type=float, default=4.0)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--no-filter-view", action="store_true")
    args = ap.parse_args()

    from clairs_to_tpu import config as cfg
    from clairs_to_tpu.bamio import native
    from clairs_to_tpu.genome.fasta import FastaFile
    from clairs_to_tpu.postcall.hardfilter import _REF_TOK

    assert native.available()
    fasta = FastaFile(os.path.join(BENCH_DIR, "ref.fa"))
    ctg = fasta.contig_order[0]
    ctg_len = fasta.contig_length(ctg)
    L = int(args.chunk_mb * 1_000_000)
    start, end = 0, min(L + 66, ctg_len)
    ref_seq = fasta.fetch(ctg, 0, min(end + cfg.EXPAND_REFERENCE_REGION, ctg_len))

    f_lo = start - native.FILT_MARGIN
    f_hi = end + native.FILT_MARGIN
    ref_tok = np.full(f_hi - f_lo, 10, np.int16)
    ref_u8 = np.frombuffer(ref_seq.upper().encode("latin-1"), np.uint8)
    s_lo = max(f_lo, 0)
    s_hi = min(f_hi, len(ref_u8))
    ref_tok[s_lo - f_lo : s_hi - f_lo] = _REF_TOK[ref_u8[s_lo:s_hi]]

    for it in range(args.repeat):
        stream = native.BamStreamReader(os.path.join(BENCH_DIR, "tumor.bam"))
        if it > 0:
            stream._flat_pool = pool  # noqa: F821 — pooled arena from prev iter
        t0 = time.perf_counter()
        win = stream.load_window_reduced(
            ctg, start, end,
            excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
            handle_overlaps=True,
            aff_min_bq=cfg.MIN_BQ_DICT.get("ont", 20),
            low_mq_thresh=cfg.LOW_MQ_THRESHOLD,
            low_bq_thresh=cfg.LOW_BQ_THRESHOLD.get("ont", 10),
            max_indel_length=60, with_phasing=False, cand_min_mq=cfg.MIN_MQ,
            filter_view=None if args.no_filter_view
            else (ref_tok, cfg.MIN_BQ, cfg.MIN_MQ),
        )
        t1 = time.perf_counter()
        fa = None
        if win.has_filter_data:
            fa = win.filter_assembly()
        t2 = time.perf_counter()
        n_reads = win.n_reads
        print(f"iter {it}: reduce={t1-t0:.3f}s filter_assembly={t2-t1:.3f}s "
              f"n_reads={n_reads} arena_pooled={it>0}")
        pool = stream._flat_pool
        win.close()
        pool = stream._flat_pool
        stream.close()


if __name__ == "__main__":
    main()
