#!/usr/bin/env python
"""Diff internal vs external (longphase/whatshap) haplotagging.

Runs both phasing paths over a BAM + het-SNP set and reports per-read
haplotag agreement (modulo the arbitrary hap1/hap2 labeling), plus the
phase-orientation switch profile — the cross-check the round-3 verdict
asked for (the internal phaser was previously validated only against the
simulator's own truth).

Usage:
  python tools/compare_phasers.py --bam tumor.bam --ref ref.fa \
      --het_vcf hets.vcf [--tool longphase|whatshap] [--binary PATH]
  python tools/compare_phasers.py --simulate   # self-contained demo run
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clairs_to_tpu import config as cfg  # noqa: E402
from clairs_to_tpu.bamio import native  # noqa: E402
from clairs_to_tpu.bamio.pileup import PileupEngine  # noqa: E402
from clairs_to_tpu.genome.fasta import FastaFile  # noqa: E402
from clairs_to_tpu.phasing import external as extph  # noqa: E402
from clairs_to_tpu.phasing.phaser import (  # noqa: E402
    haplotag_reads,
    phase_het_snps,
)


def load_het_sites(vcf_path):
    sites = []
    with open(vcf_path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            c = line.rstrip("\n").split("\t")
            if len(c[3]) == 1 and len(c[4]) == 1:
                sites.append((int(c[1]) - 1, c[3], c[4]))
    return sites


def compare_on(bam, ref_fn, ctg, het_sites, tool, binary, workdir,
               platform="ont", threads=2):
    fa = FastaFile(ref_fn)
    L = fa.contig_length(ctg)
    ref_seq = fa.fetch(ctg, 0, L)
    table = native.load_entry_table(
        bam, ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe = PileupEngine.from_entry_table(table, ref_seq, 0, platform=platform)

    orients_int, site_alleles = phase_het_snps(pe, het_sites)
    n_reads = pe.n_reads
    hp_int = haplotag_reads(n_reads, orients_int, site_alleles)

    het_vcf = extph.write_het_vcf(
        os.path.join(workdir, "hets.vcf"), ctg, het_sites)
    phased = extph.run_external_phase(
        tool, binary, het_vcf, bam, ref_fn,
        os.path.join(workdir, "phased"), ctg, platform=platform,
        threads=threads)
    if phased is None:
        return None, dict(error=f"{tool} phase failed or binary missing")
    ext_orients = extph.load_phase_orientations(phased, het_sites)
    sites_e = [(p, r, a) for (p, r, a) in het_sites if p in ext_orients]
    alle_e = [sa for (p, _r, _a), sa in zip(het_sites, site_alleles)
              if p in ext_orients]
    hp_ext = haplotag_reads(n_reads, [ext_orients[p] for (p, _r, _a) in sites_e],
                            alle_e)
    stats = extph.compare_haplotags(hp_int, hp_ext)
    # orientation switch profile: fraction of adjacent site pairs where the
    # two phase solutions flip relative to each other
    common = [(p, orients_int[i]) for i, (p, _r, _a) in enumerate(het_sites)
              if p in ext_orients]
    rel = [oi ^ ext_orients[p] for (p, oi) in common]
    switches = sum(1 for a, b in zip(rel, rel[1:]) if a != b)
    stats["n_common_sites"] = len(common)
    stats["relative_switches"] = switches
    return (hp_int, hp_ext), stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam")
    ap.add_argument("--ref")
    ap.add_argument("--ctg")
    ap.add_argument("--het_vcf")
    ap.add_argument("--tool", default="longphase",
                    choices=["longphase", "whatshap"])
    ap.add_argument("--binary", default=None)
    ap.add_argument("--platform", default="ont")
    ap.add_argument("--simulate", action="store_true",
                    help="Generate a simulated dataset and het set first.")
    args = ap.parse_args(argv)

    workdir = tempfile.mkdtemp(prefix="compare_phasers_")
    if args.simulate:
        from clairs_to_tpu.bamio import simulate

        ds = simulate.make_dataset(
            workdir, seed=5, genome_len=60_000, coverage=40, read_length=700,
            n_snv=0, n_indel=0, n_germline=120, error_rate=0.01)
        args.bam, args.ref, args.ctg = ds["bam"], ds["fasta"], ds["ctg"]
        het_sites = [(v.pos, v.ref, v.alt) for v in ds["variants"]
                     if v.germline]
    else:
        het_sites = load_het_sites(args.het_vcf)
    binary = extph.resolve_binary(args.binary, args.tool)
    if binary is None:
        print(f"[ERROR] no {args.tool} binary found (pass --binary)")
        return 2
    _tags, stats = compare_on(args.bam, args.ref, args.ctg, het_sites,
                              args.tool, binary, workdir,
                              platform=args.platform)
    import json

    print(json.dumps(stats))
    return 0 if "error" not in stats else 1


if __name__ == "__main__":
    sys.exit(main())
