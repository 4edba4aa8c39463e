"""Tabix writer/reader roundtrip and region-query correctness."""

import gzip
import random

import pytest

from clairs_to_tpu.vcf.tabix import TabixReader, write_tabix_vcf


def make_vcf(path, rows):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for (ctg, pos, ref, alt) in rows:
            f.write(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t30\tPASS\t.\n")
    return path


def test_roundtrip_and_gzip_readable(tmp_path):
    rows = [("chr1", p, "A", "C") for p in range(100, 200000, 997)]
    vcf = make_vcf(str(tmp_path / "a.vcf"), rows)
    gz, tbi = write_tabix_vcf(vcf)
    # BGZF output is plain-gzip readable
    body = [l for l in gzip.open(gz, "rt") if not l.startswith("#")]
    assert len(body) == len(rows)


def test_region_fetch_exact(tmp_path):
    rng = random.Random(7)
    positions = sorted(rng.sample(range(1, 5_000_000), 3000))
    rows = [("chr1", p, "A", "G") for p in positions]
    vcf = make_vcf(str(tmp_path / "b.vcf"), rows)
    gz, tbi = write_tabix_vcf(vcf)
    rd = TabixReader(gz)
    for (lo, hi) in [(0, 1000), (100_000, 150_000), (2_000_000, 2_010_000), (4_900_000, 5_000_000)]:
        got = [int(l.split("\t")[1]) for l in rd.fetch("chr1", lo, hi)]
        want = [p for p in positions if lo < p <= hi or (lo <= p - 1 < hi)]
        want = [p for p in positions if (p - 1) < hi and p > lo]
        assert got == want, (lo, hi, got[:5], want[:5])


def test_multi_contig_fetch(tmp_path):
    rows = [("chr1", p, "A", "T") for p in range(1000, 50000, 777)]
    rows += [("chr2", p, "G", "C") for p in range(500, 30000, 333)]
    vcf = make_vcf(str(tmp_path / "c.vcf"), rows)
    gz, _ = write_tabix_vcf(vcf)
    rd = TabixReader(gz)
    got1 = [int(l.split("\t")[1]) for l in rd.fetch("chr1", 0, 10_000)]
    got2 = [int(l.split("\t")[1]) for l in rd.fetch("chr2", 0, 1000)]
    assert got1 == [p for p in range(1000, 10001, 777)]
    assert got2 == [500, 833]
    assert list(rd.fetch("chrX", 0, 100)) == []


def test_deletion_span_overlap(tmp_path):
    # a 10bp deletion at 1000 must be returned for a query at 1005
    rows = [("chr1", 1000, "ACGTACGTACG", "A")]
    vcf = make_vcf(str(tmp_path / "d.vcf"), rows)
    gz, _ = write_tabix_vcf(vcf)
    rd = TabixReader(gz)
    assert len(list(rd.fetch("chr1", 1004, 1006))) == 1
    assert len(list(rd.fetch("chr1", 1020, 1030))) == 0
