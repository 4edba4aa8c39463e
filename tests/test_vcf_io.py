"""VCF writer/reader contract (shared/vcf.py parity surface)."""

import gzip

import pytest

from clairs_to_tpu.vcf.reader import VcfReader
from clairs_to_tpu.vcf.writer import VCF_HEADER, VcfWriter


def test_header_contains_reference_contract():
    # FILTER/INFO/FORMAT ids from shared/vcf.py:14-54
    for token in (
        "##FILTER=<ID=NonSomatic", "##FILTER=<ID=LowAltBQ",
        "##FILTER=<ID=VariantCluster", "##FILTER=<ID=StrandBias",
        "##FILTER=<ID=Realignment", "##INFO=<ID=Verdict_Germline",
        "##INFO=<ID=H,", "##INFO=<ID=FAU", "##INFO=<ID=SB",
        "##FORMAT=<ID=AD", "##FORMAT=<ID=TU",
    ):
        assert token in VCF_HEADER, token


def test_write_row_formatting(tmp_path):
    path = str(tmp_path / "w.vcf")
    w = VcfWriter(path, ctg_name="chr1", show_ref_calls=False)
    w.write_row(POS=10, REF="A", ALT="C", QUAL=12.3456, FILTER="PASS",
                INFO="FAU=1", GT="0/1", DP=30, AF=0.25, AD="20,10",
                AU=1, CU=2, GU=3, TU=4)
    # hidden ref call
    w.write_row(POS=11, REF="A", ALT=".", QUAL=1.0, FILTER="RefCall", GT="0/0",
                DP=30, AF=0.0)
    w.close()
    body = [l for l in open(path) if not l.startswith("#")]
    assert len(body) == 1
    cols = body[0].rstrip("\n").split("\t")
    assert cols[5] == "12.3456"                      # %.4f QUAL
    assert cols[8] == "GT:GQ:DP:AF:AD:AU:CU:GU:TU"
    assert cols[9] == "0/1:12:30:0.2500:20,10:1:2:3:4"


def test_reader_filters(tmp_path):
    path = str(tmp_path / "r.vcf")
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        f.write("chr1\t100\t.\tA\tC\t30\tPASS\t.\tGT:AF\t0/1:0.3\n")
        f.write("chr1\t200\t.\tA\tG\t5\tLowQual\t.\tGT:AF\t0/1:0.2\n")
        f.write("chr2\t300\t.\tC\tT\t40\tPASS\t.\tGT:AF\t1/1:0.9\n")
        f.write("chr1\t400\t.\tG\tGA\t20\tPASS\t.\tGT:AF\t0/1:0.4\n")
    r = VcfReader(path, filter_tag="PASS", keep_af=True)
    r.read_vcf()
    keys = set(r.variant_dict)
    assert ("chr1", 200) not in keys
    assert ("chr1", 100) in keys and ("chr2", 300) in keys
    assert r.variant_dict[("chr1", 100)].af == pytest.approx(0.3)
    assert r.variant_dict[("chr2", 300)].genotype == [1, 1]
    # single-contig int keys + indel discard
    r2 = VcfReader(path, ctg_name="chr1", discard_indel=True)
    r2.read_vcf()
    assert set(r2.variant_dict) == {100, 200}


def test_reader_gzip(tmp_path):
    path = str(tmp_path / "g.vcf.gz")
    with gzip.open(path, "wt") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        f.write("chr1\t100\t.\tA\tC\t30\tPASS\t.\tGT\t0/1\n")
    r = VcfReader(path)
    r.read_vcf()
    assert ("chr1", 100) in r.variant_dict
