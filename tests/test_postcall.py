"""PoN non-somatic tagging + final postprocess stage."""

import gzip

import pytest

from clairs_to_tpu.postcall.nonsomatic import tag_nonsomatic_file
from clairs_to_tpu.postcall.postprocess import postprocess_vcf, mark_low_qual
from clairs_to_tpu.vcf.writer import VcfWriter


def write_calls(path, rows, sample="SAMPLE"):
    w = VcfWriter(path, sample_name=sample, show_ref_calls=True)
    for row in rows:
        w.write_row(**row)
    w.close()
    return path


def _row(pos, ref="A", alt="C", qual=20.0, flt="PASS", info="FAU=1;FCU=2;FGU=0;FTU=0;RAU=1;RCU=2;RGU=0;RTU=0"):
    return dict(CHROM="chr1", POS=pos, REF=ref, ALT=alt, QUAL=qual, FILTER=flt,
                INFO=info, GT="0/1", DP=30, AF=0.2, AD="20,10", AU=2, CU=4, GU=0, TU=0)


def write_pon(path, records, compress=False):
    lines = ["##fileformat=VCFv4.2\n", "#CHROM\tPOS\tID\tREF\tALT\n"]
    for ctg, pos, ref, alt in records:
        lines.append(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\n")
    data = "".join(lines)
    if compress:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)
    return path


def test_pon_allele_matching(tmp_path):
    vcf = write_calls(str(tmp_path / "in.vcf"), [_row(100), _row(200, alt="G"), _row(300)])
    pon = write_pon(str(tmp_path / "pon.vcf"), [("chr1", 100, "A", "C"), ("chr1", 200, "A", "T")])
    out = str(tmp_path / "out.vcf")
    summary = tag_nonsomatic_file(vcf, out, [pon], require_allele_matching=[True])
    assert summary["tagged"] == 1  # pos 200 alt mismatch -> untouched
    body = [l for l in open(out) if not l.startswith("#")]
    by_pos = {int(l.split("\t")[1]): l for l in body}
    assert "NonSomatic" in by_pos[100]
    assert "PoN_1" in by_pos[100]
    assert "\tPASS\t" in by_pos[200]
    assert "\tPASS\t" in by_pos[300]
    # header gained the PoN INFO line after RefCall
    header = [l for l in open(out) if l.startswith("##INFO=<ID=PoN_1")]
    assert len(header) == 1 and "md5=" in header[0]


def test_pon_position_matching_gzip(tmp_path):
    vcf = write_calls(str(tmp_path / "in.vcf"), [_row(100), _row(200, alt="G")])
    pon = write_pon(str(tmp_path / "pon.vcf.gz"), [("chr1", 200, "A", "T")], compress=True)
    out = str(tmp_path / "out.vcf")
    summary = tag_nonsomatic_file(vcf, out, [pon], require_allele_matching=[False])
    assert summary["tagged"] == 1  # position match despite allele mismatch
    body = {int(l.split("\t")[1]): l for l in open(out) if not l.startswith("#")}
    assert "NonSomatic" in body[200]


def test_pon_tabix_fast_path(tmp_path):
    from clairs_to_tpu.vcf.tabix import write_tabix_vcf

    vcf = write_calls(str(tmp_path / "in.vcf"), [_row(100), _row(200, alt="G"), _row(90000)])
    pon_plain = write_pon(
        str(tmp_path / "pon.vcf"),
        [("chr1", 100, "A", "C"), ("chr1", 90000, "A", "C"), ("chr1", 500, "A", "T")],
    )
    pon_gz, tbi = write_tabix_vcf(pon_plain)
    out = str(tmp_path / "out.vcf")
    summary = tag_nonsomatic_file(vcf, out, [pon_gz], require_allele_matching=[True])
    assert summary["tagged"] == 2
    body = {int(l.split("\t")[1]): l for l in open(out) if not l.startswith("#")}
    assert "NonSomatic" in body[100]
    assert "NonSomatic" in body[90000]
    assert "\tPASS\t" in body[200]


def test_pon_multiple_pons_flags(tmp_path):
    vcf = write_calls(str(tmp_path / "in.vcf"), [_row(100)])
    pon1 = write_pon(str(tmp_path / "p1.vcf"), [("chr1", 100, "A", "C")])
    pon2 = write_pon(str(tmp_path / "p2.vcf"), [("chr1", 100, "A", "G")])
    out = str(tmp_path / "out.vcf")
    tag_nonsomatic_file(vcf, out, [pon1, pon2], require_allele_matching=[True, False])
    body = [l for l in open(out) if not l.startswith("#")][0]
    assert "PoN_1" in body and "PoN_2" in body


def test_postprocess_qual_gating(tmp_path):
    rows = [
        _row(100, qual=20.0),               # stays PASS
        _row(200, qual=5.0),                # below ont cutoff 8 -> LowQual
        _row(300, qual=10.0, info="H"),     # phaseable, above 8 -> PASS
        _row(400, qual=10.0),               # unphaseable, below 12 -> LowQual
    ]
    vcf = write_calls(str(tmp_path / "in.vcf"), rows)
    out = str(tmp_path / "out.vcf")
    postprocess_vcf(vcf, out, platform="ont")
    body = {int(l.split("\t")[1]): l.split("\t") for l in open(out) if not l.startswith("#")}
    assert body[100][6] == "PASS"
    assert body[200][6] == "LowQual"
    assert body[300][6] == "PASS"
    assert body[400][6] == "LowQual"
    # GQ updated to phred QUAL
    assert body[100][9].split(":")[1] == "20"


def test_postprocess_af_cutoff(tmp_path):
    r = _row(100, qual=20.0)
    r["AF"] = 0.01  # below 0.05 cutoff
    vcf = write_calls(str(tmp_path / "in.vcf"), [r, _row(200, qual=20.0)])
    out = str(tmp_path / "out.vcf")
    postprocess_vcf(vcf, out, platform="ont")
    positions = [int(l.split("\t")[1]) for l in open(out) if not l.startswith("#")]
    assert positions == [200]


def test_postprocess_ilmn_no_phase_cutoffs(tmp_path):
    vcf = write_calls(str(tmp_path / "in.vcf"), [_row(100, qual=5.0)])
    out = str(tmp_path / "out.vcf")
    postprocess_vcf(vcf, out, platform="ilmn")
    body = {int(l.split("\t")[1]): l.split("\t") for l in open(out) if not l.startswith("#")}
    # ilmn cutoff 4: qual 5 passes, and no unphaseable cutoff applies
    assert body[100][6] == "PASS"


def test_mark_low_qual_nonsomatic_combination():
    row = "chr1\t10\t.\tA\tC\t5.0\tNonSomatic\tFAU=0\tGT\t0/1"
    out = mark_low_qual(row, "ont", 8, 8, 12)
    cols = out.split("\t")
    assert cols[6] == "LowQual;NonSomatic"
    assert cols[5] == "0.0000"
