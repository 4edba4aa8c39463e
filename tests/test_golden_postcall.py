"""Golden file-level parity vs /root/reference for the VCF post-call stages:

- postprocess_vcf (src/postprocess_vcf.py merge_vcf): qual/AF gating,
  phaseable (INFO H) vs unphaseable cutoffs, GQ phred update, non-PASS
  re-append rules, contig ordering.
- nonsomatic_tagging (src/nonsomatic_tagging.py): streaming PoN matching
  (allele and position modes), NonSomatic FILTER + PoN_k INFO + md5 headers.
- Verdict tag_germline_variant (src/verdict/tag_germline_variant.py):
  binomial log-odds decision tree over CNA segments.

Both implementations consume identical input files; output rows must match
byte-for-byte (bodies) / decision-for-decision.
"""

import gzip
import os
import sys
from argparse import Namespace

import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from src import postprocess_vcf as ref_pp  # noqa: E402
    from src import nonsomatic_tagging as ref_ns  # noqa: E402
    from src.verdict import tag_germline_variant as ref_tg  # noqa: E402
except Exception:  # pragma: no cover
    ref_pp = None

from clairs_to_tpu.postcall.postprocess import postprocess_vcf  # noqa: E402
from clairs_to_tpu.postcall.nonsomatic import tag_nonsomatic_file  # noqa: E402
from clairs_to_tpu.verdict.tagging import tag_vcf_rows  # noqa: E402
from clairs_to_tpu.vcf.writer import VCF_HEADER  # noqa: E402

pytestmark = pytest.mark.skipif(ref_pp is None, reason="reference unavailable")


def _body(path):
    with open(path) as f:
        return [l for l in f if not l.startswith("#")]


def _mk_vcf(path, rows, sample="SAMPLE"):
    """rows: list of 10-column tab rows (no newline)."""
    cols = "\t".join(["#CHROM", "POS", "ID", "REF", "ALT", "QUAL",
                      "FILTER", "INFO", "FORMAT", sample])
    with open(path, "w") as f:
        f.write(VCF_HEADER)
        f.write(cols + "\n")
        for r in rows:
            f.write(r + "\n")
    return path


FMT = "GT:GQ:DP:AF:AD:AU:CU:GU:TU"


def _row(ctg, pos, ref, alt, qual, filt, info, gt="0/1", gq=None, dp=60,
         af=0.3, ad=None):
    gq = qual if gq is None else gq
    ad = ad or f"{int(dp * (1 - af))},{int(dp * af)}"
    sample = f"{gt}:{gq:.0f}" if isinstance(gq, int) else f"{gt}:{gq}"
    sample = f"{gt}:{int(gq)}:{dp}:{af:.4f}:{ad}:0:0:{int(dp*af)}:{int(dp*(1-af))}"
    return "\t".join([ctg, str(pos), ".", ref, alt, f"{qual:.4f}", filt,
                      info, FMT, sample])


def test_postprocess_golden(tmp_path):
    rows = [
        # PASS, phaseable (H), qual between phaseable(8) and unphaseable(12)
        _row("chr1", 120, "A", "C", 10.5, "PASS", "H;FAU=1", af=0.3),
        # PASS, unphaseable, same qual -> LowQual under ONT cutoffs
        _row("chr1", 240, "G", "T", 10.5, "PASS", "FAU=1", af=0.3),
        # PASS, high qual both ways
        _row("chr1", 360, "T", "G", 25.0, "PASS", "H;FAU=2", af=0.4),
        # PASS below phaseable cutoff
        _row("chr1", 480, "C", "A", 5.0, "PASS", "H;FAU=0", af=0.2),
        # PASS below AF cutoff (ont af_dict) -> dropped entirely
        _row("chr1", 600, "A", "G", 22.0, "PASS", "FAU=1", af=0.02),
        # non-PASS rows re-appended with QUAL zeroing rules
        _row("chr1", 720, "A", "T", 9.0, "LowQual;StrandBias", "SB=0.0001"),
        _row("chr1", 840, "G", "C", 14.0, "NonSomatic", "PoN_1"),
        _row("chr1", 960, "T", "A", 3.0, "RefCall", "FAU=0", gt="0/0"),
        # contig ordering: chr2 + a non-major contig
        _row("chr2", 55, "C", "G", 18.0, "PASS", "H;FAU=3", af=0.35),
        _row("chrUn_KI270742v1", 77, "A", "C", 19.0, "PASS", "FAU=1", af=0.3),
    ]
    src = _mk_vcf(str(tmp_path / "in.vcf"), rows)
    cmdline = str(tmp_path / "CMD")
    with open(cmdline, "w") as f:
        f.write("run_clairs_to -T t.bam -R r.fa\n")

    ref_out = str(tmp_path / "ref.vcf")
    ref_pp.merge_vcf(Namespace(
        compress_vcf=False, platform="ont", cmdline=cmdline,
        max_qual_filter_pileup_calls=None, qual=None,
        qual_cutoff_phaseable_region=None, qual_cutoff_unphaseable_region=None,
        af=None, pileup_vcf_fn=src, output_fn=ref_out, ref_fn=None,
        sample_name="SAMPLE",
    ))
    mine_out = str(tmp_path / "mine.vcf")
    postprocess_vcf(src, mine_out, "ont", cmdline=open(cmdline).read().strip(),
                    compress_vcf=False)

    ref_rows = _body(ref_out)
    my_rows = _body(mine_out)
    assert ref_rows == my_rows
    # sanity: the interesting transitions actually happened
    txt = "".join(ref_rows)
    assert "LowQual" in txt and "NonSomatic" in txt
    assert "\t600\t" not in txt  # AF-filtered PASS row dropped


def _mk_pon(path, entries, gz):
    lines = ["##fileformat=VCFv4.2\n",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"]
    for (ctg, pos, ref, alt) in entries:
        lines.append(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t.\t.\t.\n")
    data = "".join(lines)
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)
    return path


def test_nonsomatic_tagging_golden(tmp_path, monkeypatch):
    rows = [
        _row("chr1", 100, "A", "C", 20.0, "PASS", "FAU=1"),   # pon1 allele hit
        _row("chr1", 200, "G", "T", 21.0, "PASS", "FAU=1"),   # pon1 wrong allele
        _row("chr1", 300, "T", "G", 22.0, "PASS", "FAU=1"),   # pon2 position hit
        _row("chr1", 400, "C", "A", 23.0, "PASS", "FAU=1"),   # no hit
        _row("chr1", 500, "A", "G", 9.0, "LowQual", "FAU=0"),  # non-PASS: untouched
        _row("chr2", 150, "G", "C", 24.0, "PASS", "FAU=2"),   # both PoNs hit
    ]
    src = _mk_vcf(str(tmp_path / "in.vcf"), rows)
    pon1 = _mk_pon(str(tmp_path / "pon1.vcf.gz"), [
        ("chr1", 100, "A", "C"), ("chr1", 200, "G", "A"), ("chr2", 150, "G", "C"),
    ], gz=True)
    pon2 = _mk_pon(str(tmp_path / "pon2.vcf"), [
        ("chr1", 300, "C", "T"), ("chr2", 150, "T", "T"),
    ], gz=False)

    ref_out = str(tmp_path / "ref.vcf")
    monkeypatch.setattr(sys, "argv", [
        "nonsomatic_tagging",
        "--pileup_vcf_fn", src,
        "--panel_of_normals", f"{pon1},{pon2}",
        "--panel_of_normals_require_allele_matching", "True,False",
        "--output_vcf_fn", ref_out,
    ])
    ref_ns.main()

    mine_out = str(tmp_path / "mine.vcf")
    tag_nonsomatic_file(src, mine_out, [pon1, pon2],
                        require_allele_matching=[True, False])

    ref_rows = _body(ref_out)
    my_rows = _body(mine_out)
    assert ref_rows == my_rows
    txt = "".join(ref_rows)
    assert "PoN_1" in txt and "PoN_2" in txt and "NonSomatic" in txt
    # PoN header provenance lines (file + md5) must match exactly
    ref_hdr = sorted(l for l in open(ref_out) if l.startswith("##INFO=<ID=PoN"))
    my_hdr = sorted(l for l in open(mine_out) if l.startswith("##INFO=<ID=PoN"))
    assert ref_hdr == my_hdr


def test_verdict_tagging_golden(tmp_path):
    purity = 0.45
    pp = str(tmp_path / "purity.txt")
    with open(pp, "w") as f:
        f.write("sample\tpurity\tploidy\nS\t%s\t2.4\n" % purity)
    cna = str(tmp_path / "cna.txt")
    segments = [
        ("chr1", 1, 100000, 2, 1),
        ("chr1", 100001, 200000, 3, 0),
        ("chr2", 1, 150000, 2, 2),
    ]
    with open(cna, "w") as f:
        f.write("\tchr\tstart\tend\tnMajor\tnMinor\n")
        for i, (c, s, e, M, m) in enumerate(segments):
            f.write(f'{i+1}\t"{c}"\t{s}\t{e}\t{M}\t{m}\n')

    cases = [
        ("chr1", 5000, 0.50, 80),    # germline-like AF in 2+1 segment
        ("chr1", 6000, 0.18, 90),    # somatic-like
        ("chr1", 7000, 0.99, 70),    # AF>0.95 hard germline
        ("chr1", 8000, 0.03, 100),   # subclonal (af<0.05, 0.2<p<0.6)
        ("chr1", 150000, 0.33, 60),  # LOH segment 3+0
        ("chr1", 160000, 0.08, 120),
        ("chr2", 5000, 0.25, 50),    # balanced 2+2
        ("chr2", 9000, 0.47, 200),
        ("chr1", 250000, 0.4, 75),   # outside all segments: untouched
    ]
    rows = [_row(c, p, "A", "C", 20.0, "PASS", "FAU=1", af=af, dp=dp)
            for (c, p, af, dp) in cases]
    rows.append(_row("chr1", 5500, "G", "T", 5.0, "LowQual", "FAU=0", af=0.5))
    src = _mk_vcf(str(tmp_path / "in.vcf"), rows)

    # The reference module's `from numpy import *` shadows round/max/min
    # under numpy>=2.0 (they entered numpy's __all__ in 2.0; the reference
    # targets 1.x where the builtins survive the star-import).  Restore the
    # builtins the reference actually ran with.
    import builtins
    ref_tg.round = builtins.round
    ref_tg.max = builtins.max
    ref_tg.min = builtins.min

    ref_out = str(tmp_path / "ref.vcf")
    ref_tg.tag_germline_variant(Namespace(
        input_vcf_fn=src, tumor_purity_ploidy_output_file=pp,
        tumor_cna_output_file=cna, output_fn=ref_out,
    ))

    # mine: parse the same rows, tag in memory
    my_rows = []
    for line in _body(src):
        cols = line.rstrip("\n").split("\t")
        fmt = cols[8].split(":")
        sample = cols[9].split(":")
        my_rows.append({
            "CHROM": cols[0], "POS": int(cols[1]), "FILTER": cols[6],
            "INFO": cols[7], "AF": float(sample[fmt.index("AF")]),
            "DP": int(sample[fmt.index("DP")]),
        })
    tag_vcf_rows(my_rows, purity, segments)

    ref_rows = _body(ref_out)
    assert len(ref_rows) == len(my_rows)
    decisions = 0
    for line, mine in zip(ref_rows, my_rows):
        cols = line.rstrip("\n").split("\t")
        assert (cols[0], int(cols[1])) == (mine["CHROM"], mine["POS"])
        assert cols[6] == mine["FILTER"], (cols[0], cols[1])
        assert cols[7] == mine["INFO"], (cols[0], cols[1])
        if "Verdict_" in cols[7]:
            decisions += 1
    assert decisions >= 3  # the tree actually fired on several branches
