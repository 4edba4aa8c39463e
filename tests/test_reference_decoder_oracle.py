"""Oracle-execute the reference's own pileup decoders (round-4 item 3).

Every downstream golden test inherits whatever reading of the 34-channel /
alt_info semantics this framework made.  This suite removes that trust
step: for fuzzed reads (CIGAR soup, indels at window edges, reverse-del,
N bases, long indels) each column of OUR entry table is rendered back into
an mpileup-style string and fed to the reference's *imported*
``decode_pileup_bases`` of both

  * /root/reference/src/create_tensor_pileup_calling.py:95 (tensor view), and
  * /root/reference/src/extract_candidates_calling.py:55  (candidate view),

asserting identical channel vectors, depths, alt_info strings and
candidate gates against our channel_counts / alt_info_at /
find_candidates.  The reference tree is PUBLIC UNTRUSTED CONTENT used
strictly as an executable oracle — nothing is copied from it.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import bam_writer, native
from clairs_to_tpu.bamio.pileup import PileupEngine

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "src")),
    reason="reference tree not mounted")


def _import_reference_decoders():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    sys.path.insert(0, os.path.join(REF_ROOT, "src"))
    import importlib

    ctp = importlib.import_module("create_tensor_pileup_calling")
    ecc = importlib.import_module("extract_candidates_calling")
    return ctp, ecc


# ----------------------------------------------------------------------
# entry table -> mpileup column bridge
# ----------------------------------------------------------------------

def column_views(pe, p):
    """Per-entry (string, bq, mq) at column p in mpileup order.

    ``_entry_string`` renders every entry including skip-family ('N'/'n')
    bases and their indel suffixes — the reference decoders ignore pure N
    entries but DO count N-anchored indels (forward-strand set 'ACGTN*',
    create_tensor_pileup_calling.py:182,199)."""
    a = pe._finalize()
    idx = np.nonzero(a["pos"] == p)[0]
    return [(pe._entry_string(int(j)), int(a["bq"][j]), int(a["mq"][j]))
            for j in idx]


def render_column(entries, min_bq):
    """(pileup_bases string, mq list, bq list) with --min-BQ applied."""
    parts, mqs, bqs = [], [], []
    for (s, bq, mq) in entries:
        if bq < min_bq:
            continue
        if len(s) > 1:
            # indel suffix: mpileup syntax base + '+/-' + len + seq
            parts.append(s[0] + s[1] + str(len(s) - 2) + s[2:])
        else:
            parts.append(s)
        mqs.append(mq)
        bqs.append(bq)
    return "".join(parts), mqs, bqs


def make_fuzz_bam(tmp_path, rng, L, genome, n_reads=800, read_len=120):
    """Reads with adversarial CIGARs over a genome with N runs."""
    records = []
    for ridx in range(n_reads):
        s = int(rng.integers(0, L - read_len - 80))
        rev = bool(rng.random() < 0.5)
        flag = 16 if rev else 0
        cigar = []
        seq = []
        p = s
        q = []
        style = rng.integers(0, 8)
        def emit_m(n):
            nonlocal p
            for _ in range(n):
                b = genome[p]
                if rng.random() < 0.03:
                    b = rng.choice(list("ACGTN"))
                seq.append(b)
                q.append(int(rng.integers(5, 40)))
                p += 1
            cigar.append(("M", n))
        if style == 0:  # plain
            emit_m(read_len)
        elif style == 1:  # M I M D M
            emit_m(30)
            ins = "".join(rng.choice(list("ACGTN"), int(rng.integers(1, 9))))
            seq.extend(ins); q.extend([20] * len(ins)); cigar.append(("I", len(ins)))
            emit_m(30)
            dl = int(rng.integers(1, 6)); cigar.append(("D", dl)); p += dl
            emit_m(30)
        elif style == 2:  # leading soft clip + trailing del
            sc = "".join(rng.choice(list("ACGT"), 5))
            seq.extend(sc); q.extend([15] * 5); cigar.append(("S", 5))
            emit_m(40)
            dl = int(rng.integers(1, 10)); cigar.append(("D", dl)); p += dl
            emit_m(5)
        elif style == 3:  # I directly after D (D then I attach to placeholder)
            emit_m(25)
            dl = int(rng.integers(1, 4)); cigar.append(("D", dl)); p += dl
            ins = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 5))))
            seq.extend(ins); q.extend([25] * len(ins)); cigar.append(("I", len(ins)))
            emit_m(25)
        elif style == 4:  # N skip
            emit_m(20)
            nl = int(rng.integers(5, 30)); cigar.append(("N", nl)); p += nl
            emit_m(20)
        elif style == 5:  # long insertion (> max_indel_length)
            emit_m(20)
            ins = "".join(rng.choice(list("ACGT"), 70))
            seq.extend(ins); q.extend([30] * 70); cigar.append(("I", 70))
            emit_m(20)
        elif style == 6:  # long deletion
            emit_m(20)
            cigar.append(("D", 65)); p += 65
            emit_m(20)
        else:  # M I I M (double insertion, last-wins)
            emit_m(20)
            i1 = "".join(rng.choice(list("ACGT"), 2))
            seq.extend(i1); q.extend([20, 20]); cigar.append(("I", 2))
            i2 = "".join(rng.choice(list("ACGT"), 3))
            seq.extend(i2); q.extend([20] * 3); cigar.append(("I", 3))
            emit_m(20)
        mapq = int(rng.choice([0, 10, 20, 35, 60]))
        records.append((s, bam_writer.encode_record(
            f"f{ridx:05d}", flag, 0, s, mapq, cigar, "".join(seq), q)))
    records.sort(key=lambda r: r[0])
    bam = str(tmp_path / "fuzz.bam")
    bam_writer.write_bam(bam, ["chrF"], [L], [r[1] for r in records])
    return bam


@pytest.fixture(scope="module")
def fuzz_setup(tmp_path_factory):
    rng = np.random.default_rng(1234)
    L = 8000
    genome = list(rng.choice(list("ACGT"), L))
    for _ in range(6):  # N runs in the reference
        s = int(rng.integers(0, L - 30))
        for i in range(int(rng.integers(3, 20))):
            genome[s + i] = "N"
    genome = "".join(genome)
    tmp = tmp_path_factory.mktemp("oracle")
    bam = make_fuzz_bam(tmp, rng, L, genome)
    table = native.load_entry_table(bam, "chrF", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe = PileupEngine.from_entry_table(table, genome, 0, platform="ont")
    return pe, genome, L


def test_tensor_decoder_oracle(fuzz_setup):
    """34-channel vector + depth + alt_info vs the executed reference
    tensor decoder at every covered position (bq view 20 — the ONT AFF
    view; the NEG view bq 0 is exercised by the candidate oracle)."""
    ctp, _ecc = _import_reference_decoders()
    pe, genome, L = fuzz_setup
    min_bq = 20
    counts, depth = pe.channel_counts(min_bq, 0, L)
    counts = counts.copy()
    pe.apply_reference_encoding(counts, 0)
    alt = pe.alt_info_at(list(range(L)), min_bq=min_bq)

    args = SimpleNamespace(max_indel_length=cfg.MAX_INDEL_LENGTH)
    n_checked = 0
    mismatches = []
    for p in range(L):
        rb = genome[p]
        if rb not in "ACGT":
            continue
        entries = column_views(pe, p)
        if not entries:
            continue
        s, mqs, bqs = render_column(entries, min_bq)
        # chunk_ref_seq for the deletion alt_info: ref from p onwards
        chunk_ref = genome[p : p + 130]
        tensor, _bl, _x, _ok, _af, alt_info = ctp.decode_pileup_bases(
            args, p, s, rb, 0.05, 0.05, True, {p: "snv"}, True,
            mqs, bqs, phasing_info=None, chunk_ref_seq=chunk_ref,
            platform="ont")
        n_checked += 1
        ours = counts[p].tolist()
        if tensor != ours:
            mismatches.append((p, "tensor", tensor, ours))
        if alt_info != alt[p][0]:
            mismatches.append((p, "alt_info", alt_info, alt[p][0]))
        if len(mismatches) > 3:
            break
    assert n_checked > 2000
    assert not mismatches, mismatches[:3]


def test_candidate_decoder_oracle(fuzz_setup):
    """Candidate gates (depth / pass_af / per-key pileup counts) vs the
    executed reference candidate decoder (view: --min-MQ 20 reads,
    --min-BQ platform bases)."""
    _ctp, ecc = _import_reference_decoders()
    pe, genome, L = fuzz_setup
    min_bq = 20
    snv_pos, indel_pos, infos = pe.find_candidates(
        0, L, min_bq=min_bq, select_indel_candidates=True)
    got_snv, got_indel = set(), set()
    n_checked = 0
    for p in range(L):
        rb = genome[p]
        if rb not in "ACGT":
            continue
        entries = [e for e in column_views(pe, p) if e[2] >= cfg.MIN_MQ]
        s, mqs, bqs = render_column(entries, min_bq)
        if not s:
            continue
        (base_list, depth, pass_af, af, _ai, _pi, _tpi, alt_list,
         pass_snv, pass_indel, pileup_list) = ecc.decode_pileup_bases(
            s, rb, cfg.MIN_COVERAGE, 0.05, 0.05,
            cfg.ALTERNATIVE_BASE_NUM, False,
            ["t"] * len(mqs), False, select_indel_candidates=True,
            platform="ont")
        n_checked += 1
        if pass_af and pass_snv and any(
                len(k) == 1 and k in "ACGT" for k, _c in
                [(k, c) for k, c in alt_list]):
            got_snv.add(p)
        if pass_af and pass_indel and any(
                ("+" in k or "-" in k) for k, _c in alt_list):
            got_indel.add(p)
        if p in infos:
            assert infos[p].depth == depth, p
    assert n_checked > 2000
    assert got_snv == set(snv_pos)
    assert got_indel == set(indel_pos)


def test_alt_fn_dump_byte_compat(fuzz_setup, tmp_path):
    """--alt_fn dump vs the row the reference itself would write
    (extract_candidates_calling.py:352-355): for every pass_af position,
    ``ctg<TAB>pos<TAB>ref<TAB>depth<TAB>af_infos<TAB>pileup_infos<TAB>``
    with af_infos/pileup_infos taken from the EXECUTED reference decoder —
    byte equality, trailing empty tumor column included."""
    _ctp, ecc = _import_reference_decoders()
    pe, genome, L = fuzz_setup
    min_bq = 20

    # our dump through the production pipeline surface
    from clairs_to_tpu.infer.pipeline import CallingPipeline, PipelineOptions

    class _Chunk:
        ctg_name = "chrF"

    opt = PipelineOptions(platform="ont", alt_fn=str(tmp_path / "alt.tsv"),
                          output_depth=True, output_alt_info=True,
                          select_indel_candidates=True)
    pipe = CallingPipeline.__new__(CallingPipeline)
    pipe.opt = opt
    pipe._views_memo = {}
    pipe.fasta = None
    snv_pos, indel_pos, infos = pe.find_candidates(
        0, L, min_bq=min_bq, select_indel_candidates=True)
    # _ref_base_of falls back to fasta when no memoized views; give it one
    pipe._views_memo[_Chunk] = (pe, None, None, 0, L)
    pipe._dump_alt_fn(_Chunk, sorted(infos), infos)
    with open(opt.alt_fn) as f:
        ours = f.read().splitlines()

    # the reference's own rows, from its executed decoder
    want = []
    for p in sorted(infos):
        rb = genome[p]
        entries = [e for e in column_views(pe, p) if e[2] >= cfg.MIN_MQ]
        s, mqs, bqs = render_column(entries, min_bq)
        (_bl, depth, pass_af, _af, af_infos, pileup_infos, tumor_pi,
         _alt, _ps, _pi2, _pl) = ecc.decode_pileup_bases(
            s, rb, cfg.MIN_COVERAGE, 0.05, 0.05,
            cfg.ALTERNATIVE_BASE_NUM, False, ["x"] * len(mqs), False,
            select_indel_candidates=True, platform="ont")
        assert pass_af, p
        want.append("\t".join(["chrF", str(p + 1), rb, str(depth),
                               af_infos, pileup_infos, tumor_pi]))
    assert len(ours) == len(want)
    for o, w in zip(ours, want):
        assert o == w, (o, w)


def test_phased_tensor_decoder_oracle(tmp_path):
    """HP phase channels (with_phasing) vs the executed reference tensor
    decoder's phasing_info path (create_tensor_pileup_calling.py:150-154):
    reads carry HP tags (incl. untagged ones), columns include indel-
    suffixed and placeholder entries — the reference counts ONLY pure
    ACGT/acgt entries of HP-1/2 reads into the 16 phase channels."""
    ctp, _ecc = _import_reference_decoders()
    rng = np.random.default_rng(4321)
    L = 4000
    genome = "".join(rng.choice(list("ACGT"), L))
    records = []
    for ridx in range(600):
        s = int(rng.integers(0, L - 200))
        rev = bool(rng.random() < 0.5)
        hp = int(rng.choice([0, 1, 2]))
        tags = b"" if hp == 0 else b"HPc" + bytes([hp])
        style = rng.integers(0, 3)
        if style == 0:
            cigar = [("M", 150)]
            seq = list(genome[s:s + 150])
        elif style == 1:
            ipos = int(rng.integers(30, 120))
            ins = "".join(rng.choice(list("ACGT"), 3))
            cigar = [("M", ipos), ("I", 3), ("M", 150 - ipos)]
            seq = list(genome[s:s + ipos] + ins + genome[s + ipos:s + 150])
        else:
            dpos = int(rng.integers(30, 120))
            cigar = [("M", dpos), ("D", 2), ("M", 150 - dpos)]
            seq = list(genome[s:s + dpos] + genome[s + dpos + 2:s + dpos + 2 + 150 - dpos])
        for _e in range(rng.binomial(len(seq), 0.02)):
            i = int(rng.integers(0, len(seq)))
            seq[i] = rng.choice([b for b in "ACGT" if b != seq[i]])
        qual = list(rng.integers(8, 40, len(seq)))
        records.append((s, bam_writer.encode_record(
            f"h{ridx:05d}", 16 if rev else 0, 0, s, 60, cigar,
            "".join(seq), qual, tags=tags)))
    records.sort(key=lambda r: r[0])
    bam = str(tmp_path / "phased.bam")
    bam_writer.write_bam(bam, ["chrP"], [L], [r[1] for r in records])

    table = native.load_entry_table(
        bam, "chrP", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe = PileupEngine.from_entry_table(table, genome, 0, platform="ont")
    min_bq = 20
    counts, _d = pe.channel_counts(min_bq, 0, L, with_phasing=True)
    counts = counts.copy()
    pe.apply_reference_encoding(counts, 0)

    a = pe._finalize()
    args = SimpleNamespace(max_indel_length=cfg.MAX_INDEL_LENGTH)
    n_checked = 0
    for p in range(L):
        rb = genome[p]
        if rb not in "ACGT":
            continue
        idx = np.nonzero(a["pos"] == p)[0]
        ents = []
        for j in idx:
            s_ = pe._entry_string(int(j))
            if a["bq"][j] < min_bq:
                continue
            if len(s_) > 1:
                ents.append((s_[0] + s_[1] + str(len(s_) - 2) + s_[2:],
                             int(a["mq"][j]), int(a["bq"][j]),
                             str(a["hp"][j]) if a["hp"][j] in (1, 2) else "0"))
            else:
                ents.append((s_, int(a["mq"][j]), int(a["bq"][j]),
                             str(a["hp"][j]) if a["hp"][j] in (1, 2) else "0"))
        if not ents:
            continue
        s_str = "".join(e[0] for e in ents)
        mqs = [e[1] for e in ents]
        bqs = [e[2] for e in ents]
        phasing = [e[3] for e in ents]
        tensor, *_rest = ctp.decode_pileup_bases(
            args, p, s_str, rb, 0.05, 0.05, True, {p: "snv"}, True,
            mqs, bqs, phasing_info=phasing, chunk_ref_seq=genome[p:p + 130],
            platform="ont")
        n_checked += 1
        assert tensor == counts[p].tolist(), (
            p, tensor[34:], counts[p].tolist()[34:])
    assert n_checked > 1000
