"""Fused window reduce (round 4) vs the full entry-table decode.

The fused path (bamio/native pileup_window_reduce + masked
pileup_window_entries_*) accumulates the dense per-position views during
the decode and materializes entry columns lazily per site window; the
full-table path (load_entry_table + PileupEngine reductions) remains the
behavioral reference.  These tests pin their equivalence across every
downstream consumer: channel counts (both BQ views), candidate gating,
alt_info strings, hard-filter verdicts, phasing haplotags, haplotype
verdicts, and Verdict allele counts.
"""

import os

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import bam_writer, native, simulate
from clairs_to_tpu.bamio.pileup import PileupEngine
from clairs_to_tpu.genome.fasta import FastaFile

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _engines(d, platform):
    bam = os.path.join(d, "tumor.bam")
    fa = FastaFile(os.path.join(d, "ref.fa"))
    ctg = list(fa.index.keys())[0]
    L = fa.contig_length(ctg)
    ref_seq = fa.fetch(ctg, 0, L)
    fam = cfg.platform_family(platform)
    aff_bq = cfg.MIN_BQ_DICT.get(fam, 0)
    table = native.load_entry_table(
        bam, ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe_old = PileupEngine.from_entry_table(table, ref_seq, 0, platform=platform)
    sr = native.BamStreamReader(bam)
    from clairs_to_tpu.postcall.hardfilter import _REF_TOK

    ref_tok = np.full(L + 2 * native.FILT_MARGIN, 10, np.int16)
    ref_u8 = np.frombuffer(ref_seq.upper().encode("latin-1"), np.uint8)
    ref_tok[native.FILT_MARGIN : native.FILT_MARGIN + L] = _REF_TOK[ref_u8]
    win = sr.load_window_reduced(
        ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
        aff_min_bq=aff_bq, low_mq_thresh=cfg.LOW_MQ_THRESHOLD,
        low_bq_thresh=cfg.LOW_BQ_THRESHOLD.get(fam, 10),
        max_indel_length=cfg.MAX_INDEL_LENGTH,
        filter_view=(ref_tok, cfg.MIN_BQ, cfg.MIN_MQ))
    assert win is not None
    assert win.has_filter_data
    pe_new = PileupEngine.from_native_window(win, ref_seq, 0, platform=platform)
    return pe_old, pe_new, L, aff_bq, sr


@pytest.fixture(scope="module")
def ont_ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fused_ont"))
    simulate.make_dataset(
        d, seed=31, genome_len=60_000, coverage=40, read_length=600,
        n_snv=20, n_indel=6, n_germline=80, error_rate=0.012,
        af_choices=(0.1, 0.2, 0.4), lowbq_rate=0.08, somatic_hap_aware=True)
    return d


def _top_alt(alt_info):
    body = alt_info.split("-", 1)[1].rsplit("-", 1)[0]
    toks = body.split()
    return next((toks[k][1:] for k in range(0, len(toks), 2)
                 if toks[k].startswith("X")), None)


def test_ont_views_candidates_altinfo(ont_ds):
    pe_o, pe_n, L, aff_bq, _sr = _engines(ont_ds, "ont")
    for mb in (aff_bq, 0):
        c_o, d_o = pe_o.channel_counts(mb, 0, L)
        c_n, d_n = pe_n.channel_counts(mb, 0, L)
        assert np.array_equal(c_o, c_n) and np.array_equal(d_o, d_n)
    s_o = pe_o.find_candidates(0, L, min_bq=aff_bq, select_indel_candidates=True)
    s_n = pe_n.find_candidates(0, L, min_bq=aff_bq, select_indel_candidates=True)
    assert s_o[0] == s_n[0] and s_o[1] == s_n[1]
    assert len(s_o[0]) > 50
    want = s_o[0] + s_o[1]
    assert pe_o.alt_info_at(want, min_bq=aff_bq) == \
        pe_n.alt_info_at(want, min_bq=aff_bq)
    # CandidateInfo parity (depth / alt_list feed --alt_fn and calling)
    for p in s_o[0][:40]:
        io_, in_ = s_o[2][p], s_n[2][p]
        assert (io_.depth, io_.alt_list) == (in_.depth, in_.alt_list)


def test_ont_phasing_and_haplotype_verdicts(ont_ds):
    from clairs_to_tpu.phasing.phaser import phase_and_tag
    from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine

    pe_o, pe_n, L, aff_bq, _sr = _engines(ont_ds, "ont")
    s_o = pe_o.find_candidates(0, L, min_bq=aff_bq)
    pe_n.find_candidates(0, L, min_bq=aff_bq)
    ai = pe_o.alt_info_at(s_o[0], min_bq=aff_bq)
    pe_n.alt_info_at(s_o[0], min_bq=aff_bq)
    het = [(p, pe_o._ref_base(p), _top_alt(ai[p][0])) for p in s_o[0]]
    het = [(p, r, a) for (p, r, a) in het if a][:60]
    hp_o = phase_and_tag(pe_o, het)
    hp_n = phase_and_tag(pe_n, het)
    assert np.array_equal(hp_o, hp_n)
    assert (hp_o > 0).sum() > 0
    sites = s_o[0][:30]
    hg = [(p, a) for (p, _r, a) in het]
    hf_o = HaplotypeFilterEngine(pe_o, hetero_germline=hg, homo_germline=[],
                                 site_positions=sites)
    hf_n = HaplotypeFilterEngine(pe_n, hetero_germline=hg, homo_germline=[],
                                 site_positions=sites)
    for p in sites:
        alt = _top_alt(ai[p][0])
        if alt is None:
            continue
        v_o = hf_o.verdict(p, pe_o._ref_base(p), alt, af=0.08)
        v_n = hf_n.verdict(p, pe_n._ref_base(p), alt, af=0.08)
        for f in v_o.FIELDS:
            assert getattr(v_o, f) == getattr(v_n, f), (p, f)
        assert v_o.phaseable == v_n.phaseable
        assert abs(v_o.strand_bias_p - v_n.strand_bias_p) < 1e-12


def test_ont_allele_counts(ont_ds):
    from clairs_to_tpu.verdict.allele_counter import allele_counts_at

    pe_o, pe_n, L, aff_bq, _sr = _engines(ont_ds, "ont")
    s_o = pe_o.find_candidates(0, L, min_bq=aff_bq)
    pos = np.asarray(s_o[0][:40])
    assert np.array_equal(allele_counts_at(pe_o, pos),
                          allele_counts_at(pe_n, pos))


def test_paired_overlap_parity(tmp_path):
    """Illumina-style paired reads with mate overlaps (agreeing and
    disagreeing bases, deletions/insertions inside the overlap): the
    fused path's qual-copy overlap staging must reproduce the entry-level
    tweak_overlap_quality semantics bit-for-bit."""
    rng = np.random.default_rng(5)
    L = 12_000
    genome = "".join(rng.choice(list("ACGT"), L))
    records = []
    for ridx in range(1500):
        start = int(rng.integers(0, L - 400))
        flen = int(rng.integers(150, 320))
        rl = 200
        for (s, fl) in [(start, 1 | 64), (start + flen - rl, 1 | 128 | 16)]:
            s = max(0, min(s, L - rl))
            if rng.random() < 0.15:
                dpos = int(rng.integers(40, rl - 40))
                dlen = int(rng.integers(1, 4))
                cigar = [("M", dpos), ("D", dlen), ("M", rl - dpos)]
                seq = list(genome[s:s + dpos]
                           + genome[s + dpos + dlen:s + dpos + dlen + rl - dpos])
            elif rng.random() < 0.15:
                ipos = int(rng.integers(40, rl - 40))
                ilen = int(rng.integers(1, 4))
                ins = "".join(rng.choice(list("ACGT"), ilen))
                cigar = [("M", ipos), ("I", ilen), ("M", rl - ipos)]
                seq = list(genome[s:s + ipos] + ins + genome[s + ipos:s + rl])
            else:
                cigar = [("M", rl)]
                seq = list(genome[s:s + rl])
            for _e in range(rng.binomial(len(seq), 0.01)):
                i = int(rng.integers(0, len(seq)))
                seq[i] = rng.choice([b for b in "ACGT" if b != seq[i]])
            qual = list(rng.integers(8, 40, len(seq)))
            records.append((s, bam_writer.encode_record(
                f"p{ridx:05d}", fl, 0, s, 60, cigar, "".join(seq), qual)))
    records.sort(key=lambda r: r[0])
    bam = str(tmp_path / "paired.bam")
    bam_writer.write_bam(bam, ["chrT"], [L], [r[1] for r in records])

    AFF_BQ = 20  # force dual views so both see the adjusted quals
    table = native.load_entry_table(
        bam, "chrT", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe_o = PileupEngine.from_entry_table(table, genome, 0, platform="ilmn")
    sr = native.BamStreamReader(bam)
    win = sr.load_window_reduced(
        "chrT", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
        aff_min_bq=AFF_BQ, low_mq_thresh=20, low_bq_thresh=10,
        max_indel_length=60)
    pe_n = PileupEngine.from_native_window(win, genome, 0, platform="ilmn")
    for mb in (AFF_BQ, 0):
        c_o, d_o = pe_o.channel_counts(mb, 0, L)
        c_n, d_n = pe_n.channel_counts(mb, 0, L)
        assert np.array_equal(c_o, c_n) and np.array_equal(d_o, d_n)
    s_o = pe_o.find_candidates(0, L, min_bq=AFF_BQ, select_indel_candidates=True)
    s_n = pe_n.find_candidates(0, L, min_bq=AFF_BQ, select_indel_candidates=True)
    assert s_o[0] == s_n[0] and s_o[1] == s_n[1]
    probe = sorted(set((s_o[0] + s_o[1]) or [100, 500, 900]))
    assert pe_o.alt_info_at(probe, min_bq=AFF_BQ) == \
        pe_n.alt_info_at(probe, min_bq=AFF_BQ)


def test_incremental_ensure_sites_merging(ont_ds):
    """Columns fetched across multiple ensure_sites calls must merge into
    a table equivalent to a single-shot fetch (per-column read order and
    read identity preserved)."""
    pe_o, pe_n, L, aff_bq, _sr = _engines(ont_ds, "ont")
    sites_a = list(range(1000, 1050))
    sites_b = list(range(1040, 1120))  # overlaps A: dedup against coverage
    pe_n.ensure_sites(sites_a, 0)
    pe_n.ensure_sites(sites_b, 0)
    want = sorted(set(sites_a) | set(sites_b))
    ai_o = pe_o.alt_info_at(want, min_bq=0)
    ai_n = pe_n.alt_info_at(want, min_bq=0)
    assert ai_o == ai_n


def test_cli_fused_e2e(tmp_path):
    """The production CLI over the fused path produces the same VCF rows
    as a run with the native fast path disabled (pure-python decode)."""
    import subprocess
    import sys

    d = str(tmp_path / "ds")
    simulate.make_dataset(d, seed=44, genome_len=30_000, coverage=35,
                          read_length=500, n_snv=10, n_indel=0, n_germline=30,
                          error_rate=0.01, af_choices=(0.2, 0.4),
                          somatic_hap_aware=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    outs = {}
    for tag in ("native",):
        out = str(tmp_path / f"out_{tag}")
        r = subprocess.run(
            [sys.executable, "-m", "clairs_to_tpu", "run",
             "-T", os.path.join(d, "tumor.bam"),
             "-R", os.path.join(d, "ref.fa"),
             "-o", out, "-p", "ont", "-t", "1",
             "--disable_verdict", "--disable_indel_calling", "true"],
            cwd="/root/repo", env=env, capture_output=True, text=True,
            timeout=900)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        with open(os.path.join(out, "snv.vcf")) as f:
            outs[tag] = [l for l in f if not l.startswith("#")]
    assert len(outs["native"]) > 0


def test_stream_bai_fast_seek_late_contig(tmp_path):
    """A fresh stream whose FIRST window targets a late contig must
    BAI-seek instead of inflating the file prefix, and produce the same
    views as a stream that walked from the start."""
    from clairs_to_tpu.bamio import bam_writer

    rng = np.random.default_rng(9)
    L = 30_000
    genomes = {c: "".join(rng.choice(list("ACGT"), L)) for c in
               ("chrA", "chrB", "chrC")}
    records = []
    for ci, (ctg, g) in enumerate(genomes.items()):
        for ridx in range(1200):
            s = int(rng.integers(0, L - 400))
            seq = list(g[s:s + 400])
            for _e in range(rng.binomial(400, 0.01)):
                i = int(rng.integers(0, 400))
                seq[i] = rng.choice([b for b in "ACGT" if b != seq[i]])
            records.append((ci, s, bam_writer.encode_record(
                f"r{ci}_{ridx:05d}", 0, ci, s, 60, [("M", 400)],
                "".join(seq), [30] * 400)))
    records.sort(key=lambda r: (r[0], r[1]))
    bam = str(tmp_path / "multi.bam")
    # write_bam emits the .bai the fast-seek needs
    bam_writer.write_bam(bam, list(genomes), [L] * 3, [r[2] for r in records])

    def views(first_ctg_only):
        sr = native.BamStreamReader(bam)
        if not first_ctg_only:
            # walk the stream naturally through chrA, chrB first
            for ctg in ("chrA", "chrB"):
                w = sr.load_window_reduced(
                    ctg, 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
                    aff_min_bq=20)
                w.close()
        w = sr.load_window_reduced(
            "chrC", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
            aff_min_bq=20)
        out = (w.aff_counts.copy(), w.aff_depth.copy(), w.n_reads)
        w.close()
        sr.close()
        return out

    a_seek = views(True)      # fresh stream straight to chrC (BAI seek)
    a_walk = views(False)     # sequential walk
    assert a_seek[2] == a_walk[2] > 0
    assert np.array_equal(a_seek[0], a_walk[0])
    assert np.array_equal(a_seek[1], a_walk[1])


def test_multiworker_decode_identical_output(tmp_path):
    """decode_workers=2 (thread-local streams, dynamic chunk assignment,
    BAI-seek stream reopen on regression) must produce the same rows as
    the single-worker pipeline on a multi-contig workload."""
    import subprocess
    import sys

    d = str(tmp_path / "ds")
    simulate.make_multi_contig_dataset(
        d, n_contigs=3, genome_len=40_000, seed=13, coverage=35,
        n_snv=8, n_germline=20)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    outs = {}
    for tag, workers in (("w1", "1"), ("w2", "2")):
        out = str(tmp_path / tag)
        env2 = dict(env, CLAIRS_TO_TPU_DECODE_WORKERS=workers)
        r = subprocess.run(
            [sys.executable, "-m", "clairs_to_tpu", "run",
             "-T", os.path.join(d, "tumor.bam"),
             "-R", os.path.join(d, "ref.fa"),
             "-o", out, "-p", "ont", "-t", "3",
             "--chunk_num", "2",
             "--disable_verdict", "--disable_indel_calling", "true"],
            cwd="/root/repo", env=env2, capture_output=True, text=True,
            timeout=900)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        with open(os.path.join(out, "snv.vcf")) as f:
            outs[tag] = [l for l in f if not l.startswith("##")]
    assert outs["w1"] == outs["w2"]
    assert len(outs["w1"]) > 3


def test_out_of_order_chunks_reopen_stream(tmp_path):
    """A library caller decoding chunks out of order (regressed window)
    must get correct views via the stream-reopen path (BAI fast-seek),
    with the dense-arena pool carried over."""
    from clairs_to_tpu.genome.chunks import Chunk
    from clairs_to_tpu.genome.fasta import FastaFile
    from clairs_to_tpu.infer.pipeline import CallingPipeline, PipelineOptions

    d = str(tmp_path / "ds")
    simulate.make_dataset(d, seed=77, genome_len=60_000, coverage=30,
                          read_length=500, n_snv=10, n_indel=0,
                          n_germline=40, error_rate=0.01,
                          af_choices=(0.2, 0.4))
    fa = FastaFile(os.path.join(d, "ref.fa"))
    pipe = CallingPipeline(fa, os.path.join(d, "tumor.bam"), None, None,
                           PipelineOptions(platform="ont"))
    c2 = Chunk(ctg_name="chrS", ctg_start=30_000, ctg_end=60_000,
               chunk_id=1, chunk_num=2)
    c1 = Chunk(ctg_name="chrS", ctg_start=0, ctg_end=30_000,
               chunk_id=0, chunk_num=2)
    pe2, *_ = pipe.build_chunk_views(c2)   # forward
    pe1, *_ = pipe.build_chunk_views(c1)   # REGRESSION -> reopen
    s1 = pe1.find_candidates(0, 30_000, min_bq=20)
    s2 = pe2.find_candidates(30_000, 60_000, min_bq=20)
    # reference: in-order pipeline
    pipe_ref = CallingPipeline(fa, os.path.join(d, "tumor.bam"), None, None,
                               PipelineOptions(platform="ont"))
    r1, *_ = pipe_ref.build_chunk_views(c1)
    w1 = r1.find_candidates(0, 30_000, min_bq=20)
    assert s1[0] == w1[0]
    assert len(s1[0]) + len(s2[0]) > 5


def test_phased_views_fused_vs_table(tmp_path):
    """with_phasing=True channel counts: fused reduce vs entry-table path
    on a BAM carrying HP tags (incl. indel-suffixed entries, which the
    phase channels must exclude)."""
    rng = np.random.default_rng(88)
    L = 5000
    genome = "".join(rng.choice(list("ACGT"), L))
    records = []
    for ridx in range(700):
        s = int(rng.integers(0, L - 200))
        rev = bool(rng.random() < 0.5)
        hp = int(rng.choice([0, 1, 2]))
        tags = b"" if hp == 0 else b"HPc" + bytes([hp])
        if rng.random() < 0.3:
            ipos = int(rng.integers(30, 120))
            cigar = [("M", ipos), ("I", 2), ("M", 150 - ipos)]
            seq = genome[s:s + ipos] + "AC" + genome[s + ipos:s + 150]
        else:
            cigar = [("M", 150)]
            seq = genome[s:s + 150]
        qual = list(rng.integers(8, 40, len(seq)))
        records.append((s, bam_writer.encode_record(
            f"h{ridx:05d}", 16 if rev else 0, 0, s, 60, cigar, seq, qual,
            tags=tags)))
    records.sort(key=lambda r: r[0])
    bam = str(tmp_path / "ph.bam")
    bam_writer.write_bam(bam, ["chrP"], [L], [r[1] for r in records])

    table = native.load_entry_table(
        bam, "chrP", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe_o = PileupEngine.from_entry_table(table, genome, 0, platform="ont")
    sr = native.BamStreamReader(bam)
    win = sr.load_window_reduced(
        "chrP", 0, L, excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG,
        aff_min_bq=20, low_mq_thresh=20, low_bq_thresh=30,
        max_indel_length=60, with_phasing=True)
    pe_n = PileupEngine.from_native_window(win, genome, 0, platform="ont")
    for mb in (20, 0):
        c_o, d_o = pe_o.channel_counts(mb, 0, L, with_phasing=True)
        c_n, d_n = pe_n.channel_counts(mb, 0, L, with_phasing=True)
        assert c_o.shape[1] == 50
        assert np.array_equal(c_o, c_n) and np.array_equal(d_o, d_n)
    assert c_o[:, 34:].sum() > 0  # phase channels actually populated
