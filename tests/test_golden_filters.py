"""Golden verdict parity for the hard-filter stages vs /root/reference.

Drives the reference's actual filter code (imported from the read-only
reference tree) and this framework's engines on the SAME simulated
alignments: the reference side consumes synthesized mpileup text
(tests/golden_utils.py — an independent CIGAR walk), the framework side
consumes its entry table.  Every verdict flag must match per site.

Covers haplotype_filtering (9 verdicts, src/haplotype_filtering.py:344-706)
on a haplotype-aware ONT-like simulation, and postfilter_variants
(src/postfilter_variants.py:278-365) on an Illumina-like one.

Production parameters are pinned to the reference driver's:
min_mq=20, min_bq=0 (param.min_mq/min_bq), max_co_exist=2
(haplotype_filtering.py:1252 --min_alt_coverage default; the driver passes
nothing else).
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from src import haplotype_filtering as ref_hf  # noqa: E402
    from src import postfilter_variants as ref_pf  # noqa: E402
except Exception:  # pragma: no cover
    ref_hf = None

from clairs_to_tpu.bamio import bam_writer, simulate  # noqa: E402
from clairs_to_tpu.bamio.bam import BamFile  # noqa: E402
from clairs_to_tpu.bamio.pileup import PileupEngine  # noqa: E402
from clairs_to_tpu.phasing.phaser import phase_and_tag  # noqa: E402
from clairs_to_tpu.postcall.haplotype import HaplotypeFilterEngine  # noqa: E402
from clairs_to_tpu.postcall.hardfilter import HardFilterEngine  # noqa: E402

from golden_utils import emit_mpileup, parse_bool_line  # noqa: E402

pytestmark = pytest.mark.skipif(ref_hf is None, reason="reference unavailable")

CTG = "chrG"
FLANK = 100           # haplotype_filtering.py:29
MIN_MQ, MIN_BQ = 20, 0
MAX_CO_EXIST = 2      # --min_alt_coverage default

HAP_FIELDS = (
    "pass_hap", "phaseable", "pass_hetero", "pass_homo",
    "pass_read_start_end", "pass_bq", "pass_mq", "pass_co_exist",
    "pass_hetero_both_side", "pass_strand_bias", "p_value",
    "pass_sequence_entropy",
)
PF_FIELDS = (
    "pass_hard_filter", "pass_read_start_end", "pass_co_exist",
    "pass_strand_bias", "p_value", "pass_sequence_entropy",
)


def _is_documented_tie_divergence(got, want_p):
    """The one deliberate fisher_exact divergence (hardfilter.py docstring):
    on tables holding exactly-tied tables in the opposite tail, the
    reference's float recurrence includes or excludes the tie depending on
    round-off direction, while this repo always includes it (scipy
    semantics).

    The waiver verifies the divergence IS that case, from first principles
    (independent of both implementations): our p must equal the
    tie-included two-sided sum AND the reference's p must equal the
    tie-EXCLUDED sum.  Any other p divergence (e.g. a table-construction
    regression) still fails the golden comparison."""
    import math as _math

    if got.strand_table is None:
        return False
    (a, bq), (c, dq) = got.strand_table
    m, nn, k = a + bq, c + dq, a + c

    def _lpmf(x):
        return (_math.lgamma(m + 1) - _math.lgamma(x + 1)
                - _math.lgamma(m - x + 1)
                + _math.lgamma(nn + 1) - _math.lgamma(k - x + 1)
                - _math.lgamma(nn - (k - x) + 1)
                - (_math.lgamma(m + nn + 1) - _math.lgamma(k + 1)
                   - _math.lgamma(m + nn - k + 1)))

    lp_obs = _lpmf(a)
    support = range(max(0, k - nn), min(k, m) + 1)
    p_incl = tie_sum = 0.0
    for x in support:
        lp = _lpmf(x)
        if lp <= lp_obs + 1e-7:
            p_incl += _math.exp(lp)
        if x != a and abs(lp - lp_obs) <= 1e-9:
            tie_sum += _math.exp(lp)
    p_incl = min(p_incl, 1.0)
    if tie_sum == 0.0:
        return False                       # no tied tables -> no waiver
    p_excl = min(p_incl - tie_sum, 1.0)
    ours_is_included = abs(got.strand_bias_p - p_incl) <= 1e-9
    ref_is_excluded = abs(float(want_p) - round(p_excl, 5)) <= 1e-5
    return ours_is_included and ref_is_excluded


def _simulate(seed, *, hom_count, n_som_snv, n_som_indel, coverage,
              read_length, error_rate, hap_aware):
    """Genome + variant plan + reads; hom germline = SNVs baked into the
    read-source genome but absent from the reference genome."""
    rng = np.random.default_rng(seed)
    genome = simulate.random_genome(rng, 14_000)
    som = simulate.plan_variants(
        rng, genome, n_snv=n_som_snv, n_indel=n_som_indel, n_germline=14,
        af_choices=(0.05, 0.08, 0.12, 0.25, 0.4),
    )
    taken = sorted({v.pos for v in som})
    # hom germline: mutate a copy of the genome that reads are drawn from
    hom = []
    g2 = list(genome)
    tries = 0
    while len(hom) < hom_count and tries < 5000:
        tries += 1
        p = int(rng.integers(300, len(genome) - 300))
        if any(abs(p - t) < 60 for t in taken):
            continue
        ref = genome[p]
        alt = str(rng.choice([b for b in "ACGT" if b != ref]))
        g2[p] = alt
        hom.append(simulate.Variant(p, ref, alt, 1.0, "snv", germline=True))
        taken.append(p)
    genome_reads = "".join(g2)
    reads = simulate.simulate_reads(
        rng, genome_reads, som, coverage=coverage, read_length=read_length,
        error_rate=error_rate, somatic_hap_aware=hap_aware,
    )
    return genome, som, hom, reads


def _load(tmp_path, name, genome, reads):
    path = str(tmp_path / name)
    recs = [
        bam_writer.encode_record(n, f, 0, p, 60, c, s, q)
        for (n, f, p, c, s, q) in reads
    ]
    bam_writer.write_bam(path, [CTG], [len(genome)], recs)
    decoded = list(BamFile(path))
    eng = PileupEngine(genome, 0, platform="ont")
    for rd in decoded:
        eng.add_read(rd)
    return decoded, eng


def _sites(som, hom, genome):
    """(pos1, ref, alt, af) per candidate; VCF-style ref/alt."""
    out = []
    for v in som:
        out.append((v.pos + 1, v.ref, v.alt, v.af))
    for v in hom:
        out.append((v.pos + 1, v.ref, v.alt, 1.0))
    return [s for s in out if FLANK + 2 <= s[0] <= len(genome) - FLANK - 2]


def _germline_strings(pos1, het1, hom1):
    """Reference HAP_INFO strings: flanking germline as 'pos-alt,...'."""
    het = ",".join(
        f"{p}-{a}" for p, a in het1 if p != pos1 and abs(p - pos1) < FLANK
    )
    hom = ",".join(
        f"{p}-{a}" for p, a in hom1 if p != pos1 and abs(p - pos1) < FLANK
    )
    return het, hom


def test_haplotype_filter_golden(tmp_path):
    genome, som, hom, reads = _simulate(
        11, hom_count=6, n_som_snv=12, n_som_indel=6, coverage=42,
        read_length=900, error_rate=0.004, hap_aware=True,
    )
    decoded, pe = _load(tmp_path, "hap.bam", genome, reads)

    het_gl = [(v.pos, v.ref, v.alt) for v in som if v.germline]
    hp = phase_and_tag(pe, het_gl)

    het1 = [(v.pos + 1, v.alt) for v in som if v.germline]
    hom1 = [(v.pos + 1, v.alt) for v in hom]
    sites = _sites([v for v in som if not v.germline], hom, genome)
    # germline het sites as candidates too (phaseable-rich cases)
    sites += [(v.pos + 1, v.ref, v.alt, 0.5) for v in som if v.germline][:6]
    assert len(sites) >= 20

    mismatches = []
    compared = 0
    for pos1, ref_b, alt_b, af in sites:
        lo = max(pos1 - FLANK, 1)
        hi = pos1 + FLANK + 1
        rows = emit_mpileup(decoded, genome, CTG, lo, hi,
                            min_mq=MIN_MQ, min_bq=MIN_BQ, hp=hp)
        chunk_rows = ref_hf._parse_mpileup_to_chunk_dict(iter(rows))
        chunk_ref = genome[lo - 1 : hi]
        het_str, hom_str = _germline_strings(pos1, het1, hom1)
        line = ref_hf._haplotype_build_state_and_line(
            CTG, pos1, ref_b, alt_b, FLANK, chunk_rows, chunk_ref, lo,
            het_str, hom_str, False, MAX_CO_EXIST, af, 20.0,
        )
        want = parse_bool_line(line, HAP_FIELDS)

        eng = HaplotypeFilterEngine(
            pe, min_bq=MIN_BQ, min_mq=MIN_MQ,
            max_co_exist_read_num=MAX_CO_EXIST,
            hetero_germline=[(p - 1, a) for p, a in het1],
            homo_germline=[(p - 1, a) for p, a in hom1 if p != pos1],
        )
        got = eng.verdict(pos1 - 1, ref_b, alt_b, af=af)

        pairs = [
            ("pass_hetero", got.pass_hetero),
            ("pass_homo", got.pass_homo),
            ("pass_read_start_end", got.pass_read_start_end),
            ("pass_bq", got.pass_bq),
            ("pass_mq", got.pass_mq),
            ("pass_co_exist", got.pass_co_exist),
            ("pass_hetero_both_side", got.pass_hetero_both_side),
            ("pass_strand_bias", got.pass_strand_bias),
            ("pass_sequence_entropy", got.pass_sequence_entropy),
            ("phaseable", got.phaseable),
            ("pass_hap", got.pass_all),
        ]
        for name, mine in pairs:
            if want[name] != mine:
                mismatches.append((pos1, ref_b, alt_b, name, want[name], mine))
        if abs(float(want["p_value"]) - round(got.strand_bias_p, 5)) > 1e-5:
            if not _is_documented_tie_divergence(got, want["p_value"]):
                mismatches.append(
                    (pos1, ref_b, alt_b, "p_value", want["p_value"],
                     round(got.strand_bias_p, 5)))
        compared += 1

    assert compared >= 20
    assert not mismatches, mismatches[:12]


def test_postfilter_golden(tmp_path):
    genome, som, hom, reads = _simulate(
        23, hom_count=0, n_som_snv=14, n_som_indel=6, coverage=50,
        read_length=150, error_rate=0.002, hap_aware=False,
    )
    decoded, pe = _load(tmp_path, "pf.bam", genome, reads)

    sites = _sites([v for v in som if not v.germline], [], genome)
    sites += [(v.pos + 1, v.ref, v.alt, 0.5) for v in som if v.germline][:6]
    assert len(sites) >= 20

    mismatches = []
    eng = HardFilterEngine(
        pe, min_bq=MIN_BQ, min_mq=MIN_MQ, max_co_exist_read_num=MAX_CO_EXIST,
    )
    for pos1, ref_b, alt_b, _af in sites:
        lo = max(pos1 - FLANK, 1)
        hi = pos1 + FLANK + 1
        rows = emit_mpileup(decoded, genome, CTG, lo, hi,
                            min_mq=MIN_MQ, min_bq=MIN_BQ, with_hp=False)
        chunk_rows = ref_pf._parse_mpileup_postfilter_chunk_dict(iter(rows))
        chunk_ref = genome[lo - 1 : hi]
        line = ref_pf._postfilter_build_state_and_line(
            CTG, pos1, ref_b, alt_b, FLANK, chunk_rows, chunk_ref, lo,
            False, MAX_CO_EXIST,
        )
        want = parse_bool_line(line, PF_FIELDS)
        got = eng.verdict(pos1 - 1, ref_b, alt_b)

        pairs = [
            ("pass_read_start_end", got.pass_read_start_end),
            ("pass_co_exist", got.pass_co_exist),
            ("pass_strand_bias", got.pass_strand_bias),
            ("pass_sequence_entropy", got.pass_sequence_entropy),
            ("pass_hard_filter", got.pass_all),
        ]
        for name, mine in pairs:
            if want[name] != mine:
                mismatches.append((pos1, ref_b, alt_b, name, want[name], mine))
        if abs(float(want["p_value"]) - round(got.strand_bias_p, 5)) > 1e-5:
            if not _is_documented_tie_divergence(got, want["p_value"]):
                mismatches.append(
                    (pos1, ref_b, alt_b, "p_value", want["p_value"],
                     round(got.strand_bias_p, 5)))

    assert not mismatches, mismatches[:12]
