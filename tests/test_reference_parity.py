"""End-to-end numerical parity against the reference implementation.

Drives the SAME pileup tensors through (a) the reference's torch models +
float posterior + VcfWriter (imported from the read-only reference tree as a
golden oracle) and (b) this framework's engine + calling, and requires the
VCF body rows to match byte-for-byte.  Random weights are shared via the
checkpoint converter, so this exercises: tensor TSV contract, depth rescale,
dual forward, softmax, %.8f probability round-trip, digitize + Bayesian
posterior, QUAL, alt ranking and VCF formatting.

Skipped when /root/reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from clairs import model as ref_model  # noqa: E402
    from clairs import call_variants as ref_cv  # noqa: E402
except Exception:  # pragma: no cover
    ref_model = None

import jax  # noqa: E402

from clairs_to_tpu import config as cfg  # noqa: E402
from clairs_to_tpu.bamio import simulate  # noqa: E402
from clairs_to_tpu.bamio.bam import BamFile  # noqa: E402
from clairs_to_tpu.bamio.pileup import PileupEngine  # noqa: E402
from clairs_to_tpu.infer.calling import CandidateRecord, call_from_posterior  # noqa: E402
from clairs_to_tpu.infer.engine import InferenceEngine  # noqa: E402
from clairs_to_tpu.models import convert  # noqa: E402
from clairs_to_tpu.ops import posterior as post  # noqa: E402
from clairs_to_tpu.train import calibrate_likelihood, save_likelihood_matrix  # noqa: E402
from clairs_to_tpu.vcf.writer import VcfWriter  # noqa: E402

pytestmark = pytest.mark.skipif(ref_model is None, reason="reference unavailable")

FLANK = cfg.FLANKING_BASE_NUM


def _np_state_dict(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("parity")
    ds = simulate.make_dataset(
        str(out), seed=21, genome_len=25_000, coverage=50, n_snv=10, n_germline=5
    )
    # shared random weights
    torch.manual_seed(3)
    t_aff = ref_model.CvT(num_classes=2, model_type="acgt").eval()
    t_neg = ref_model.BiGRU_NACGT(num_classes=2, model_type="nacgt").eval()
    aff_params = convert.cvt_params_from_state_dict(_np_state_dict(t_aff))
    neg_params = convert.bigru_params_from_state_dict(_np_state_dict(t_neg))

    # tensors + alt_info from our pileup (both sides consume these)
    eng = PileupEngine(ds["genome"], 0, platform="ont")
    for read in BamFile(ds["bam"]).fetch(ds["ctg"], 0, 25_000, excl_flags=2316):
        eng.add_read(read)
    snvs, _, _ = eng.find_candidates(0, 25_000)
    snvs = [p for p in snvs if FLANK <= p < 25_000 - FLANK - 1]
    counts, depth = eng.channel_counts(20, 0, 25_000)
    eng.apply_reference_encoding(counts, 0)
    alt = eng.alt_info_at(snvs, min_bq=20)
    x = np.stack([counts[p - FLANK : p + FLANK + 1] for p in snvs]).astype(np.float32)
    cov = np.array([alt[p][1] for p in snvs], np.float64)

    # synthetic likelihood matrix in the reference file format
    rng = np.random.default_rng(4)
    p_rand = rng.uniform(0.01, 0.99, size=(600, 4))
    q_rand = rng.uniform(0.01, 0.99, size=(600, 4))
    som = rng.integers(-1, 4, size=600)
    lik = calibrate_likelihood(p_rand, q_rand, som)
    lik_path = str(out / "likelihood_matrix.txt")
    save_likelihood_matrix(lik_path, lik)

    return dict(ds=ds, snvs=snvs, x=x, cov=cov, alt=alt, eng=eng,
                t_aff=t_aff, t_neg=t_neg, aff_params=aff_params,
                neg_params=neg_params, lik_path=lik_path, out=out)


def _reference_vcf(setup, path):
    """Reference path: torch forward + %.8f round trip + call_variants."""
    ds, snvs, x, cov = setup["ds"], setup["snvs"], setup["x"], setup["cov"]
    # depth rescale (predict.py:177-197)
    scale = np.where(cov > 50, 50.0 / cov, 1.0).astype(np.float32)
    xr = x * scale[:, None, None]
    with torch.no_grad():
        pa = [t.numpy() for t in setup["t_aff"](torch.from_numpy(xr))]
        pn = [t.numpy() for t in setup["t_neg"](torch.from_numpy(xr))]
    softmax = torch.nn.Softmax(dim=1)
    pa = [softmax(torch.from_numpy(t)).numpy() for t in pa]
    pn = [softmax(torch.from_numpy(t)).numpy() for t in pn]

    # strand counts from the raw center row (predict.py:626-642)
    fwd = x[:, FLANK, 0:4].copy()
    rev = x[:, FLANK, 9:13].copy()
    for block in (fwd, rev):
        neg_rows = np.where(block < 0)
        rs = np.sum(block[neg_rows[0]], axis=1)
        block[neg_rows] = rs * -1
    fwd = np.where(fwd == -0, 0, fwd)
    rev = np.where(rev == -0, 0, rev)

    lik_data = np.loadtxt(setup["lik_path"])
    # build likelihood_data_info_list exactly as call_variants.py:660-714
    L = []
    for k in range(4):
        L.append(lik_data[10 * k : 10 * (k + 1)])
    pts = []
    for k in range(4):
        a_pts = lik_data[40 + 2 * k : 41 + 2 * k].flatten()[:-1]
        n_pts = lik_data[41 + 2 * k : 42 + 2 * k].flatten()[:-1]
        a_e = np.insert(np.insert(a_pts, 0, 0), len(a_pts) + 1, 1)
        n_e = np.insert(np.insert(n_pts, 0, 0), len(n_pts) + 1, 1)
        pts.extend([a_e, n_e])
    lik_list = L + pts

    from collections import namedtuple

    OutputConfig = ref_cv.OutputConfig
    config = OutputConfig(
        is_show_reference=False, quality_score_for_pass=0, pileup=True,
        disable_indel_calling=True,
    )
    writer = VcfWriter(path, ctg_name=ds["ctg"])
    for i, p in enumerate(snvs):
        # %.8f round trip (predict.py print_output_message)
        def rt(v):
            return [float(f"{t:0.8f}") for t in v]

        ref_cv.output_vcf_from_probability(
            ds["ctg"], p + 1, setup["eng"]._ref_base(p), setup["alt"][p][0],
            str([float(v) for v in fwd[i]]),
            str([float(v) for v in rev[i]]),
            rt(pa[0][i]), rt(pa[1][i]), rt(pa[2][i]), rt(pa[3][i]),
            None, None,
            rt(pn[0][i]), rt(pn[1][i]), rt(pn[2][i]), rt(pn[3][i]),
            None, None,
            lik_list, output_config=config, vcf_writer=writer,
            disable_indel_calling=True,
        )
    writer.close()
    return path


def _our_vcf(setup, path):
    ds, snvs, x, cov = setup["ds"], setup["snvs"], setup["x"], setup["cov"]
    lik = post.load_likelihood_matrix(setup["lik_path"], n_alleles=4)
    engine = InferenceEngine(
        setup["aff_params"], setup["neg_params"], lik, mode="snv",
        device_batch=256,
    )
    res = engine.run_batch(x, x, cov.astype(np.float32), cov.astype(np.float32))
    writer = VcfWriter(path, ctg_name=ds["ctg"])
    for i, p in enumerate(snvs):
        row = call_from_posterior(
            CandidateRecord(ds["ctg"], p + 1, setup["eng"]._ref_base(p),
                            setup["alt"][p][0]),
            res.posterior[i], res.forward_acgt[i], res.reverse_acgt[i],
            mode="snv", show_ref=False, qual_cutoff=0,
        )
        if row is not None:
            writer.write_row(**row)
    writer.close()
    return path


def test_indel_mode_matches_reference(tmp_path):
    """6-allele indel posterior + REF/ALT construction vs the reference."""
    out = tmp_path
    ds = simulate.make_dataset(
        str(out / "sim"), seed=31, genome_len=20_000, coverage=50,
        n_snv=4, n_indel=10, n_germline=3,
    )
    torch.manual_seed(5)
    t_aff = ref_model.CvT_Indel(
        num_classes=2, s1_emb_dim=16, s3_heads=4, s3_depth=3, model_type="acgt"
    ).eval()
    t_neg = ref_model.BiGRU_NACGT_Indel(num_classes=2, model_type="nacgt").eval()
    from clairs_to_tpu.models import cvt as cvt_mod, bigru as bigru_mod

    aff_params = convert.cvt_params_from_state_dict(
        _np_state_dict(t_aff), cvt_mod.INDEL_CVT_CONFIG
    )
    neg_params = convert.bigru_params_from_state_dict(
        _np_state_dict(t_neg), bigru_mod.INDEL_BIGRU_CONFIG
    )

    eng = PileupEngine(ds["genome"], 0, platform="ont")
    for read in BamFile(ds["bam"]).fetch(ds["ctg"], 0, 20_000, excl_flags=2316):
        eng.add_read(read)
    _, indels, _ = eng.find_candidates(0, 20_000, select_indel_candidates=True)
    indels = [p for p in indels if FLANK <= p < 20_000 - FLANK - 1]
    assert indels, "no indel candidates — fixture broken"
    counts, _ = eng.channel_counts(20, 0, 20_000)
    eng.apply_reference_encoding(counts, 0)
    alt = eng.alt_info_at(indels, min_bq=20)
    x = np.stack([counts[p - FLANK : p + FLANK + 1] for p in indels]).astype(np.float32)
    cov = np.array([alt[p][1] for p in indels], np.float64)

    rng = np.random.default_rng(8)
    lik6 = calibrate_likelihood(
        rng.uniform(0.01, 0.99, (600, 6)), rng.uniform(0.01, 0.99, (600, 6)),
        rng.integers(-1, 6, 600), n_alleles=6,
    )
    lik_path = str(out / "lik6.txt")
    save_likelihood_matrix(lik_path, lik6)

    # --- reference side --------------------------------------------------
    scale = np.where(cov > 50, 50.0 / cov, 1.0).astype(np.float32)
    xr = x * scale[:, None, None]
    softmax = torch.nn.Softmax(dim=1)
    with torch.no_grad():
        pa = [softmax(t).numpy() for t in t_aff(torch.from_numpy(xr))]
        pn = [softmax(t).numpy() for t in t_neg(torch.from_numpy(xr))]
    fwd = x[:, FLANK, 0:4].copy()
    rev = x[:, FLANK, 9:13].copy()
    for block in (fwd, rev):
        neg_rows = np.where(block < 0)
        rs = np.sum(block[neg_rows[0]], axis=1)
        block[neg_rows] = rs * -1

    lik_data = np.loadtxt(lik_path)
    L = [lik_data[10 * k : 10 * (k + 1)] for k in range(6)]
    pts = []
    for k in range(6):
        a_pts = lik_data[60 + 2 * k : 61 + 2 * k].flatten()[:-1]
        n_pts = lik_data[61 + 2 * k : 62 + 2 * k].flatten()[:-1]
        pts.append(np.insert(np.insert(a_pts, 0, 0), len(a_pts) + 1, 1))
        pts.append(np.insert(np.insert(n_pts, 0, 0), len(n_pts) + 1, 1))
    lik_list = L + pts

    config = ref_cv.OutputConfig(
        is_show_reference=False, quality_score_for_pass=0, pileup=True,
        disable_indel_calling=False,
    )
    ref_path = str(out / "ref_indel.vcf")
    writer = VcfWriter(ref_path, ctg_name=ds["ctg"])

    def rt(v):
        return [float(f"{t:0.8f}") for t in v]

    for i, p in enumerate(indels):
        ref_cv.output_vcf_from_probability(
            ds["ctg"], p + 1, eng._ref_base(p), alt[p][0],
            str([float(v) for v in fwd[i]]), str([float(v) for v in rev[i]]),
            rt(pa[0][i]), rt(pa[1][i]), rt(pa[2][i]), rt(pa[3][i]),
            rt(pa[4][i]), rt(pa[5][i]),
            rt(pn[0][i]), rt(pn[1][i]), rt(pn[2][i]), rt(pn[3][i]),
            rt(pn[4][i]), rt(pn[5][i]),
            lik_list, output_config=config, vcf_writer=writer,
            disable_indel_calling=False,
        )
    writer.close()

    # --- our side --------------------------------------------------------
    lik_ours = post.load_likelihood_matrix(lik_path, n_alleles=6)
    engine = InferenceEngine(aff_params, neg_params, lik_ours, mode="indel",
                             device_batch=128)
    res = engine.run_batch(x, x, cov.astype(np.float32), cov.astype(np.float32))
    our_path = str(out / "our_indel.vcf")
    writer = VcfWriter(our_path, ctg_name=ds["ctg"])
    for i, p in enumerate(indels):
        row = call_from_posterior(
            CandidateRecord(ds["ctg"], p + 1, eng._ref_base(p), alt[p][0]),
            res.posterior[i], res.forward_acgt[i], res.reverse_acgt[i],
            mode="indel", show_ref=False, qual_cutoff=0,
        )
        if row is not None:
            writer.write_row(**row)
    writer.close()

    ref_rows = [l.rstrip("\n") for l in open(ref_path) if not l.startswith("#")]
    our_rows = [l.rstrip("\n") for l in open(our_path) if not l.startswith("#")]
    assert len(ref_rows) == len(our_rows)
    for r, o in zip(ref_rows, our_rows):
        rc, oc = r.split("\t"), o.split("\t")
        assert rc[:5] == oc[:5], f"\nref: {r}\nour: {o}"
        assert rc[6:9] == oc[6:9], f"\nref: {r}\nour: {o}"
        assert abs(float(rc[5]) - float(oc[5])) < 1.0
        assert rc[9].split(":")[0] == oc[9].split(":")[0]
        assert rc[9].split(":")[2:] == oc[9].split(":")[2:]


def test_vcf_rows_match_reference(setup, tmp_path):
    """All discrete fields byte-identical; QUAL/GQ within framework noise.

    torch-CPU and XLA produce logits differing at ~2e-4 (matmul orderings),
    so the phred QUAL's last decimals cannot be bit-equal across frameworks;
    everything decision-valued (positions, alleles, FILTER, genotype, depth,
    AF, AD, strand counts) must match exactly."""
    ref_path = _reference_vcf(setup, str(tmp_path / "ref.vcf"))
    our_path = _our_vcf(setup, str(tmp_path / "ours.vcf"))
    ref_rows = [l.rstrip("\n") for l in open(ref_path) if not l.startswith("#")]
    our_rows = [l.rstrip("\n") for l in open(our_path) if not l.startswith("#")]
    assert len(ref_rows) > 0, "reference produced no rows — test setup broken"
    assert len(ref_rows) == len(our_rows), (len(ref_rows), len(our_rows))
    for r, o in zip(ref_rows, our_rows):
        rc = r.split("\t")
        oc = o.split("\t")
        # CHROM POS ID REF ALT [QUAL] FILTER INFO FORMAT
        assert rc[:5] == oc[:5], f"\nref: {r}\nour: {o}"
        assert rc[6:9] == oc[6:9], f"\nref: {r}\nour: {o}"
        assert abs(float(rc[5]) - float(oc[5])) < 1.0, f"QUAL\nref: {r}\nour: {o}"
        rs = rc[9].split(":")
        os_ = oc[9].split(":")
        assert rs[0] == os_[0]                      # GT
        assert abs(int(rs[1]) - int(os_[1])) <= 1   # GQ (int phred)
        assert rs[2:] == os_[2:], f"\nref: {r}\nour: {o}"  # DP:AF:AD:AU..TU
