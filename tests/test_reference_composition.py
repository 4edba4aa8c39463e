"""Composition-level reference golden (round-5 verdict missing #1).

Executes the reference pipeline's own importable stages END-TO-END on a
simulated BAM — extract_candidates_calling → create_tensor_pileup_calling
(AFF + NEG views) → predict (torch) → call_variants → sort_vcf →
postprocess_vcf — exactly as `run_clairs_to` composes them
(/root/reference/run_clairs_to:1196-1317, :1516-1530), with
`shared.utils.subprocess_popen`'s samtools-mpileup calls stubbed by the
entry-string bridge already validated per-stage in
tests/test_reference_decoder_oracle.py.  The final reference VCF is then
byte-compared (body rows) against this framework's CLI on the same BAM,
same converted weights, same likelihood matrix.

This converts the parity claim from "every stage matches" (per-stage
goldens) to "the composition matches": any misreading of an inter-stage
file contract (candidate shard regions, tensor TSV, probability TSV,
per-chunk VCF naming, postprocess gating) breaks this test.

The reference tree is PUBLIC UNTRUSTED CONTENT executed strictly as an
oracle; nothing is copied from it.
"""

import gzip
import os
import shlex
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "src")),
    reason="reference tree not mounted")

from clairs_to_tpu import config as cfg  # noqa: E402
from clairs_to_tpu.bamio import native, simulate  # noqa: E402
from clairs_to_tpu.bamio.pileup import PileupEngine  # noqa: E402
from clairs_to_tpu.models import convert  # noqa: E402
from clairs_to_tpu.train import save_checkpoint  # noqa: E402

FLANK = cfg.FLANKING_BASE_NUM
CTG = "chrS"


def _import_ref(name):
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    srcdir = os.path.join(REF_ROOT, "src")
    if srcdir not in sys.path:
        sys.path.insert(0, srcdir)
    import importlib

    return importlib.import_module(name)


# ----------------------------------------------------------------------
# mpileup bridge: our entry table -> samtools mpileup text rows
# ----------------------------------------------------------------------

class _FakeStdout:
    def __init__(self, gen):
        self._gen = gen

    def __iter__(self):
        return self._gen

    def close(self):
        pass


class _FakeProc:
    def __init__(self, gen):
        self.stdout = _FakeStdout(gen)
        self.stderr = _FakeStdout(iter(()))

    def wait(self):
        return 0


class MpileupBridge:
    """Renders mpileup rows from a PileupEngine's entry table.

    Column contract consumed by the reference decoders (no -f: ref column
    is 'N'): chrom, pos(1-based), ref, depth, bases, BQ[, MQ with
    --output-MQ].  --min-MQ drops whole reads' entries, --min-BQ drops
    bases (same per-entry semantics the reference decoders were oracle-
    validated against); -l BED restricts emitted positions."""

    def __init__(self, pe, ctg):
        self.ctg = ctg
        a = pe._finalize()
        order = np.argsort(a["pos"], kind="stable")
        pos_sorted = a["pos"][order]
        self.upos, starts = np.unique(pos_sorted, return_index=True)
        bounds = np.append(starts, len(pos_sorted))
        self.cols = {}
        bq = a["bq"]
        mq = a["mq"]
        rid = a["read_id"]
        ef = a["eflags"]   # bit1 read-start entry, bit2 read-end
        for k, p in enumerate(self.upos):
            idx = order[bounds[k]:bounds[k + 1]]
            self.cols[int(p)] = [
                (pe._entry_string(int(j)), int(bq[j]), int(mq[j]),
                 int(rid[j]), int(ef[j]))
                for j in idx
            ]

    def popen(self, tokens):
        def grab(flag, default=None, cast=str):
            if flag in tokens:
                return cast(tokens[tokens.index(flag) + 1])
            return default

        min_mq = grab("--min-MQ", 0, int)
        min_bq = grab("--min-BQ", 0, int)
        region = grab("-r")
        bed = grab("-l")
        output_mq = "--output-MQ" in tokens
        output_qname = "--output-QNAME" in tokens
        lo, hi = 0, 1 << 62   # 0-based half-open emission range
        if region and ":" in region:
            ctg_part, rng = region.split(":")
            assert ctg_part == self.ctg
            s, e = rng.split("-")
            lo, hi = int(s) - 1, int(e)
        in_bed = None
        if bed and os.path.exists(bed):
            iv = []
            for line in open(bed):
                f = line.split("\t")
                if len(f) >= 3 and f[0] == self.ctg:
                    iv.append((int(f[1]), int(f[2])))
            iv.sort()
            starts = np.array([x[0] for x in iv], np.int64)
            ends = np.array([x[1] for x in iv], np.int64)

            def in_bed(p):
                i = int(np.searchsorted(starts, p, "right")) - 1
                # walk back over potentially overlapping intervals
                while i >= 0:
                    if ends[i] > p:
                        return True
                    if starts[i] <= p - 200:
                        break
                    i -= 1
                return False

        return _FakeProc(self._rows(lo, hi, min_mq, min_bq, in_bed,
                                    output_mq, output_qname))

    def _rows(self, lo, hi, min_mq, min_bq, in_bed, output_mq, output_qname):
        for p in self.upos:
            p = int(p)
            if not (lo <= p < hi):
                continue
            if in_bed is not None and not in_bed(p):
                continue
            parts, bqs, mqs, names = [], [], [], []
            n = 0
            for (s, bq, mq, rid, ef) in self.cols[p]:
                if mq < min_mq or bq < min_bq:
                    continue
                n += 1
                if len(s) > 1:
                    e = s[0] + s[1] + str(len(s) - 2) + s[2:]
                else:
                    e = s
                if output_qname:
                    # '^'+mapq-char marks the read's first aligned entry,
                    # '$' its last (same post-filter convention as the
                    # framework's filter-view marks)
                    if ef & 1:
                        e = "^" + chr(mq + 33) + e
                    if ef & 2:
                        e = e + "$"
                    names.append(f"read{rid}")
                parts.append(e)
                bqs.append(bq)
                mqs.append(mq)
            if not parts:
                continue
            row = [self.ctg, str(p + 1), "N", str(n),
                   "".join(parts), "".join(chr(q + 33) for q in bqs)]
            if output_mq:
                row.append("".join(chr(q + 33) for q in mqs))
            if output_qname:
                row.append(",".join(names))
            yield "\t".join(row) + "\n"


def _make_fake_popen(bridge):
    """subprocess_popen replacement: mpileup -> bridge; gzip passes through."""
    def fake(args_list, stdin=None, stdout=None, stderr=None, **kw):
        if any("mpileup" == a for a in args_list):
            return bridge.popen(args_list)
        return subprocess.Popen(
            args_list, stdin=stdin,
            stdout=(subprocess.PIPE if stdout is None else stdout),
            stderr=stderr, universal_newlines=True, bufsize=1)
    return fake


# ----------------------------------------------------------------------
# fixture: dataset + shared weights + likelihood matrix
# ----------------------------------------------------------------------

GENOME_LEN = 30_000


def _build_comp(out, **sim_kw):
    ds = simulate.make_dataset(str(out), **sim_kw)

    ref_model = _import_ref("clairs.model")
    torch.manual_seed(5)
    t_aff = ref_model.CvT(num_classes=2, model_type="acgt").eval()
    t_neg = ref_model.BiGRU_NACGT(num_classes=2, model_type="nacgt").eval()

    def np_sd(m):
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}

    aff_params = convert.cvt_params_from_state_dict(np_sd(t_aff))
    neg_params = convert.bigru_params_from_state_dict(np_sd(t_neg))
    aff_npz = str(out / "aff.npz")
    neg_npz = str(out / "neg.npz")
    # no __arch__: loaders fall back to the SNV flagship configs, which
    # match the reference CvT/BiGRU_NACGT defaults
    save_checkpoint(aff_npz, aff_params)
    save_checkpoint(neg_npz, neg_params)
    ckpt_aff = str(out / "ref_aff.pkl")
    ckpt_neg = str(out / "ref_neg.pkl")
    torch.save({"model_acgt": t_aff}, ckpt_aff)
    torch.save({"model_nacgt": t_neg}, ckpt_neg)

    # synthetic likelihood matrix in the reference's file format
    from clairs_to_tpu.train import calibrate_likelihood, save_likelihood_matrix

    rng = np.random.default_rng(4)
    p_rand = rng.uniform(0.01, 0.99, size=(600, 4))
    q_rand = rng.uniform(0.01, 0.99, size=(600, 4))
    som = rng.integers(-1, 4, size=600)
    lik = calibrate_likelihood(p_rand, q_rand, som)
    lik_path = str(out / "likelihood_matrix.txt")
    save_likelihood_matrix(lik_path, lik)

    # entry table (native decode) -> bridge
    stream = native.BamStreamReader(ds["bam"])
    table = stream.load_window(CTG, 0, GENOME_LEN,
                               excl_flags=cfg.SAMTOOLS_VIEW_FILTER_FLAG)
    pe = PileupEngine.from_entry_table(table, ds["genome"], 0, platform="ont")
    bridge = MpileupBridge(pe, CTG)
    return dict(ds=ds, out=out, bridge=bridge, lik=lik_path,
                aff_npz=aff_npz, neg_npz=neg_npz,
                ckpt_aff=ckpt_aff, ckpt_neg=ckpt_neg,
                genome=ds["genome"])


@pytest.fixture(scope="module")
def comp(tmp_path_factory):
    return _build_comp(
        tmp_path_factory.mktemp("comp"), seed=11, genome_len=GENOME_LEN,
        coverage=35, n_snv=18, n_germline=10)


@pytest.fixture(scope="module")
def comp_ilmn(tmp_path_factory):
    return _build_comp(
        tmp_path_factory.mktemp("comp_ilmn"), seed=23,
        genome_len=GENOME_LEN, coverage=40, read_length=150,
        n_snv=18, n_germline=10, error_rate=0.004)


def _run_ref_stage(module_name, argv, bridge, genome, monkeypatch):
    """Run a reference module's main() with mpileup + faidx stubbed."""
    mod = _import_ref(module_name)
    fake = _make_fake_popen(bridge)
    if hasattr(mod, "subprocess_popen"):
        monkeypatch.setattr(mod, "subprocess_popen", fake)
    if hasattr(mod, "reference_sequence_from"):
        monkeypatch.setattr(
            mod, "reference_sequence_from",
            lambda samtools_execute_command, fasta_file_path, regions:
            _fake_ref_seq(genome, regions))
    monkeypatch.setattr(sys, "argv", [module_name] + argv)
    mod.main()


def _fake_ref_seq(genome, regions):
    """samtools faidx output for 'ctg[:start-end]' region strings (1-based
    inclusive), concatenated like reference_sequence_from does."""
    parts = []
    for r in regions:
        if ":" in r:
            _, rng = r.split(":")
            s, e = rng.split("-")
            s = max(int(s), 1)
            parts.append(genome[s - 1:int(e)])
        else:
            parts.append(genome)
    return "".join(parts)


def _ref_pipeline(comp, monkeypatch, workdir, platform="ont",
                  postfilter=False):
    """The reference's STEP 1-2(-4)-5 composition for one SNV chunk.

    platform drives min_bq (ont 20 / ilmn 0 — the dual-view asymmetry,
    run_clairs_to:1237 vs :1264) and the postprocess qual defaults
    (shared/param.py:35-40); postfilter adds the ilmn STEP 4 chain with
    realignment disabled (run_clairs_to:1449-1482 with
    --enable_realignment False = symlink pass-through)."""
    ds = comp["ds"]
    bridge = comp["bridge"]
    genome = comp["genome"]
    min_bq = str(cfg.MIN_BQ_DICT[platform])
    qual, q_ph, q_unph = ((8, 8, 12) if platform != "ilmn" else (4, 4, 6))
    tmp = workdir
    for d in ("candidates", "pileup_tensor_can_affirmative",
              "pileup_tensor_can_negational", "predict", "vcf_output",
              "final"):
        os.makedirs(os.path.join(tmp, d), exist_ok=True)

    # STEP 1 (run_clairs_to:1196-1226)
    _run_ref_stage("extract_candidates_calling", [
        "--tumor_bam_fn", ds["bam"], "--ref_fn", ds["fasta"],
        "--samtools", "samtools",
        "--snv_min_af", str(cfg.SNV_MIN_AF),
        "--indel_min_af", "0.1",
        "--chunk_id", "1", "--chunk_num", "1", "--ctg_name", CTG,
        "--platform", platform,
        "--min_coverage", str(cfg.MIN_COVERAGE),
        "--min_bq", min_bq,
        "--candidates_folder", os.path.join(tmp, "candidates"),
        "--output_depth", "True",
    ], bridge, genome, monkeypatch)

    shard_list = os.path.join(tmp, "candidates",
                              f"SNV_CANDIDATES_FILE_{CTG}_0")
    assert os.path.exists(shard_list), "no SNV candidates emitted"
    shards = [l.strip() for l in open(shard_list) if l.strip()]
    assert shards

    for shard in shards:
        base = os.path.basename(shard)
        # STEP 2: AFF view (min_bq platform) + NEG view (min_bq 0; for
        # ilmn the views coincide and the driver symlinks,
        # run_clairs_to:1248-1252)
        views = [("affirmative", min_bq)]
        if platform == "ilmn":
            pass
        else:
            views.append(("negational", "0"))
        for view, view_bq in views:
            _run_ref_stage("create_tensor_pileup_calling", [
                "--tumor_bam_fn", ds["bam"], "--ref_fn", ds["fasta"],
                "--ctg_name", CTG, "--min_bq", view_bq,
                "--samtools", "samtools",
                "--candidates_bed_regions", shard,
                "--tensor_can_fn",
                os.path.join(tmp, f"pileup_tensor_can_{view}", base),
                "--platform", platform,
            ], bridge, genome, monkeypatch)
        if platform == "ilmn":
            os.symlink(
                os.path.join(tmp, "pileup_tensor_can_affirmative", base),
                os.path.join(tmp, "pileup_tensor_can_negational", base))
        # predict (torch) — pure file IO, no mpileup
        _run_ref_stage("clairs.predict", [
            "--tensor_fn_acgt",
            os.path.join(tmp, "pileup_tensor_can_affirmative", base),
            "--tensor_fn_nacgt",
            os.path.join(tmp, "pileup_tensor_can_negational", base),
            "--predict_fn", os.path.join(tmp, "predict", base),
            "--chkpnt_fn_acgt", comp["ckpt_aff"],
            "--chkpnt_fn_nacgt", comp["ckpt_neg"],
            "--use_gpu", "False", "--platform", platform,
            "--ctg_name", CTG, "--pileup",
            "--disable_indel_calling", "True",
        ], bridge, genome, monkeypatch)
        # call_variants
        _run_ref_stage("clairs.call_variants", [
            "--predict_fn", os.path.join(tmp, "predict", base),
            "--call_fn", os.path.join(tmp, "vcf_output", f"p_{base}.vcf"),
            "--ref_fn", ds["fasta"], "--platform", platform,
            "--likelihood_matrix_data", comp["lik"],
            "--disable_indel_calling", "True",
        ], bridge, genome, monkeypatch)

    # sort_vcf (run_clairs_to:1311-1317)
    contigs_fn = os.path.join(tmp, "CONTIGS")
    with open(contigs_fn, "w") as f:
        f.write(CTG + "\n")
    _run_ref_stage("sort_vcf", [
        "--ref_fn", ds["fasta"], "--contigs_fn", contigs_fn,
        "--input_dir", os.path.join(tmp, "vcf_output"),
        "--vcf_fn_suffix", "snv.vcf",
        "--output_fn", os.path.join(tmp, "vcf_output", "snv_pileup.vcf"),
    ], bridge, genome, monkeypatch)

    pp_input = os.path.join(tmp, "vcf_output", "snv_pileup.vcf")
    if postfilter:
        # STEP 3 disabled-tagging symlink (run_clairs_to:1356-1360), then
        # STEP 4 ilmn: realign (disabled -> symlink) + postfilter
        nst = os.path.join(tmp, "vcf_output",
                           "snv_pileup_nonsomatic_tagging.vcf")
        os.symlink(pp_input, nst)
        realigned = os.path.join(tmp, "vcf_output",
                                 "snv_pileup_realignment.vcf")
        _run_ref_stage("realign_variants", [
            "--bam_fn", ds["bam"], "--ref_fn", ds["fasta"],
            "--pileup_vcf_fn", nst,
            "--output_vcf_fn", realigned,
            "--samtools", "samtools", "--python", "python3",
            "--threads", "2",
            "--enable_realignment", "False",
        ], bridge, genome, monkeypatch)
        filtered = os.path.join(tmp, "vcf_output",
                                "snv_pileup_filtering.vcf")
        _run_ref_stage("postfilter_variants", [
            "--tumor_bam_fn", ds["bam"], "--ref_fn", ds["fasta"],
            "--pileup_vcf_fn", realigned,
            "--output_dir", os.path.join(tmp, "vcf_output"),
            "--output_vcf_fn", filtered,
            "--samtools", "samtools", "--pypy3", "pypy3",
            "--parallel", "parallel", "--threads", "2",
            "--enable_postfilter", "True",
            "--disable_read_start_end_filtering", "False",
            "--postfilter_variants_chunk_mode", "True",
        ], bridge, genome, monkeypatch)
        pp_input = filtered

    # STEP 5 postprocess (run_clairs_to:1516-1530)
    cmd_fn = os.path.join(tmp, "CMD")
    with open(cmd_fn, "w") as f:
        f.write("composition-test\n")
    out_vcf = os.path.join(tmp, "final", "snv.vcf")
    _run_ref_stage("postprocess_vcf", [
        "--ref_fn", ds["fasta"],
        "--pileup_vcf_fn", pp_input,
        "--output_fn", out_vcf,
        "--platform", platform,
        "--qual", str(qual),
        "--qual_cutoff_phaseable_region", str(q_ph),
        "--qual_cutoff_unphaseable_region", str(q_unph),
        "--af", str(cfg.SNV_MIN_AF),
        "--sample_name", "SAMPLE",
        "--disable_indel_calling", "True",
        "--cmdline", cmd_fn,
    ], bridge, genome, monkeypatch)
    return out_vcf


def _body(path):
    """VCF body rows (no headers); QUAL-bearing tab rows only."""
    if path.endswith(".gz"):
        lines = gzip.open(path, "rt").read().splitlines()
    else:
        lines = open(path).read().splitlines()
    return [l for l in lines if l and not l.startswith("#")]


def _load_predict_probs(path):
    """{pos: [16 floats]} from a predict TSV (ref's gz or our dump)."""
    out = {}
    with open(path, "rb") as probe:
        magic = probe.read(2)
    fh = gzip.open(path, "rt") if magic == b"\x1f\x8b" else open(path)
    for line in fh:
        cols = line.rstrip("\n").split("\t")
        probs = []
        for c in cols[6:]:
            c = c.strip()
            if not c:
                continue
            probs.extend(float(v) for v in c.split(" "))
        out[int(cols[1])] = probs
    return out


def _run_ours(comp, tmp_path, platform, extra=()):
    from clairs_to_tpu.cli.run import main as cli_main

    out_dir = str(tmp_path / "ours")
    our_predict = str(tmp_path / "our_predict")
    ds = comp["ds"]
    rc = cli_main([
        "-T", ds["bam"], "-R", ds["fasta"], "-o", out_dir,
        "-p", platform, "-t", "2",
        "--snv_pileup_affirmative_model_path", comp["aff_npz"],
        "--snv_pileup_negational_model_path", comp["neg_npz"],
        "--snv_likelihood_matrix_data", comp["lik"],
        "--disable_indel_calling", "true",
        "--disable_verdict",
        "--disable_nonsomatic_tagging",
        "--disable_intermediate_phasing",
        "--sample_name", "SAMPLE",
        "--device_batch", "256",
        "--predict_fn", our_predict,
        *extra,
    ])
    assert rc == 0
    return _body(os.path.join(out_dir, "snv.vcf")), our_predict + ".snv"


def _compare_rows(our_rows, ref_rows, ref_predict_dir, our_predict_path):
    assert len(our_rows) == len(ref_rows), (
        f"row count: ours {len(our_rows)} vs reference {len(ref_rows)}\n"
        f"ours-only: {set(r.split()[1] for r in our_rows) - set(r.split()[1] for r in ref_rows)}\n"
        f"ref-only: {set(r.split()[1] for r in ref_rows) - set(r.split()[1] for r in our_rows)}")

    # The one KNOWN divergence class: the dual forward runs in f32 on both
    # sides (torch vs XLA) and reassociation can move a printed probability
    # by 1-2 ulp; when that probability sits exactly on a likelihood-matrix
    # bin edge, np.digitize flips the bin and QUAL (and hence the PASS/
    # LowQual cutoff decision) moves.  Such rows must (a) agree on every
    # non-QUAL/FILTER column, (b) have all 16 printed probabilities within
    # 5e-7 of the reference's, and (c) be rare.
    ref_probs = None
    our_probs = None
    ulp_rows = 0
    for i, (a, b) in enumerate(zip(our_rows, ref_rows)):
        if a == b:
            continue
        ac = a.split("\t")
        bc = b.split("\t")
        assert (ac[:5] == bc[:5] and ac[7:] == bc[7:]), (
            f"row {i} differs beyond QUAL/FILTER:\n  ours: {a}\n  ref:  {b}")
        assert {ac[6], bc[6]} <= {"PASS", "LowQual"}, (a, b)
        if ref_probs is None:
            ref_probs = {}
            for f in os.listdir(ref_predict_dir):
                ref_probs.update(
                    _load_predict_probs(os.path.join(ref_predict_dir, f)))
            our_probs = _load_predict_probs(our_predict_path)
        pos = int(ac[1])
        rp = np.array(ref_probs[pos])
        op = np.array(our_probs[pos])
        assert np.abs(rp - op).max() <= 5e-7, (
            f"row {i} QUAL diverges with probability gap "
            f"{np.abs(rp - op).max():.2e} (not an ulp-edge case):\n"
            f"  ours: {a}\n  ref:  {b}")
        ulp_rows += 1
    assert ulp_rows <= max(2, len(ref_rows) // 20), (
        f"{ulp_rows}/{len(ref_rows)} rows hit the ulp-edge class — "
        "too many to be float noise")


def test_composition_matches_reference_ont_snv(comp, monkeypatch, tmp_path):
    ref_vcf = _ref_pipeline(comp, monkeypatch, str(tmp_path / "ref"))
    ref_rows = _body(ref_vcf)
    assert ref_rows, "reference composition produced no calls"
    our_rows, our_predict = _run_ours(
        comp, tmp_path, "ont",
        extra=("--apply_haplotype_filtering", "false"))
    _compare_rows(our_rows, ref_rows, str(tmp_path / "ref" / "predict"),
                  our_predict)


def test_composition_matches_reference_ilmn_snv_postfilter(
        comp_ilmn, monkeypatch, tmp_path):
    """ilmn variant: identical AFF/NEG views (symlink) + the STEP 4
    realign(off)+postfilter chain before postprocess."""
    ref_vcf = _ref_pipeline(comp_ilmn, monkeypatch, str(tmp_path / "ref"),
                            platform="ilmn", postfilter=True)
    ref_rows = _body(ref_vcf)
    assert ref_rows, "reference composition produced no calls"
    our_rows, our_predict = _run_ours(
        comp_ilmn, tmp_path, "ilmn",
        extra=("--enable_realignment", "false"))
    _compare_rows(our_rows, ref_rows, str(tmp_path / "ref" / "predict"),
                  our_predict)
