"""End-to-end CLI runs against the committed demo model assets."""

import os

import pytest

from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.bench.compare import compare_vcf
from clairs_to_tpu.bench.demo import DEFAULT_ASSET_DIR
from clairs_to_tpu.cli.run import main as cli_main

has_assets = os.path.exists(os.path.join(DEFAULT_ASSET_DIR, "aff.npz"))
pytestmark = pytest.mark.skipif(not has_assets, reason="demo assets missing")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("clisim")
    return simulate.make_dataset(
        str(out), seed=77, genome_len=50_000, coverage=55, n_snv=20, n_germline=8
    )


def test_cli_end_to_end_f1(dataset, tmp_path):
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "-T", dataset["bam"],
        "-R", dataset["fasta"],
        "-o", out_dir,
        "-t", "2",
        "-p", "ont",
        "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR,
        "--device_batch", "256",
        "--disable_intermediate_phasing",  # tested separately; simulator reads are unphased-friendly
    ])
    assert rc == 0
    snv = os.path.join(out_dir, "snv.vcf")
    assert os.path.exists(snv)
    res = compare_vcf(dataset["truth"], snv, input_filter_tag="PASS")
    print(f"\nCLI F1={res.f1} P={res.precision} R={res.recall} TP={res.tp} FP={res.fp} FN={res.fn}")
    assert res.f1 >= 0.85, (res.f1, res.tp, res.fp, res.fn)


def test_cli_dry_run(dataset, tmp_path, capsys):
    rc = cli_main([
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", str(tmp_path / "o"),
        "-t", "1", "-p", "ont", "--dry_run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "DRY RUN" in out and "chrS" in out


def test_cli_region_restriction(dataset, tmp_path):
    out_dir = str(tmp_path / "out_r")
    rc = cli_main([
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing",
        "-r", "chrS:1-10000",
    ])
    assert rc == 0
    body = [
        l for l in open(os.path.join(out_dir, "snv.vcf"))
        if not l.startswith("#")
    ]
    # precise gating: --region is materialised as a BED (tmp/region.bed) and
    # candidates outside it are excluded, not just non-overlapping chunks
    assert body, "region run produced no calls"
    assert all(1 <= int(l.split("\t")[1]) <= 10000 for l in body)
    assert os.path.exists(os.path.join(out_dir, "tmp", "region.bed"))


def test_cli_region_invalid(dataset, tmp_path):
    with pytest.raises(SystemExit):
        cli_main([
            "-T", dataset["bam"], "-R", dataset["fasta"],
            "-o", str(tmp_path / "o"), "-t", "1", "-p", "ont",
            "-r", "chrS:9000-100",
        ])


def test_cli_alt_fn_and_skip_steps(dataset, tmp_path):
    out_dir = str(tmp_path / "out_alt")
    alt_fn = str(tmp_path / "alt.tsv")
    argv = [
        "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
        "-t", "1", "-p", "ont", "--disable_indel_calling", "true",
        "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
        "--disable_intermediate_phasing",
        "--alt_fn", alt_fn, "--output_depth", "true", "--output_alt_info", "true",
    ]
    assert cli_main(argv) == 0
    rows = [l.rstrip("\n").split("\t") for l in open(alt_fn)]
    assert rows, "alt_fn dump is empty"
    for cols in rows:
        # ctg pos ref depth af_infos pileup_infos tumor_pileup_infos —
        # the reference's 7-column row incl. the trailing empty tumor
        # column (extract_candidates_calling.py:352-355); byte-level
        # parity is pinned by tests/test_reference_decoder_oracle.py
        assert len(cols) == 7
        assert cols[0] == "chrS" and int(cols[1]) >= 1 and cols[2] in "ACGT"
        assert int(cols[3]) > 0
        assert cols[6] == ""
    # --skip_steps validates indices and enables per-chunk resume
    with pytest.raises(SystemExit):
        cli_main(argv + ["--skip_steps", "0,x"])
    assert cli_main(argv + ["--skip_steps", "1,2"]) == 0


def test_cli_accepts_all_reference_flags():
    """Every --flag in the reference driver parses here (values may be
    no-ops; run_clairs_to:1903-2467 surface parity)."""
    import re

    from clairs_to_tpu.cli.run import build_parser

    ref_path = "/root/reference/run_clairs_to"
    if not os.path.exists(ref_path):
        pytest.skip("reference not mounted")
    ref_flags = sorted(set(re.findall(r'"(--[a-z_]+)"', open(ref_path).read())))
    p = build_parser()
    ours = {s for a in p._actions for s in a.option_strings}
    missing = [f for f in ref_flags if f not in ours]
    assert not missing, missing


def test_cli_version(capsys):
    with pytest.raises(SystemExit) as e:
        cli_main(["--version"])
    assert e.value.code == 0
    assert "clairs_to_tpu" in capsys.readouterr().out


def test_default_model_dir_resolution():
    """Without --model_dir the CLI resolves the committed flagship assets
    per platform family (reference run_clairs_to:612-819 analog)."""
    import os
    from clairs_to_tpu.cli.run import default_model_dir

    p = default_model_dir("ont")
    assert p is not None and p.endswith("flagship_ont_snv") and os.path.isdir(p)
    # ont_r10_dorado_sup_5khz-style aliases collapse to the ont family
    assert default_model_dir("ont_r10_dorado_sup_4khz") == p
    # ilmn/hifi resolve their own bundles (promoted round 2); an unknown
    # family would fall back to the ONT flagship with a loud warning
    pi = default_model_dir("ilmn")
    assert pi is not None and pi.endswith("flagship_ilmn_snv")
    ph = default_model_dir("hifi_revio")
    assert ph is not None and ph.endswith("flagship_hifi_snv")


def test_cli_chunked_equals_unchunked(dataset, tmp_path):
    """--chunk_num 3 (exercising the depth-2 dispatch-ahead queue) produces
    the same VCF body as a single-chunk run.  ONT phasing runs per chunk,
    so intermediate phasing is disabled to keep verdicts chunk-invariant
    (the documented MultiHap boundary class); every other stage windows
    within the chunk margins and must be chunking-independent."""
    outs = []
    for tag, extra in (("c1", ["--chunk_num", "1"]),
                       ("c3", ["--chunk_num", "3"])):
        out_dir = str(tmp_path / f"out_{tag}")
        rc = cli_main([
            "-T", dataset["bam"], "-R", dataset["fasta"], "-o", out_dir,
            "-t", "2", "-p", "ont", "--disable_indel_calling", "true",
            "--model_dir", DEFAULT_ASSET_DIR, "--device_batch", "256",
            "--disable_intermediate_phasing",
            *extra,
        ])
        assert rc == 0
        with open(os.path.join(out_dir, "snv.vcf")) as f:
            outs.append([l for l in f if not l.startswith("#")])
    assert outs[0] == outs[1]
    assert len(outs[0]) > 10
