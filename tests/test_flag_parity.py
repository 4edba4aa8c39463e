"""Table-driven parity of CLI flag defaulting vs the reference driver.

Pins the resolution rules of /root/reference/run_clairs_to:
  * per-platform indel_min_af (:895-904)
  * default PoN list + allele/position matching modes (:821-878)
  * ASPCF penalty 1000 (src/cna_germline_tagging.py:137)
"""

import os

import pytest

from clairs_to_tpu.cli.run import (
    DEFAULT_PON_FILES,
    build_parser,
    resolve_af_defaults,
    resolve_pon_defaults,
)


def _args(extra):
    p = build_parser()
    return p.parse_args(
        ["-T", "t.bam", "-R", "r.fa", "-o", "out", "-p", "ont"] + extra
    )


# (platform, disable_indel_calling, explicit_flag) -> expected indel_min_af
INDEL_AF_TABLE = [
    ("ont", "False", None, 0.1),
    ("ont_r10_dorado_sup_5khz", "False", None, 0.1),
    ("ilmn", "False", None, 0.05),
    ("hifi_revio", "False", None, 0.05),
    ("hifi_sequel2", "False", None, 0.05),
    ("ont", "True", None, 1.0),
    ("ilmn", "True", None, 1.0),
    ("ilmn", "False", 0.2, 0.2),     # explicit flag wins
]


@pytest.mark.parametrize("platform,disable,flag,want", INDEL_AF_TABLE)
def test_indel_min_af_defaulting(platform, disable, flag, want):
    extra = ["--disable_indel_calling", disable]
    if flag is not None:
        extra += ["--indel_min_af", str(flag)]
    a = _args(extra)
    a.platform = platform
    resolve_af_defaults(a)
    assert a.indel_min_af == want
    assert a.snv_min_af == 0.05


def test_aspcf_penalty_default():
    a = _args([])
    assert a.aspcf_penalty == 1000.0
    from clairs_to_tpu.verdict.pipeline import run_verdict
    import inspect
    assert inspect.signature(run_verdict).parameters["penalty"].default == 1000


def test_pon_default_resolution(tmp_path):
    for fname, _m in DEFAULT_PON_FILES:
        (tmp_path / fname).write_bytes(b"x")
    a = _args(["--pon_resource_dir", str(tmp_path)])
    resolve_pon_defaults(a)
    got = a.panel_of_normals.split(",")
    assert [os.path.basename(p) for p in got] == [f for f, _ in DEFAULT_PON_FILES]
    # gnomAD/dbSNP by allele, 1kg-PoN/CoLoRSdb by position (run_clairs_to:877)
    assert a.panel_of_normals_require_allele_matching == "True,True,False,False"


def test_pon_default_missing_file_fails_loud(tmp_path):
    (tmp_path / DEFAULT_PON_FILES[0][0]).write_bytes(b"x")  # only gnomAD
    a = _args(["--pon_resource_dir", str(tmp_path)])
    with pytest.raises(SystemExit):
        resolve_pon_defaults(a)


def test_pon_absent_dir_skips_with_notice(tmp_path, capsys):
    a = _args(["--pon_resource_dir", str(tmp_path / "nope")])
    resolve_pon_defaults(a)
    assert a.panel_of_normals is None
    assert "not installed" in capsys.readouterr().out


def test_pon_literal_none_disables_tagging():
    a = _args(["--panel_of_normals", "None"])
    resolve_pon_defaults(a)
    assert a.disable_nonsomatic_tagging is True
    assert a.panel_of_normals is None


def test_pon_explicit_list(tmp_path):
    p1 = tmp_path / "a.vcf.gz"
    p2 = tmp_path / "b.vcf.gz"
    p1.write_bytes(b"x")
    p2.write_bytes(b"x")
    a = _args(["--panel_of_normals", f"{p1},{p2}"])
    resolve_pon_defaults(a)
    # matching modes default to all-True for explicit lists (:869-871)
    assert a.panel_of_normals_require_allele_matching == "True,True"

    a = _args(["--panel_of_normals", f"{p1},{tmp_path / 'missing.vcf.gz'}"])
    with pytest.raises(SystemExit):
        resolve_pon_defaults(a)
