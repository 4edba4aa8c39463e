"""Threshold enforcement for the internal phaser (docs/PHASER_VALIDATION.md).

Runs one configuration of tools/validate_phaser.py's truth-based
evaluation; the full sweep is committed as the validation artifact.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

from validate_phaser import evaluate  # noqa: E402


def test_phaser_switch_error_and_tag_accuracy():
    r = evaluate(seed=301, coverage=60, read_length=800, error_rate=0.01,
                 n_germline=60)
    assert r["informative"] >= 50
    assert r["switch_error"] <= 0.05, r
    assert r["tag_accuracy"] >= 0.95, r
    assert r["tagged_fraction"] >= 0.2, r


def test_mst_cross_check_agreement():
    """The greedy phaser and the independent MST-exact solver must agree
    on relative orientations (swap-invariant) on a standard config — a
    tool-vs-tool check with disjoint failure modes (round-3 verdict
    weak #7)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from validate_phaser import evaluate

    r = evaluate(401, coverage=50, read_length=800, error_rate=0.02,
                 n_germline=100)
    assert r["method_agreement"] >= 0.98
    assert r["mst_switch_error"] <= 0.02
    assert r["switch_error"] <= 0.02
