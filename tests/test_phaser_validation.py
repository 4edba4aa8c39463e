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
