"""--exact_reference_fisher parity: bitwise-identical p-values.

``fisher_exact_reference`` must reproduce the reference's two-tail
multiplicative recurrence (/root/reference/src/postfilter_variants.py:52-88)
float-for-float — including the round-off-dependent inclusion of
exactly-tied mirror tables on symmetric margins, which is the one place
the default ``fisher_exact`` deliberately diverges.
"""

import importlib
import os
import sys

import numpy as np
import pytest

from clairs_to_tpu.postcall.hardfilter import (
    fisher_exact,
    fisher_exact_reference,
)

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "src")),
    reason="reference tree not mounted")


def _ref_fisher():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    sys.path.insert(0, os.path.join(REF_ROOT, "src"))
    return importlib.import_module("postfilter_variants").fisher_exact


def _tables():
    rng = np.random.default_rng(77)
    out = []
    # random tables across scales
    for _ in range(600):
        out.append([[int(rng.integers(0, 60)), int(rng.integers(0, 60))],
                    [int(rng.integers(0, 60)), int(rng.integers(0, 60))]])
    # symmetric-margin tables: the tie-sensitive family
    for _ in range(400):
        a = int(rng.integers(0, 30))
        b = int(rng.integers(0, 30))
        out.append([[a, b], [b, a]])
    # degenerate margins
    for t in ([[0, 0], [0, 0]], [[5, 0], [0, 5]], [[0, 7], [7, 0]],
              [[1, 1], [1, 1]], [[40, 0], [0, 0]], [[0, 0], [12, 3]]):
        out.append([list(t[0]), list(t[1])])
    return out


def test_bitwise_identity_vs_reference():
    ref = _ref_fisher()
    n_tie_div = 0
    for t in _tables():
        want = ref([[t[0][0], t[0][1]], [t[1][0], t[1][1]]])
        got = fisher_exact_reference(t)
        assert got == want, (t, got, want)
        # count how often the DEFAULT test differs (documented tie cases)
        if abs(fisher_exact(t) - min(want, 1.0)) > 1e-9 * max(want, 1e-300):
            n_tie_div += 1
    # the default implementation's deliberate divergence exists but is rare
    assert n_tie_div < 300


def test_decision_threshold_parity():
    """The PASS decision (p < 0.001 / 0.01) is identical between the exact
    mode and the reference on every fuzz table — the property the opt-in
    mode guarantees for PASS-set parity."""
    ref = _ref_fisher()
    for t in _tables():
        want = ref([[t[0][0], t[0][1]], [t[1][0], t[1][1]]])
        got = fisher_exact_reference(t)
        for cut in (0.001, 0.01):
            assert (got < cut) == (want < cut)
