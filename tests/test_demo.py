"""Self-contained acceptance demo: train tiny nets on simulated reads, call
a held-out genome, require high F1.  This is the framework's analog of the
reference's quick-demo expected-output tables (SURVEY.md §4)."""

import pytest

from clairs_to_tpu.bench.demo import run_demo


@pytest.mark.slow
def test_demo_f1(tmp_path):
    res = run_demo(str(tmp_path), quick=True, device_batch=256)
    print("\n" + res.report)
    # trained nets on separable synthetic data must land a strong F1
    assert res.f1 >= 0.85, res.report
    assert res.tp >= 10
