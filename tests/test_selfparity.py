"""Physics self-parity bounds (VERDICT r3 #9).

Reduced-grid version of ``scripts/physics_selfparity.py``: the perturbation
score distribution on a depth-spanning grasp batch must be stable across
narrowphase (CSG vs grid), timestep (1/240 vs 1/480) and solver iterations
(4 vs 8).  KS bound 0.35 on a 12-grasp batch: the protocol is a Bernoulli
mean over trials, so per-grasp scores jitter ~1/sqrt(trials) ≈ 0.3 at 12
trials; a SYSTEMATIC solver sensitivity shows up as a distribution shift
well above that, while the seeds/configs here were never tuned together.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from physics_selfparity import ks_distance, run  # noqa: E402


@pytest.fixture(scope="module")
def rows():
    return run(trials=12, n_grasps=12, out=None)


def test_selfparity_ks_bounds(rows):
    base = rows[0]
    assert base["ks_vs_baseline"] == 0.0
    for r in rows[1:]:
        assert r["ks_vs_baseline"] <= 0.35, (
            f"{r['config']} KS {r['ks_vs_baseline']} vs baseline — "
            "solver-knob sensitivity exceeds statistical jitter")


def test_selfparity_means_close(rows):
    base = rows[0]["mean"]
    for r in rows[1:]:
        assert abs(r["mean"] - base) <= 0.2, (
            f"{r['config']} mean {r['mean']} vs baseline {base}")
