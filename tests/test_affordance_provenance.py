"""Affordance label provenance (VERDICT r3 #8).

Every committed per-instance affordance npz must have been produced by the
drift-faithful ``try_grasp`` (``env_semantic.TRY_GRASP_VERSION``).  Git
history establishes this for the pre-stamp files (all 29 were written at or
after commit 004d086, which postdates the drift rewrite 3498151); files
regenerated from now on carry an explicit ``try_grasp_version`` stamp which
must match the current semantics version — a stale stamp means the labels
were produced by older physics and must be regenerated.
"""
import glob
import os

import numpy as np
import pytest

from catgrasp_tpu.sim import env_semantic as es

AFF_DIR = os.path.join(os.path.dirname(__file__), "..", "dataset", "affordance")


def _files():
    return sorted(glob.glob(os.path.join(AFF_DIR, "*_affordance.npz")))


def test_affordance_instances_all_present():
    files = _files()
    assert len(files) >= 29, f"expected >=29 affordance instances, got {len(files)}"


@pytest.mark.parametrize("path", _files(), ids=os.path.basename)
def test_affordance_stamp_current(path):
    d = np.load(path)
    if "try_grasp_version" not in d:
        # legacy pre-stamp file: provenance is established by git history
        # (committed at/after 004d086 > drift rewrite 3498151), not content
        pytest.skip("pre-stamp file; provenance from git history")
    assert int(d["try_grasp_version"]) == es.TRY_GRASP_VERSION, (
        f"{os.path.basename(path)} was labeled by try_grasp "
        f"v{int(d['try_grasp_version'])}; current is v{es.TRY_GRASP_VERSION} "
        "— regenerate with pipelines/generate_affordance")


def test_canonicals_carry_affordance_version():
    for c in ("nut", "screw", "hnm"):
        p = os.path.join(AFF_DIR, "..", f"{c}_canonical.npz")
        if not os.path.exists(p):
            continue
        d = np.load(p)
        if "affordance_version" in d:
            assert int(d["affordance_version"]) == es.TRY_GRASP_VERSION
