"""Opportunistic differential test vs real reference binaries.

Runs scripts/diff_reference.py (cross-build + cross-classify in both
directions, sorted .all equality) whenever `ganon-build` and
`ganon-classify` are on PATH; skipped otherwise (they cannot be built in
this environment — the seqan3 submodule is not vendored,
/root/reference/.gitmodules).
"""

import subprocess
import sys

import pytest

from scripts.diff_reference import have_binaries


@pytest.mark.skipif(
    not have_binaries(), reason="reference binaries not on PATH"
)
def test_cross_validation_vs_reference(tmp_path):
    r = subprocess.run(
        [sys.executable, "scripts/diff_reference.py", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
