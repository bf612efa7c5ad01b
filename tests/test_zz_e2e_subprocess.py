"""Relay the CLI trainer e2e files through fresh child pytest processes.

See the E2E_SUBPROCESS_FILES note in conftest.py: XLA:CPU on this host
segfaults compiling/serializing the big trainer executables only in
accumulated full-suite process state; each file passes reliably in a fresh
process, so each runs in its own child and this module asserts the result.
The files themselves are unchanged and can be run directly
(``DFT_E2E_INLINE=1 pytest tests/test_trainers.py``) for debugging.

Named ``zz`` so the children run after the in-process suite has warmed the
shared compile cache (their own entries persist across sessions too).
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import E2E_SUBPROCESS_FILES

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.parametrize("fname", E2E_SUBPROCESS_FILES)
def test_e2e_file_in_fresh_process(fname):
    if os.environ.get("DFT_E2E_CHILD") or os.environ.get("DFT_E2E_INLINE"):
        pytest.skip("already inside an e2e child / inline mode")
    env = dict(os.environ, DFT_E2E_CHILD="1")
    proc = subprocess.run(
        [sys.executable, "-u", "-m", "pytest", "-q",
         os.path.join(_HERE, fname)],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=os.path.dirname(_HERE),
    )
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-8000:])
        sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, (
        f"{fname} failed in its child process (exit {proc.returncode})"
    )
