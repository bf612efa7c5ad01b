"""Relay the CLI trainer e2e files through a fresh child pytest process.

See the E2E_SUBPROCESS_FILES note in conftest.py: XLA:CPU on this host
segfaults compiling/serializing the big trainer executables only in
accumulated full-suite process state; the files pass reliably in a fresh
process, so they run in ONE shared child (a fresh interpreter with only
~15 tests accumulates far less state than the ~200-test main session, and
the three trainers share config-keyed step/executable caches — one child is
measurably faster than three).  If the shared child dies BY SIGNAL (the
accumulated-state crash mode), each file is retried in its own child — the
original, slower-but-isolated defense.  The files themselves are unchanged
and can be run directly (``DFT_E2E_INLINE=1 pytest tests/test_trainers.py``)
for debugging.

Named ``zz`` so the child runs after the in-process suite has warmed the
shared compile cache (its own entries persist across sessions too).
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import E2E_SUBPROCESS_FILES

_HERE = os.path.dirname(os.path.abspath(__file__))


class _TimedOut:
    """Sentinel result for a child that outlived its budget (duck-types the
    subset of CompletedProcess the caller reads)."""

    returncode = -9

    def __init__(self, exc):
        self.stdout = (exc.stdout or b"").decode() if isinstance(
            exc.stdout, bytes) else (exc.stdout or "")
        self.stderr = "child pytest timed out; killed\n"


def _run_child(fnames, timeout):
    env = dict(os.environ, DFT_E2E_CHILD="1")
    # when this relay runs inside a suite-shard child, the grandchild must
    # not inherit the shard's crash journal (its entries would pollute the
    # shard's resume/deselect bookkeeping)
    env.pop("DFT_SUITE_JOURNAL", None)
    try:
        return subprocess.run(
            [sys.executable, "-u", "-m", "pytest", "-q"]
            + [os.path.join(_HERE, f) for f in fnames],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(_HERE),
        )
    except subprocess.TimeoutExpired as exc:
        # subprocess.run kills the child on timeout; on a cold compile
        # cache the shared child can exceed the shared budget (full
        # trainer-pipeline XLA:CPU compiles dominate) — report it like a
        # signal death so the per-file fallback gets its own budget
        return _TimedOut(exc)


def test_e2e_files_in_fresh_process():
    if os.environ.get("DFT_E2E_CHILD") or os.environ.get("DFT_E2E_INLINE"):
        pytest.skip("already inside an e2e child / inline mode")
    proc = _run_child(E2E_SUBPROCESS_FILES, timeout=2700)
    if proc.returncode == 0:
        return
    if proc.returncode > 0:
        # real test failure — surface the child's report
        sys.stdout.write(proc.stdout[-8000:])
        sys.stderr.write(proc.stderr[-4000:])
        assert proc.returncode == 0, (
            f"e2e files failed in the shared child (exit {proc.returncode})"
        )
    # signal death: the accumulated-state XLA:CPU crash — fall back to one
    # child per file (isolated mode)
    sys.stderr.write(
        f"e2e shared child died with signal {-proc.returncode}; "
        "retrying each file in its own process\n"
    )
    for fname in E2E_SUBPROCESS_FILES:
        proc = _run_child([fname], timeout=1500)
        if proc.returncode != 0:
            sys.stdout.write(proc.stdout[-8000:])
            sys.stderr.write(proc.stderr[-4000:])
        assert proc.returncode == 0, (
            f"{fname} failed in its child process (exit {proc.returncode})"
        )
