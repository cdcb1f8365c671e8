"""bench.py's retry-once capture harness (VERDICT r4 directive 2).

Round 4 lost its driver-captured perf number to a capture-time tunnel wedge
(BENCH_r04 recorded the watchdog's rc=3 instead of a value). The harness
under test: the parent re-execs bench.py as a child; a child exit of 3 (the
backend-init watchdog) or a signal death triggers exactly ONE retry after
NES_BENCH_RETRY_WAIT seconds; any other exit passes through unchanged. The
NES_BENCH_TEST_CHILD_RC hook makes the child exit immediately with a forced
code so none of this touches a backend.
"""

import os
import subprocess
import sys

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)


def _run(tmp_path, child_rc: str):
    marks = str(tmp_path / "marks.txt")
    env = {
        **os.environ,
        "NES_BENCH_TEST_CHILD_RC": child_rc,
        "NES_BENCH_TEST_MARKS": marks,
        "NES_BENCH_RETRY_WAIT": "0.1",
    }
    env.pop("NES_BENCH_CHILD", None)
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=120)
    attempts = 0
    if os.path.exists(marks):
        with open(marks) as f:
            attempts = f.read().count("attempt")
    return proc.returncode, attempts, proc.stderr


def test_wedge_rc3_retries_exactly_once(tmp_path):
    rc, attempts, err = _run(tmp_path, "3")
    assert rc == 3
    assert attempts == 2  # first try + exactly one retry
    assert "retrying" in err


def test_success_no_retry(tmp_path):
    rc, attempts, _ = _run(tmp_path, "0")
    assert rc == 0
    assert attempts == 1


def test_real_failure_passes_through_without_retry(tmp_path):
    rc, attempts, _ = _run(tmp_path, "1")
    assert rc == 1
    assert attempts == 1
