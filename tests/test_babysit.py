"""Supervisor tests for scripts/babysit.py (stall kill + resume relaunch).

The supervisor automates CLAUDE.md's stall protocol for long TPU runs:
no-log-writes beyond a threshold -> kill the process group -> relaunch
with the driver's resume flag (the reference's crash story is the
operator re-running with `-load`, `UCIExperiments.py:116-122`; the TPU
tunnel's silent-hang failure mode makes an automated supervisor
necessary). All tests run pure-CPU subprocesses with tiny timeouts.
"""

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import babysit  # noqa: E402

PY = sys.executable


def _fake_driver(tmp_path, body) -> str:
    script = tmp_path / "fake_driver.py"
    script.write_text(textwrap.dedent(body))
    return str(script)


def test_clean_exit_passthrough(tmp_path):
    script = _fake_driver(
        tmp_path,
        """
        print("one epoch", flush=True)
        """,
    )
    log = tmp_path / "run.log"
    rc = babysit.main(
        ["--log", str(log), "--stall", "5", "--poll", "0.1",
         "--settle", "0.1", "--", PY, script]
    )
    assert rc == 0
    assert "one epoch" in log.read_text()
    assert "relaunch" not in log.read_text()


def test_stall_kill_and_resume(tmp_path):
    # first launch writes once then hangs; the -load relaunch finishes
    script = _fake_driver(
        tmp_path,
        """
        import sys, time
        if "-load" in sys.argv:
            print("resumed fine", flush=True)
            sys.exit(0)
        print("epoch 0", flush=True)
        time.sleep(120)
        """,
    )
    log = tmp_path / "run.log"
    rc = babysit.main(
        ["--log", str(log), "--stall", "1", "--grace", "8", "--poll", "0.1",
         "--settle", "0.1", "--max-restarts", "2", "--", PY, script]
    )
    text = log.read_text()
    assert rc == 0
    assert "stall detected" in text
    assert "resumed fine" in text
    assert "-load" in text.split("launch #1")[1]  # resume flag appended


def test_crash_relaunch(tmp_path):
    # a nonzero exit is retried through the same resume path
    script = _fake_driver(
        tmp_path,
        """
        import sys
        if "-load" in sys.argv:
            print("recovered", flush=True)
            sys.exit(0)
        print("about to crash", flush=True)
        sys.exit(3)
        """,
    )
    log = tmp_path / "run.log"
    rc = babysit.main(
        ["--log", str(log), "--stall", "5", "--poll", "0.1",
         "--settle", "0.1", "--max-restarts", "2", "--", PY, script]
    )
    assert rc == 0
    assert "recovered" in log.read_text()


def test_max_restarts_exhausted(tmp_path):
    script = _fake_driver(
        tmp_path,
        """
        import sys
        sys.exit(7)
        """,
    )
    log = tmp_path / "run.log"
    rc = babysit.main(
        ["--log", str(log), "--stall", "5", "--poll", "0.05",
         "--settle", "0.05", "--max-restarts", "1", "--", PY, script]
    )
    assert rc == 124
