"""Fast-tier tests for the crash-retry supervisor (scripts/supervise.py) and
the fault-injection hook — pure subprocess logic, no jax."""

import importlib.util
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_supervise():
    spec = importlib.util.spec_from_file_location(
        "supervise", REPO / "scripts" / "supervise.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ordinary_error_is_not_retried(tmp_path, capsys):
    sup = _load_supervise()
    counter = tmp_path / "attempts"
    script = (f"from pathlib import Path\n"
              f"p = Path({str(counter)!r})\n"
              f"p.write_text(p.read_text() + 'x' if p.exists() else 'x')\n"
              f"raise ValueError('bad config')\n")
    counter.write_text("")
    rc = sup.supervise([sys.executable, "-c", script], retries=3)
    assert rc != 0
    assert counter.read_text() == "x"  # exactly one attempt


def test_crash_signature_retries_and_recovers(tmp_path):
    sup = _load_supervise()
    token = tmp_path / "token"
    # first run: crash-shaped failure; retried run (token present): succeed,
    # and assert the wrapper appended the retry flag
    script = (
        "import sys\nfrom pathlib import Path\n"
        f"tok = Path({str(token)!r})\n"
        "if not tok.exists():\n"
        "    tok.write_text('')\n"
        "    raise RuntimeError('TPU worker process crashed or restarted')\n"
        "assert '--resume' in sys.argv, sys.argv\n"
        "print('resumed fine')\n")
    rc = sup.supervise([sys.executable, "-c", script], retries=2,
                       backoff_s=0.0)
    assert rc == 0 and token.exists()


def test_retries_bounded(tmp_path):
    sup = _load_supervise()
    script = "raise RuntimeError('TPU worker process crashed or restarted')"
    rc = sup.supervise([sys.executable, "-c", script], retries=2,
                       backoff_s=0.0)
    assert rc != 0


def test_signal_death_counts_as_crash():
    sup = _load_supervise()
    assert sup.looks_like_crash(-9, "")
    assert sup.looks_like_crash(1, "...UNAVAILABLE: socket gone...")
    assert not sup.looks_like_crash(1, "ValueError: shapes mismatch")


def test_inject_crash_hook(tmp_path, monkeypatch):
    from eegsynth.train.faults import ENV_VAR, maybe_inject_crash

    token = tmp_path / "tok"
    monkeypatch.setenv(ENV_VAR, f"5:{token}")
    maybe_inject_crash(4)                      # below threshold: no-op
    with pytest.raises(RuntimeError, match="worker process crashed"):
        maybe_inject_crash(5)
    assert token.exists()
    maybe_inject_crash(5)                      # token present: disabled
    monkeypatch.delenv(ENV_VAR)
    maybe_inject_crash(10**9)                  # unset: no-op


def test_cli_passthrough(tmp_path):
    """The CLI form runs a trivial command and propagates exit 0."""
    r = subprocess.run([sys.executable, str(REPO / "scripts" / "supervise.py"),
                        "--retries", "0", "--",
                        sys.executable, "-c", "print('ok')"],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "ok" in r.stdout
