"""Fault injection for failure-recovery tests.

The reference has no failure handling (SURVEY.md §5 "failure detection:
none"); eegsynth ships crash-resume (trainer ``--resume`` /
``train_all_buckets(resume=True)``) plus a process-level supervisor
(scripts/supervise.py). Proving that path needs a deterministic way to kill a
run mid-phase: set

    EEGSYNTH_INJECT_CRASH="<step>:<token_path>"

and the trainers raise a runtime-crash-shaped RuntimeError at the first
chunk boundary where ``done >= step`` — ONCE: the token file is written
before raising, and an existing token disables the fault, so the supervised
retry of the same command runs through. Production runs never set the env
var; the check is two dict lookups.
"""

from __future__ import annotations

import os
from pathlib import Path

ENV_VAR = "EEGSYNTH_INJECT_CRASH"


def maybe_inject_crash(done: int) -> None:
    spec = os.environ.get(ENV_VAR)
    if not spec:
        return
    step_s, _, token = spec.partition(":")
    if not token:
        raise ValueError(f"{ENV_VAR} must be '<step>:<token_path>', got {spec!r}")
    tok = Path(token)
    if done >= int(step_s) and not tok.exists():
        tok.write_text(str(done))
        raise RuntimeError(
            "TPU worker process crashed or restarted (injected fault at "
            f"step {done})")
