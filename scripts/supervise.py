#!/usr/bin/env python3
"""Auto-resume supervisor: rerun a training CLI after a TPU worker crash.

The remote TPU runtime in this environment (and real TPU fleets) can kill its
worker mid-run ("TPU worker process crashed or restarted" — surfacing as an
exception at the next result fetch; CLAUDE.md watchdog notes). A wedged JAX
client cannot re-initialize its backend in-process, so recovery has to happen
at the PROCESS level: this wrapper runs the command as a subprocess, watches
its output for crash signatures, and relaunches it with ``--resume`` appended
(configurable) so the trainer continues from its last checkpoint boundary —
bounded retries, deterministic continuation (the trainers derive their RNG
streams from (seed, resume step), so a retried run's trajectory equals an
uninterrupted run from that boundary; tests/test_resume_crash.py).

The reference has no failure handling at all (SURVEY.md §5: "failure
detection: none"); its closest capability is the CGAN --resume flag
(/root/reference/CGAN/cgan.py:372-378), which still requires a human relaunch.

Usage:
  python scripts/supervise.py [--retries 2] [--retry-append --resume] -- \
      python -u scripts/train_timegan.py --config ... --parallel_buckets \
      --ckpt_every 2000
Exit code: the child's final exit code (0 on eventual success).
"""

import argparse
import subprocess
import sys
import time

# Signatures of the runtime/tunnel failures that warrant a resume-retry.
# Ordinary Python errors (config typos, shape bugs) must NOT be retried —
# they would fail identically forever.
CRASH_SIGNATURES = (
    "TPU worker process crashed",
    "worker process crashed or restarted",
    "Unable to initialize backend",
    "UNAVAILABLE:",
    "DATA_LOSS:",
    "DEADLINE_EXCEEDED:",
    "Socket closed",
)


def looks_like_crash(returncode: int, tail: str) -> bool:
    if returncode < 0:  # killed by signal (OOM killer, watchdog SIGKILL, ...)
        return True
    return any(sig in tail for sig in CRASH_SIGNATURES)


def run_once(cmd: list[str], tee=sys.stdout) -> tuple[int, str]:
    """Run cmd, streaming output through while keeping a tail buffer for
    signature matching."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, bufsize=1)
    tail: list[str] = []
    assert proc.stdout is not None
    for line in proc.stdout:
        tee.write(line)
        tee.flush()
        tail.append(line)
        if len(tail) > 200:
            del tail[:100]
    proc.wait()
    return proc.returncode, "".join(tail)


def supervise(cmd: list[str], retries: int = 2,
              retry_append: list[str] | None = None,
              backoff_s: float = 5.0, tee=sys.stdout) -> int:
    retry_append = retry_append or ["--resume"]
    attempt = 0
    while True:
        label = "launch" if attempt == 0 else f"retry {attempt}/{retries}"
        print(f"[supervise] {label}: {' '.join(cmd)}", flush=True)
        rc, tail = run_once(cmd, tee=tee)
        if rc == 0:
            if attempt:
                print(f"[supervise] recovered after {attempt} retr"
                      f"{'y' if attempt == 1 else 'ies'}", flush=True)
            return 0
        if attempt >= retries or not looks_like_crash(rc, tail):
            print(f"[supervise] giving up (rc={rc}, "
                  f"{'retries exhausted' if attempt >= retries else 'not a crash signature'})",
                  flush=True)
            return rc
        attempt += 1
        for extra in retry_append:
            if extra not in cmd:
                cmd = cmd + [extra]
        print(f"[supervise] crash signature detected (rc={rc}); resuming in "
              f"{backoff_s:.0f}s with: {' '.join(retry_append)}", flush=True)
        time.sleep(backoff_s)


def main():
    ap = argparse.ArgumentParser(
        description=__doc__.split("\n\n")[0],
        usage="supervise.py [--retries N] [--retry-append FLAG ...] -- cmd ...")
    ap.add_argument("--retries", type=int, default=2,
                    help="max relaunches after crash signatures")
    ap.add_argument("--retry-append", nargs="*", default=["--resume"],
                    help="flags appended to the command on retries "
                         "(deduplicated; default: --resume)")
    ap.add_argument("--backoff", type=float, default=5.0,
                    help="seconds to wait before each relaunch (lets the "
                         "remote runtime restart its worker)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the command to supervise")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (separate it with --)")
    sys.exit(supervise(cmd, retries=args.retries,
                       retry_append=args.retry_append, backoff_s=args.backoff))


if __name__ == "__main__":
    main()
