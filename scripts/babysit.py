"""Stall-watching launcher: kill-by-exact-PID + resume for long TPU runs.

Automates the babysitting protocol this repo's long runs require (see
CLAUDE.md "Environment facts"): the axon tunnel can leave one process
stuck forever inside a device call (futex wait, ~0% CPU, no log writes)
while the tunnel itself stays alive — observed repeatedly in rounds 3-4,
typically around TPU process churn. The manual recipe is "poll every job's
log every ~10 min, treat >2x the epoch period with no new line as a stall,
kill by exact PID, relaunch with the driver's resume flag". This script is
that recipe as a supervisor, so a 3-hour leg survives unattended.

Reference parallel: the reference's long experiments rely on the operator
re-running the script with `-load` after a crash (`UCIExperiments.py:116-122`
loss-history resume); here the supervisor performs the same resume
automatically on the TPU-specific hang failure mode.

Usage:
    python scripts/babysit.py --log LOG --stall SECONDS \
        [--grace SECONDS] [--max-restarts N] [--resume-arg -load] -- CMD...

Semantics:
  * CMD runs in its own process group, stdout+stderr appended to LOG.
  * If LOG's mtime goes silent for more than --stall seconds (after an
    initial --grace window that covers jit compile time), the whole group
    is killed (SIGTERM, then SIGKILL) and CMD is relaunched with
    --resume-arg appended (once; drivers treat a second -load as a no-op
    anyway since it is a boolean flag).
  * Exits with CMD's exit code once it terminates on its own; exits 124
    if --max-restarts is exhausted.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _kill_group(proc: subprocess.Popen, log) -> None:
    """SIGTERM the process group, escalate to SIGKILL after a grace period."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, wait_s in ((signal.SIGTERM, 10.0), (signal.SIGKILL, 10.0)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        deadline = time.time() + wait_s
        while time.time() < deadline:
            if proc.poll() is not None:
                return
            time.sleep(0.2)
        print(f"[babysit] pid {proc.pid} survived {sig.name}", file=log, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--log", required=True, help="file CMD's output is appended to; its mtime is the liveness signal")
    ap.add_argument("--stall", type=float, required=True, help="seconds of log silence that count as a stall (>2x the epoch period)")
    ap.add_argument("--grace", type=float, default=None, help="initial silence allowance covering jit compile (default 3x stall)")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--resume-arg", default="-load", help="flag appended on relaunch ('' = relaunch unchanged)")
    ap.add_argument("--poll", type=float, default=10.0, help="supervisor poll period")
    ap.add_argument("--settle", type=float, default=5.0, help="pause before a relaunch (tunnel churn avoidance)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER, help="-- CMD ARGS...")
    args = ap.parse_args(argv)

    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (append: -- CMD ARGS...)")
    grace = args.grace if args.grace is not None else 3 * args.stall

    restarts = 0
    resumed = False
    while True:
        launch_cmd = list(cmd)
        if resumed and args.resume_arg and args.resume_arg not in launch_cmd:
            launch_cmd.append(args.resume_arg)
        with open(args.log, "ab") as out:
            out.write(
                f"[babysit] launch #{restarts}: {' '.join(launch_cmd)}\n".encode()
            )
            out.flush()
            proc = subprocess.Popen(
                launch_cmd, stdout=out, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            started = time.time()
            while True:
                time.sleep(min(args.poll, max(args.stall / 4, 0.05)))
                rc = proc.poll()
                if rc is not None:
                    if rc == 0:
                        return 0
                    break  # crashed: relaunch below (same path as a stall)
                mtime = os.path.getmtime(args.log)
                # grace (jit compile window) applies for the first --grace
                # seconds after launch — drivers write startup lines BEFORE
                # the long first-epoch compile, so keying the window off the
                # first write (as this originally did) re-arms the short
                # stall limit right as the compile begins and kills every
                # launch on slow-compile days (observed r5: 15-25 min
                # compiles vs a 900 s stall limit, infinite kill loop)
                in_grace = time.time() - started < grace
                allowance = grace if in_grace else args.stall
                silent = time.time() - max(mtime, started)
                if silent > allowance:
                    print(
                        f"[babysit] stall: {silent:.0f}s of log silence "
                        f"(limit {allowance:.0f}s) — killing pid {proc.pid}",
                        flush=True,
                    )
                    out.write(b"[babysit] stall detected; killing process group\n")
                    out.flush()
                    _kill_group(proc, sys.stderr)
                    rc = None
                    break
        restarts += 1
        resumed = True
        if restarts > args.max_restarts:
            print(f"[babysit] giving up after {args.max_restarts} restarts", flush=True)
            return 124
        print(
            f"[babysit] relaunch {restarts}/{args.max_restarts} "
            f"(previous {'stalled' if rc is None else f'exited {rc}'})",
            flush=True,
        )
        time.sleep(args.settle)  # settle: avoid immediate churn against the tunnel


if __name__ == "__main__":
    sys.exit(main())
