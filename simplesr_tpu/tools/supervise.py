"""Crash supervisor for long training runs.

    python -m simplesr_tpu.tools.supervise <config.yaml> \
        [--max-restarts N] [--backoff SECONDS]

Runs `python -m simplesr_tpu.tools.train <config.yaml>` as a child process
and, when the child CRASHES (nonzero exit other than the preemption code),
restarts it with ``--resume`` — the per-epoch resume point
(docs/training.md) means a crash loses at most one epoch. Together with
the in-process divergence guard and the SIGTERM resume point, this closes
the failure-recovery loop: transient faults (tunnel blips, OOM kills,
segfaults) self-heal without losing the run.

Exit semantics:
  * child exits 0 (training complete)        → supervisor exits 0;
  * child exits 75 (preempted via SIGTERM)   → supervisor exits 75 —
    the host is going away; the NEXT invocation resumes;
  * child crashes                            → restart with --resume,
    up to --max-restarts, then exit with the child's last code.

SIGTERM/SIGINT to the supervisor forward to the child (so the child's
graceful preemption path runs) and the supervisor exits with the child's
code without restarting.

Testing hook: ``--cmd`` replaces the training command (argv list; the
supervisor appends ``--resume`` on restarts) so the restart logic is
testable without a TPU.
"""

import argparse
import signal
import subprocess
import sys
import time

EXIT_PREEMPTED = 75


def _run_once(cmd, forward_signals=True):
    """Run the child, forwarding SIGTERM/SIGINT. Returns (rc, forwarded)."""
    child = subprocess.Popen(cmd)
    forwarded = {"flag": False}

    def handler(signum, _frame):
        forwarded["flag"] = True
        try:
            child.send_signal(signum)
        except OSError:
            pass

    prev = {}
    if forward_signals:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev[sig] = signal.signal(sig, handler)
    try:
        rc = child.wait()
    finally:
        for sig, h in prev.items():
            signal.signal(sig, h)
    return rc, forwarded["flag"]


def supervise(cmd, max_restarts=10, backoff=10.0, log=print):
    """Run ``cmd`` until success/preemption, restarting crashes with
    ``--resume`` appended. Returns the final exit code."""
    attempt = 0
    current = list(cmd)
    while True:
        log(f"[supervise] attempt {attempt + 1}: {' '.join(current)}")
        rc, forwarded = _run_once(current)
        if rc == 0:
            log("[supervise] training complete")
            return 0
        if rc == EXIT_PREEMPTED or forwarded:
            log(f"[supervise] child stopped (rc={rc}, "
                f"signal_forwarded={forwarded}) - not restarting; "
                "rerun to resume")
            return rc
        attempt += 1
        if attempt > max_restarts:
            log(f"[supervise] child crashed (rc={rc}); restart budget "
                f"({max_restarts}) exhausted")
            return rc
        log(f"[supervise] child crashed (rc={rc}); restarting with "
            f"--resume in {backoff:g}s ({attempt}/{max_restarts})")
        time.sleep(backoff)
        if "--resume" not in current:
            current = current + ["--resume"]


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Supervise a training run: restart crashes with "
                    "--resume")
    p.add_argument("config", nargs="?",
                   help="YAML config (ignored with --cmd)")
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("--backoff", type=float, default=10.0,
                   help="seconds between restarts")
    p.add_argument("--cmd", nargs=argparse.REMAINDER, default=None,
                   help="override the child command (testing hook); "
                        "--resume is appended on restarts")
    args = p.parse_args(argv)
    if args.max_restarts < 0:
        p.error("--max-restarts must be >= 0")
    if args.backoff < 0:
        p.error("--backoff must be >= 0")
    if args.cmd:
        cmd = args.cmd
    elif args.config:
        cmd = [sys.executable, "-m", "simplesr_tpu.tools.train", args.config]
    else:
        p.error("a config YAML (or --cmd) is required")
    return supervise(cmd, max_restarts=args.max_restarts,
                     backoff=args.backoff)


if __name__ == "__main__":
    sys.exit(main())
