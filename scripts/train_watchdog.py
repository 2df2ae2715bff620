"""Unattended long-run supervisor for TPU training (VERDICT r2 item 8).

The axon TPU tunnel occasionally hangs: the training process goes
zero-CPU with a silent log (documented in CLAUDE.md; it happened twice in
30 minutes during round-2 long runs). The manual recovery — kill via the
saved pidfile, relaunch with ``-load true`` — is automated here:

  python scripts/train_watchdog.py [watchdog opts] -- \
      train.py -algo PerDuelingDoubleDQNAgent -backend device \
      -n_env 256 -replay_ratio 1 -n_step 3 -max_total_steps 6300000 ...

* Spawns the training command as a DIRECT child (its pid is written to
  ``--pidfile``; kills go to that exact pid — never pkill-by-pattern,
  which can match this supervisor's own command line).
* Samples the child's cumulative CPU time (utime+stime from
  ``/proc/<pid>/stat``) every ``--poll`` seconds. If it does not grow at
  all for ``--stall-seconds``, the child is presumed tunnel-hung, killed
  (SIGKILL — it is wedged in a device wait, SIGTERM won't land), and
  relaunched with ``-load true`` so it resumes from the last periodic
  checkpoint. Slow-but-nonzero CPU growth (the ~15-min first compile
  through the relay) does NOT trip the detector.
* A child that exits non-zero is also relaunched with ``-load true``
  (tunnel errors surface as crashes too), up to ``--max-restarts``.
* Exit code 0 from the child ends supervision successfully.

DeviceTrainer checkpoints every ~2 min and (since round 3) accounts env
steps GLOBALLY across resumes, so a relaunch costs at most the last save
interval and snapshot tags/budget stay correct.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def cpu_jiffies(pid: int) -> int | None:
    """utime+stime of ``pid`` in clock ticks, or None if it is gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            fields = f.read().rsplit(")", 1)[1].split()
        # fields[0] is state; utime/stime are the 12th/13th after comm.
        return int(fields[11]) + int(fields[12])
    except (OSError, IndexError, ValueError):
        return None


def kill_pid(pid: int) -> None:
    try:
        os.kill(pid, signal.SIGKILL)
    except ProcessLookupError:
        return
    for _ in range(50):
        try:
            os.waitpid(pid, os.WNOHANG)
        except ChildProcessError:
            return
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return
        time.sleep(0.2)


def with_load_true(cmd: list[str]) -> list[str]:
    """Append ``-load true`` (argparse last-wins, so appending overrides a
    ``-load false`` from the original invocation)."""
    return list(cmd) + ["-load", "true"]


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--stall-seconds", type=float, default=600.0,
                    help="zero-CPU-growth window that declares a hang. "
                         "Keep this comfortably above the longest legal "
                         "zero-CPU wait: a full-Carry checkpoint of a "
                         "multi-GB replay buffer can block on the tunnel "
                         "transfer with no CPU growth for minutes")
    ap.add_argument("--progress-stall-seconds", type=float, default=1800.0,
                    help="secondary detector (needs --log): kill if the "
                         "child's log file has not grown for this long. "
                         "Catches hangs the CPU detector misses — an "
                         "observed tunnel hang kept ticking ~1 jiffy/30s "
                         "(runtime bookkeeping), defeating the zero-growth "
                         "rule forever, while the trainer normally logs "
                         "every few seconds. Default 1800s = 2x the longest "
                         "observed first-compile silence (~15 min through "
                         "the relay)")
    ap.add_argument("--poll", type=float, default=15.0)
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--pidfile", default="/tmp/train_watchdog_child.pid")
    ap.add_argument("--log", default="",
                    help="append child stdout/stderr to this file "
                         "(default: inherit)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the training command (train.py ...)")
    args = ap.parse_args()

    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no training command given (pass it after --)")
    if not cmd[0].startswith(sys.executable) and cmd[0].endswith(".py"):
        cmd = [sys.executable, "-u"] + cmd

    restarts = 0
    attempt_cmd = list(cmd)
    while True:
        log_f = open(args.log, "a") if args.log else None
        child = subprocess.Popen(
            attempt_cmd,
            stdout=log_f or None, stderr=subprocess.STDOUT if log_f else None)
        if log_f:
            log_f.close()
        with open(args.pidfile, "w") as f:
            f.write(str(child.pid))
        print(f"[watchdog] started pid {child.pid}: {' '.join(attempt_cmd)}",
              flush=True)

        last_cpu = -1
        last_growth = time.time()
        last_log_size = -1
        last_log_growth = time.time()
        hung = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            cpu = cpu_jiffies(child.pid)
            now = time.time()
            if cpu is not None and cpu != last_cpu:
                last_cpu = cpu
                last_growth = now
            elif now - last_growth > args.stall_seconds:
                print(f"[watchdog] pid {child.pid}: no CPU growth for "
                      f"{now - last_growth:.0f}s — killing (tunnel hang)",
                      flush=True)
                kill_pid(child.pid)
                hung = True
                break
            if args.log:
                try:
                    size = os.stat(args.log).st_size
                except OSError:
                    size = -1
                if size != last_log_size:
                    last_log_size = size
                    last_log_growth = now
                elif now - last_log_growth > args.progress_stall_seconds:
                    print(f"[watchdog] pid {child.pid}: log silent for "
                          f"{now - last_log_growth:.0f}s — killing "
                          "(tunnel hang with residual CPU ticks)",
                          flush=True)
                    kill_pid(child.pid)
                    hung = True
                    break
            time.sleep(args.poll)

        if not hung and child.returncode == 0:
            print("[watchdog] training finished cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[watchdog] giving up after {args.max_restarts} restarts",
                  flush=True)
            return 1
        reason = "hang" if hung else f"exit {child.returncode}"
        print(f"[watchdog] restart {restarts}/{args.max_restarts} "
              f"after {reason}; resuming with -load true", flush=True)
        attempt_cmd = with_load_true(cmd)
        time.sleep(10.0)  # give the tunnel a moment to recover


if __name__ == "__main__":
    sys.exit(main())
