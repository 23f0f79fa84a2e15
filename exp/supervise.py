"""Stall-watchdog supervisor for long runs against the relay-attached TPU.

The relay can wedge a dispatch forever (the FAILED_PRECONDITION wedge of
DESIGN.md §6 has a silent variant: the host thread sleeps in the dispatch
and never returns), and only a fresh process recovers the chip. This wraps
a *resumable* command — e.g. exp/curriculum.py, which checkpoints every
epoch and resumes mid-phase (train/shrink.py) — and restarts it whenever
its log stops advancing.

Usage:
    python exp/supervise.py --log /tmp/run.log [--stall_sec 900]
        [--max_restarts 8] -- python -u exp/curriculum.py ...

The child's stdout/stderr are appended to --log; progress is "the log file
grew". Exit code: the child's final exit code, or 3 if restarts were
exhausted while still stalling.
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def _cpu_seconds(pid):
    """utime+stime of the process (all threads), in seconds; 0.0 if gone."""
    try:
        with open("/proc/%d/stat" % pid) as f:
            fields = f.read().rsplit(") ", 1)[1].split()
        tick = os.sysconf("SC_CLK_TCK")
        return (int(fields[11]) + int(fields[12])) / tick
    except (OSError, IndexError, ValueError):
        return 0.0


def run_once(cmd, log_path, stall_sec, poll_sec=20):
    """Run cmd once; return ('exit', rc) or ('stall', None).

    Progress = the log grew OR the child burned CPU since the last poll.
    The CPU signal matters for compile-bound phases: an XLA-CPU compile of
    the full supernet step runs >1 h with zero log output, while a wedged
    relay dispatch sleeps at ~0 CPU — exactly the case to kill."""
    with open(log_path, "ab", buffering=0) as log:
        log.write(("\n==== supervise: launch %s ====\n"
                   % time.strftime("%Y-%m-%d %H:%M:%S")).encode())
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                start_new_session=True)
        try:
            last_size = os.path.getsize(log_path)
            last_cpu = _cpu_seconds(proc.pid)
            last_progress = time.time()
            while True:
                rc = proc.poll()
                if rc is not None:
                    return "exit", rc
                time.sleep(poll_sec)
                size = os.path.getsize(log_path)
                cpu = _cpu_seconds(proc.pid)
                if size != last_size or cpu - last_cpu >= 0.5:
                    last_size = size
                    last_cpu = cpu
                    last_progress = time.time()
                elif time.time() - last_progress > stall_sec:
                    log.write(("\n==== supervise: stalled %ds, killing pid "
                               "%d ====\n" % (stall_sec, proc.pid)).encode())
                    return "stall", None
        finally:
            if proc.poll() is None:
                # Kill the whole session (child may have worker threads /
                # grandchildren); never kill by pattern.
                try:
                    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                proc.wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--stall_sec", type=int, default=900,
                    help="no-log-growth window that counts as wedged; the "
                         "first relay compile of a full step is ~200-300 s, "
                         "so keep this comfortably above that")
    ap.add_argument("--max_restarts", type=int, default=8)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the command to supervise")
    a = ap.parse_args()
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    if not cmd:
        ap.error("no command given (pass it after --)")

    for attempt in range(a.max_restarts + 1):
        why, rc = run_once(cmd, a.log, a.stall_sec)
        if why == "exit":
            if rc == 0 or attempt == a.max_restarts:
                sys.exit(rc)
            # Non-zero exit: restart too (a wedged chip can also surface as
            # a hard dispatch error; the child resumes from checkpoints).
            print("supervise: child exited rc=%d, restart %d/%d"
                  % (rc, attempt + 1, a.max_restarts), flush=True)
        elif attempt < a.max_restarts:
            print("supervise: child stalled, restart %d/%d"
                  % (attempt + 1, a.max_restarts), flush=True)
    sys.exit(3)


if __name__ == "__main__":
    main()
