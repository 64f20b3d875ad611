#!/usr/bin/env python3
"""Process-parallel test/command runner — the tool_pexec.sh analogue.

The reference runs its test lists process-parallel with per-test logs and
a keep-going summary (/root/reference/scripts/tool_pexec.sh); this is the
same contract for this repo's suites:

    # run each line of a command list, N-way parallel, logs under LOGDIR
    python scripts/pexec.py --jobs 4 --log .claude/pexec cmds.txt

    # or shard the pytest suite by test FILE (the common use):
    python scripts/pexec.py --pytest tests/ --jobs 4

Exit code = number of failed commands (0 = all green). Each command's
stdout+stderr goes to <log>/<slug>.log; the summary table prints at the
end and is written to <log>/summary.txt. A per-command timeout (SIGKILL
escalation like tpu_battery.sh) keeps one hang from stalling the rest.
"""

import argparse
import os
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def _slug(cmd: str) -> str:
    s = re.sub(r"[^A-Za-z0-9._-]+", "_", cmd.strip())
    return s[:80].strip("_") or "cmd"


def run_one(cmd: str, logdir: str, timeout_s: float):
    slug = _slug(cmd)
    path = os.path.join(logdir, slug + ".log")
    t0 = time.time()
    with open(path, "wb") as log:
        try:
            proc = subprocess.Popen(cmd, shell=True, stdout=log,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
            try:
                rc = proc.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                # kill the exact process group we started (never by name)
                try:
                    os.killpg(proc.pid, 9)
                except OSError:
                    proc.kill()
                proc.wait()
                rc = "timeout"
        except OSError as e:
            rc = f"spawn-error:{e}"
    return cmd, rc, time.time() - t0, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("list_file", nargs="?",
                    help="file with one shell command per line "
                         "(# comments ok); or use --pytest")
    ap.add_argument("--pytest", metavar="DIR",
                    help="shard `pytest <file> -q` per test file in DIR")
    ap.add_argument("--jobs", type=int,
                    default=max(2, (os.cpu_count() or 4) // 2))
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-command timeout seconds")
    ap.add_argument("--log", default=".claude/pexec")
    args = ap.parse_args()

    cmds = []
    if args.pytest:
        for name in sorted(os.listdir(args.pytest)):
            if name.startswith("test_") and name.endswith(".py"):
                cmds.append(f"{sys.executable} -m pytest "
                            f"{os.path.join(args.pytest, name)} -q")
    if args.list_file:
        with open(args.list_file) as f:
            cmds += [ln.strip() for ln in f
                     if ln.strip() and not ln.lstrip().startswith("#")]
    if not cmds:
        ap.error("nothing to run (give a list file or --pytest DIR)")

    os.makedirs(args.log, exist_ok=True)
    results = []
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        futs = [pool.submit(run_one, c, args.log, args.timeout)
                for c in cmds]
        for fut in futs:
            cmd, rc, dt, path = fut.result()
            ok = rc == 0
            print(f"{'ok  ' if ok else 'FAIL'} rc={rc!s:>3} {dt:7.1f}s  "
                  f"{cmd}" + ("" if ok else f"   [log: {path}]"))
            results.append((cmd, rc, dt))
    failed = [r for r in results if r[1] != 0]
    summary = (f"{len(results) - len(failed)}/{len(results)} passed, "
               f"{len(failed)} failed")
    print(summary)
    with open(os.path.join(args.log, "summary.txt"), "w") as f:
        for cmd, rc, dt in results:
            f.write(f"rc={rc} {dt:.1f}s {cmd}\n")
        f.write(summary + "\n")
    sys.exit(min(len(failed), 125))


if __name__ == "__main__":
    main()
