"""Reproduce judge verification conditions: the full pytest suite running
WHILE a second, independent Spark session contends for the same cores.

The round-3 and round-4 verdicts both saw ``test_cache_hygiene`` fail in
the judge's full-suite run (a concurrent verification Spark session was
sharing the 32 cores) while passing in isolation. This harness makes that
load pattern a one-command local repro, so the suite's load-robustness is
proven before a judge ever runs it:

    python tools/judge_conditions.py            # one full run
    python tools/judge_conditions.py --twice    # the r4 done-criterion

It starts a background subprocess that LOOPS ``tools/oracle_check.py``
(a separate driver JVM, its own local[*] scheduler — exactly the judge's
setup) for the whole duration of the pytest run, then reports both exit
statuses. The background sweep's correctness output is discarded; it
exists purely as CPU/GC/scheduler contention.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _start_contender(log_path: str) -> subprocess.Popen:
    """Loop the full oracle sweep at sf0.01 in a separate process group
    until terminated. A shell loop keeps a Spark JVM alive ~continuously
    (each sweep is minutes long; restart gap is seconds)."""
    log = open(log_path, "w")
    return subprocess.Popen(
        ["bash", "-c",
         f"while true; do python {REPO}/tools/oracle_check.py "
         f"/root/testdata/sf0.01; done"],
        stdout=log, stderr=subprocess.STDOUT,
        cwd=REPO, start_new_session=True,
    )


def run_once(run_idx: int) -> int:
    contender = _start_contender(f"/tmp/judge_conditions_contender_{run_idx}.log")
    time.sleep(20)  # let the contender JVM come up before pytest starts
    try:
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
            cwd=REPO)
        print(f"[judge-conditions] run {run_idx}: pytest rc={rc} "
              f"in {time.time() - t0:.0f}s under concurrent load")
        return rc
    finally:
        os.killpg(os.getpgid(contender.pid), signal.SIGTERM)
        contender.wait(timeout=30)


def main() -> int:
    runs = 2 if "--twice" in sys.argv else 1
    for i in range(1, runs + 1):
        rc = run_once(i)
        if rc != 0:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
