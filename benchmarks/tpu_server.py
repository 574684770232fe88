"""Long-lived TPU experiment runner (dev tool).

The sandbox TPU stack has multi-minute first-compile warmup per process, so
interactive experimentation must stay inside ONE process.  This server
executes numbered snippet files from a queue directory in a single shared
namespace:

    python benchmarks/tpu_server.py /tmp/tpuq &
    # then repeatedly: write /tmp/tpuq/001.py, 002.py, ...; each runs once,
    # stdout/stderr appended to /tmp/tpuq/log.txt, "DONE <name>" marker per
    # snippet ("FAIL <name>" + traceback on error).  State (imports, jitted
    # fns, arrays) persists across snippets.

Delete the queue dir or send SIGTERM to stop.
"""

from __future__ import annotations

import os
import sys
import time
import traceback


def main(qdir: str) -> None:
    os.makedirs(qdir, exist_ok=True)
    log_path = os.path.join(qdir, "log.txt")
    ns: dict = {"__name__": "__tpu__"}
    done = set()
    log = open(log_path, "a", buffering=1)
    sys.stdout = log
    sys.stderr = log
    print(f"=== tpu_server start pid={os.getpid()} ===")
    while True:
        if not os.path.isdir(qdir):
            break
        names = sorted(n for n in os.listdir(qdir)
                       if n.endswith(".py") and n not in done)
        if not names:
            time.sleep(0.5)
            continue
        for name in names:
            done.add(name)
            path = os.path.join(qdir, name)
            print(f"--- RUN {name} ---")
            t0 = time.perf_counter()
            try:
                with open(path) as f:
                    src = f.read()
                exec(compile(src, path, "exec"), ns)
                print(f"DONE {name} ({time.perf_counter() - t0:.1f} s)")
            except Exception:
                traceback.print_exc()
                print(f"FAIL {name} ({time.perf_counter() - t0:.1f} s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq")
