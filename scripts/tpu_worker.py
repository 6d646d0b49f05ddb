"""Persistent TPU job worker.

The axon tunnel's chip claim takes ~5-10 min to release after ANY client
exits, so cycling TPU processes is expensive.  This worker holds the claim
for its whole lifetime and executes job scripts dropped into /tmp/tpu_jobs
(sorted order), all in ONE process.  Jobs share a persistent globals dict, so
expensive state (compiled kernels, warm Run objects) survives between jobs.

  echo 'print(1+1)' > /tmp/tpu_jobs/001_test.py     # enqueue
  # worker renames to .done when finished; stdout -> worker log
  touch /tmp/tpu_jobs/QUIT                          # shut down
"""

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

JOBDIR = "/tmp/tpu_jobs"
os.makedirs(JOBDIR, exist_ok=True)

import jax  # noqa: E402

print(f"[worker] devices: {jax.devices()}", flush=True)
print("[worker] ready", flush=True)

G = {"__name__": "__tpu_job__"}

while True:
    if os.path.exists(os.path.join(JOBDIR, "QUIT")):
        os.remove(os.path.join(JOBDIR, "QUIT"))
        print("[worker] quitting", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOBDIR)
                  if f.endswith(".py") and not f.endswith(".done.py"))
    if not jobs:
        time.sleep(0.5)
        continue
    j = jobs[0]
    path = os.path.join(JOBDIR, j)
    print(f"[worker] === running {j}", flush=True)
    t0 = time.time()
    try:
        with open(path) as f:
            src = f.read()
        exec(compile(src, j, "exec"), G)
    except SystemExit:
        pass
    except Exception:
        traceback.print_exc()
        sys.stdout.flush()
    os.rename(path, path + ".done")
    print(f"[worker] === done {j} ({time.time() - t0:.1f}s)", flush=True)

try:
    import jax.extend.backend
    jax.extend.backend.clear_backends()
except Exception:
    pass
os._exit(0)
