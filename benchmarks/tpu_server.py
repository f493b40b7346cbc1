"""Persistent TPU experiment server.

Executes python job files dropped into /tmp/tpu_jobs/ (sorted order) in a
shared namespace that persists across jobs (so expensive state — the sync
switch, compiled functions, built worlds — is paid once).  Each job file
<name>.py runs with globals() shared; stdout/stderr (and traceback on
failure) are written to <name>.out, then an empty <name>.done marker.

Usage: python exp/tpu_server.py   (keep running in the background)
"""

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

NS: dict = {"__name__": "__tpu__"}

# run the setup (sync switch etc.) as job 0
with open(os.path.join(os.path.dirname(__file__), "setup_tpu.py")) as f:
    setup_src = f.read()


def run(src: str, out_path: str):
    buf = io.StringIO()
    real_out, real_err = sys.stdout, sys.stderr

    class Tee(io.TextIOBase):
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)
                st.flush()
            return len(s)

    sys.stdout = Tee(buf, real_out)
    sys.stderr = Tee(buf, real_err)
    try:
        exec(compile(src, out_path, "exec"), NS)
        ok = True
    except BaseException:
        traceback.print_exc()
        ok = False
    finally:
        sys.stdout, sys.stderr = real_out, real_err
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
        f.write("\n== OK ==\n" if ok else "\n== FAILED ==\n")


print("tpu_server: running setup...", flush=True)
run(setup_src, os.path.join(JOBS, "_setup.out"))
open(os.path.join(JOBS, "_setup.done"), "w").close()
print("tpu_server: ready, polling", JOBS, flush=True)

seen = set()
while True:
    names = sorted(
        n for n in os.listdir(JOBS)
        if n.endswith(".py") and n not in seen
    )
    for n in names:
        seen.add(n)
        path = os.path.join(JOBS, n)
        print(f"tpu_server: running {n}", flush=True)
        t0 = time.monotonic()
        run(open(path).read(), path[:-3] + ".out")
        open(path[:-3] + ".done", "w").close()
        print(f"tpu_server: {n} done in {time.monotonic()-t0:.1f}s", flush=True)
    time.sleep(0.5)
