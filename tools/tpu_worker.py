"""Long-lived TPU job worker: pay the axon claim once, run many jobs.

The axon relay's chip claim takes minutes and is paid per PROCESS; a
measurement campaign of N short scripts pays it N times (and two live
processes deadlock the grant — observed in-session).  This worker claims
the chip once and then executes queued job files sequentially in one
interpreter, sharing the in-memory compile cache across jobs.

Protocol (filesystem, no sockets):
    queue/<name>.py    — job: arbitrary Python, exec'd in this process
    running/<name>.py  — job being executed (moved atomically)
    done/<name>.py     — finished job source
    done/<name>.out    — its captured stdout + stderr + traceback
    STOP               — touch to shut the worker down after current job

Jobs run in submission (mtime, name) order.  A job crash is captured to
its .out and the worker continues.  State that jobs want to share (e.g.
compiled steps) can be stashed in the SHARED dict.

Usage:
    python tools/tpu_worker.py /tmp/tpu_jobs &
    cp myjob.py /tmp/tpu_jobs/queue/
    cat /tmp/tpu_jobs/done/myjob.out
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHARED: dict = {}


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
    qdir = os.path.join(root, "queue")
    rdir = os.path.join(root, "running")
    ddir = os.path.join(root, "done")
    for d in (qdir, rdir, ddir):
        os.makedirs(d, exist_ok=True)
    stop = os.path.join(root, "STOP")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "TIP_JAX_CACHE_DIR", os.path.expanduser("~/.cache/trigenic_tpu_jax")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t0 = time.perf_counter()
    import jax.numpy as jnp

    # Claim the chip up front so the wait is visible and paid exactly once.
    _ = float(jnp.sum(jnp.ones((128, 128))))
    dev = jax.devices()[0]
    print(
        f"[worker] ready on {dev.device_kind} ({dev.platform}) "
        f"after {time.perf_counter() - t0:.1f}s claim+warmup",
        flush=True,
    )

    while not os.path.exists(stop):
        jobs = sorted(
            (f for f in os.listdir(qdir) if f.endswith(".py")),
            key=lambda f: (os.path.getmtime(os.path.join(qdir, f)), f),
        )
        if not jobs:
            time.sleep(2.0)
            continue
        name = jobs[0]
        src = os.path.join(rdir, name)
        os.replace(os.path.join(qdir, name), src)
        out_path = os.path.join(ddir, name[:-3] + ".out")
        print(f"[worker] running {name}", flush=True)
        # Purge repo modules so each job sees the CURRENT source tree (the
        # whole point of the worker is outliving many edit cycles); JAX and
        # its in-memory compile caches are untouched.
        for mod in [m for m in sys.modules if m.startswith("trigenicinteractionpredictor_tpu")]:
            del sys.modules[mod]
        # Stream output straight to the .out file (line-buffered) so a
        # wedged relay call doesn't take the partial results with it.
        t0 = time.perf_counter()
        with open(out_path, "w", buffering=1) as out:
            try:
                with open(src) as f:
                    code = compile(f.read(), src, "exec")
                with contextlib.redirect_stdout(out), contextlib.redirect_stderr(out):
                    exec(code, {"__name__": "__tpu_job__", "SHARED": SHARED})
                status = "ok"
            except BaseException:
                tb = traceback.format_exc()
                out.write("\n" + tb)
                status = "error"
                # A kernel fault kills the relay-side TPU worker process and
                # this client's device session with it — every later call
                # fails UNAVAILABLE.  Exit so the operator restarts us with
                # a fresh claim instead of burning the rest of the queue.
                if "TPU worker process crashed" in tb:
                    status = "device-lost"
            dt = time.perf_counter() - t0
            out.write(f"\n[worker] status={status} wall={dt:.1f}s\n")
        os.replace(src, os.path.join(ddir, name))
        print(f"[worker] {name}: {status} in {dt:.1f}s", flush=True)
        if status == "device-lost":
            print("[worker] device session lost — exiting for restart", flush=True)
            return
    print("[worker] STOP seen; exiting", flush=True)


if __name__ == "__main__":
    main()
