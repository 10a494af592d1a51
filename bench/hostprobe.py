"""Host parallel-headroom probe: can THIS host, RIGHT NOW, scale a
trivially parallel kernel from N to 4N processes?

Why this exists: the r4 paired-scaling campaign gates legs on the
hypervisor steal counter and on in-host foreign CPU, yet still recorded
"valid" pairs whose 16-core leg burned 1.5-2x the CPU per event of the
4-core leg (41-53k events/proc-cpu-s vs a clean-leg historical median of
72-83k).  Neither gate can see hypervisor-level co-tenancy that degrades
only *high-parallelism* guests (shared memory-bandwidth / LLC / power
budget on the physical socket): steal stays ~0 because vCPUs are not
descheduled — they run, but stalled, and stall cycles are charged to the
guest as busy CPU.

The probe measures the host directly with two embarrassingly parallel
kernels that have ZERO cross-process communication — any sub-linear
scaling they show is the host's, not a workload's:

- cpu kernel: sha256 over a 64 KiB private buffer (cache-resident,
  compute-bound) -> catches frequency capping / scheduler asymmetry;
- mem kernel: numpy sum over a 256 MiB private array (streaming,
  bandwidth-bound) -> catches socket memory-bandwidth contention, the
  failure mode a shuffle-heavy Spark job actually hits.

``headroom = (aggregate_rate at 4N procs / aggregate_rate at N procs) / 4``
is 1.0 on an unloaded dedicated box.  If sha256 or a streaming sum cannot
scale at >= 0.9, no engine measurement in that window can evidence a 0.8
scaling gate — the window is unusable, and logging the probe IS the
"measured host-phase ledger proving no such window existed" that the r3
verdict accepts as the alternative outcome.

Workers self-time (``dur`` seconds of work each, measured after buffer
allocation), so process-spawn skew does not contaminate the rate; every
worker has a bounded loop, so a killed parent cannot leak spinners.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import time


def _cpu_worker(dur: float, q, ready, go) -> None:
    import hashlib
    buf = b"\xab" * 65536
    ready.put(1)
    go.wait(timeout=120)  # start barrier: all windows overlap fully
    end = time.monotonic() + dur
    n = 0
    while time.monotonic() < end:
        for _ in range(16):
            hashlib.sha256(buf).digest()
        n += 16
    q.put(n * len(buf))


def _mem_worker(dur: float, q, ready, go) -> None:
    import numpy as np
    a = np.ones(32_000_000, dtype=np.float64)  # 256 MiB private stream
    ready.put(1)
    go.wait(timeout=120)  # start barrier: all windows overlap fully
    end = time.monotonic() + dur
    n = 0
    s = 0.0
    while time.monotonic() < end:
        s += float(a.sum())
        n += 1
    q.put(n * a.nbytes + (0 if s >= 0 else 1))


def _aggregate_rate(worker, nproc: int, dur: float) -> float:
    """Aggregate bytes/s processed by ``nproc`` self-timed workers.

    ADVICE r4 hardening: spawn-context startup skews ~0.5-1 s per worker
    (numpy import, 256 MiB allocation), so without a start barrier parts
    of each self-timed window ran under PARTIAL concurrency, inflating the
    big-N aggregate and making the gate permissive. Workers now signal
    ready after allocation and block on a shared event; timing starts only
    once every worker is released, so the measured windows fully overlap.
    A crashed worker returns a FAILING sample (0.0 — under every floor)
    instead of raising queue.Empty and aborting the whole campaign."""
    ctx = mp.get_context("spawn")  # fresh interpreters: no COW page sharing
    q = ctx.Queue()
    ready = ctx.Queue()
    go = ctx.Event()
    ps = [ctx.Process(target=worker, args=(dur, q, ready, go), daemon=True)
          for _ in range(nproc)]
    for p in ps:
        p.start()
    ok = True
    try:
        for _ in ps:
            ready.get(timeout=120)
    except queue_mod.Empty:
        ok = False  # a worker died before the barrier (e.g. OOM on alloc)
    go.set()  # release everyone that made it
    total = 0
    for _ in ps:
        try:
            total += q.get(timeout=dur + 60)
        except queue_mod.Empty:
            ok = False
    for p in ps:
        p.join(timeout=30)
        if p.is_alive():
            p.kill()
    return (total / dur) if ok else 0.0


def probe(n_small: int, n_big: int, dur: float = 1.2) -> dict:
    """Measure cpu/mem parallel headroom n_small -> n_big. ~10 s total."""
    out: dict = {"n_small": n_small, "n_big": n_big, "ts": time.time()}
    for name, worker in (("cpu", _cpu_worker), ("mem", _mem_worker)):
        r_small = _aggregate_rate(worker, n_small, dur)
        r_big = _aggregate_rate(worker, n_big, dur)
        out[f"{name}_rate_small"] = round(r_small / 1e9, 3)   # GB/s
        out[f"{name}_rate_big"] = round(r_big / 1e9, 3)
        out[f"{name}_headroom"] = round(
            (r_big / max(r_small, 1e-9)) / (n_big / n_small), 4)
    return out


if __name__ == "__main__":
    import json
    import sys
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(json.dumps(probe(ns, nb)))
