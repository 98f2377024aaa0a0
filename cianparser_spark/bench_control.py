"""Platform scaling control for the crawl bench.

The scaling-efficiency criterion compares one job at two parallelism
levels on ONE shared VM.  This control measures what the PLATFORM
itself delivers for embarrassingly parallel work with zero memory
traffic, zero I/O and zero Spark: N independent processes, each
spinning a register-only integer recurrence, pinned to the same CPU
set the crawl level uses.  No workload can scale better than this
ceiling on this box — hypervisor co-tenancy throttles mid-count
parallelism here even with measured steal ≈ 0 and no cgroup quota
(cpu.cfs_quota_us = -1), so an engine efficiency equal to the control
efficiency means the ENGINE adds no scaling loss; the gap to 1.0 is
the platform's.

Run standalone:  python -m cianparser_spark.bench_control
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

_N_OPS = 20_000_000


def _spin(_arg) -> int:
    x = 1
    for _ in range(_N_OPS):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def measure(nproc: int, pin: bool = True) -> float:
    """Aggregate Mops/s of ``nproc`` independent spinners."""
    old = None
    if pin:
        try:
            old = os.sched_getaffinity(0)
            os.sched_setaffinity(0, set(range(nproc)))
        except (AttributeError, OSError):
            old = None
    try:
        with mp.get_context("fork").Pool(nproc) as pool:
            t0 = time.time()
            pool.map(_spin, range(nproc))
            dt = time.time() - t0
        return nproc * _N_OPS / dt / 1e6
    finally:
        if old is not None:
            os.sched_setaffinity(0, old)


def control(n: int = 2, n4: int = 8, reps: int = 3, pin: bool = True) -> dict:
    """Interleaved best-of control at the two crawl levels."""
    lo: list[float] = []
    hi: list[float] = []
    for _ in range(reps):
        lo.append(measure(n, pin))
        hi.append(measure(n4, pin))
    best_lo, best_hi = max(lo), max(hi)
    return {
        "workload": f"register-only integer recurrence x {_N_OPS} ops/proc",
        "mops_n": round(best_lo, 1),
        "mops_4n": round(best_hi, 1),
        "platform_efficiency": round(best_hi / (best_lo * n4 / n), 3),
        "reps_mops": {str(n): [round(v, 1) for v in lo],
                      str(n4): [round(v, 1) for v in hi]},
    }


_MEM_MB = 128  # per-process copy buffer
_MEM_DUR = 6.0  # seconds of timed copying per level


def _memspin(cpu: int, dur: float, barrier, q) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except (AttributeError, OSError):
        pass
    buf = bytearray(os.urandom(_MEM_MB << 20))
    mv = memoryview(buf)
    dst = bytearray(_MEM_MB << 20)
    barrier.wait()
    t0 = time.time()
    reps = 0
    while time.time() - t0 < dur:
        dst[:] = mv  # _MEM_MB read + _MEM_MB write
        reps += 1
    q.put((cpu, reps * 2 * _MEM_MB / (time.time() - t0)))


def mem_control(n_cpus: tuple = (0, 1), n4_cpus: tuple = (8, 9, 10, 11, 12, 13, 14, 15)) -> dict:
    """DRAM-delivery pair under the SAME methodology as the engine
    pairs: N and 4N pure-memcpy processes on the same disjoint pinned
    CPU sets, started at the same instant (barrier), so both sample
    the identical platform state.  A data engine's wave moves bytes
    (mmap page serve, Arrow transfer, spool write); the memory
    subsystem's per-core delivery DROPS as more cores drive it, so
    this — not the register-only ALU spin — is the relevant scaling
    ceiling on a single box.  On a real cluster 4N executors bring 4N
    memory controllers and this artifact vanishes (BENCH/BASELINE.md,
    scale section)."""
    ctx = mp.get_context("fork")
    all_cpus = list(n_cpus) + list(n4_cpus)
    barrier = ctx.Barrier(len(all_cpus))
    q = ctx.Queue()
    procs = [ctx.Process(target=_memspin, args=(c, _MEM_DUR, barrier, q))
             for c in all_cpus]
    for p in procs:
        p.start()
    rates = dict(q.get() for _ in all_cpus)
    for p in procs:
        p.join()
    lo = sum(rates[c] for c in n_cpus)
    hi = sum(rates[c] for c in n4_cpus)
    ratio = len(n4_cpus) / len(n_cpus)
    return {
        "workload": f"concurrent {_MEM_MB} MB memcpy loops, barrier start, per-core pinned",
        "mb_per_s_n": round(lo, 0),
        "mb_per_s_4n": round(hi, 0),
        "mem_scaling_efficiency": round(hi / (lo * ratio), 3),
    }


def _mem_level(cpus: list, dur: float) -> float:
    """Aggregate MB/s of one barrier-started memcpy level."""
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(len(cpus))
    q = ctx.Queue()
    procs = [ctx.Process(target=_memspin, args=(c, dur, barrier, q))
             for c in cpus]
    for p in procs:
        p.start()
    rates = dict(q.get() for _ in cpus)
    for p in procs:
        p.join()
    return sum(rates.values())


def seq_mem_control(n: int = 8, n4: int = 32, reps: int = 2,
                    dur: float = _MEM_DUR) -> dict:
    """8→32 DRAM-delivery control under the SAME methodology as the
    engine's 8→32 secondary: both levels run SEQUENTIALLY (a 32-core
    level cannot be paired disjoint-concurrently on a 32-core box),
    interleaved n/n4/n/n4 with best-of per level so both sample the
    box's best window.  This is the like-for-like ceiling for the
    sequential 8→32 engine number: per-core DRAM delivery drops as
    more cores drive one memory controller, and the N-core level runs
    with 3N cores idle (boosted per-core delivery) — both effects
    vanish on a real cluster where 4N executors bring 4N memory
    controllers."""
    lo: list[float] = []
    hi: list[float] = []
    for _ in range(reps):
        lo.append(_mem_level(list(range(n)), dur))
        hi.append(_mem_level(list(range(n4)), dur))
    best_lo, best_hi = max(lo), max(hi)
    return {
        "workload": (f"sequential interleaved {_MEM_MB} MB memcpy levels, "
                     f"{n} vs {n4} pinned cores, best-of-{reps}"),
        "mb_per_s_n": round(best_lo, 0),
        "mb_per_s_4n": round(best_hi, 0),
        "mem_scaling_efficiency": round(best_hi / (best_lo * n4 / n), 3),
        "reps_mb_per_s": {str(n): [round(v) for v in lo],
                          str(n4): [round(v) for v in hi]},
    }


if __name__ == "__main__":
    print(json.dumps({"alu": control(), "mem": mem_control(),
                      "seq_mem_8_32": seq_mem_control()}))
