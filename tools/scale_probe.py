"""Scaling-efficiency probe with process-tree CPU accounting.

Answers: where do the extra CPU-seconds at 4 pinned cores vs 1 come
from?  Runs the bench's exact scale build in a fresh affinity-pinned
subprocess per (level, rep) and records, around the timed build only:

- wall seconds
- process-TREE CPU (JVM + live python workers via /proc/<pid>/stat
  utime+stime+cutime+cstime — immune to other processes in the VM)
- system-wide busy + steal jiffies from /proc/stat (the old metric)
- JVM-internal GC CPU and JIT CPU (via java.lang.management beans)

Usage:  python tools/scale_probe.py [--docs 100000] [--reps 2]
        python tools/scale_probe.py --child --cpus N --corpus P --warm W
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sys_stat() -> tuple[float, float]:
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    busy = sum(v) - v[3] - v[4] - (v[7] if len(v) > 7 else 0)
    return busy / 100, (v[7] if len(v) > 7 else 0) / 100


def _tree_cpu(root_pid: int) -> float:
    """utime+stime+cutime+cstime (sec) summed over root + descendants."""
    pids, todo = set(), [root_pid]
    children: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            ppid = int(open(f"/proc/{d}/stat").read().rsplit(")", 1)[1].split()[1])
            children.setdefault(ppid, []).append(int(d))
        except OSError:
            continue
    while todo:
        p = todo.pop()
        if p in pids:
            continue
        pids.add(p)
        todo.extend(children.get(p, []))
    total = 0.0
    for p in pids:
        try:
            f = open(f"/proc/{p}/stat").read().rsplit(")", 1)[1].split()
            # utime stime cutime cstime at fields 11..14 (0-based after comm)
            total += (int(f[11]) + int(f[12]) + int(f[13]) + int(f[14])) / 100
        except OSError:
            continue
    return total


def _jvm_beans(spark) -> tuple[float, float]:
    """(gc_sec, jit_sec) from the driver JVM's management beans."""
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())
    jit = mf.getCompilationMXBean()
    jit_ms = jit.getTotalCompilationTime() if jit is not None else 0
    return gc_ms / 1000, jit_ms / 1000


def child() -> None:
    cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    cpath = sys.argv[sys.argv.index("--corpus") + 1]
    wpath = sys.argv[sys.argv.index("--warm") + 1]
    from sparkgrep.operators.index_build import build_index
    from sparkgrep.session import get_spark

    scratch = os.environ.get("SPARKGREP_LOCAL_DIR", tempfile.gettempdir())
    kw = dict(analyzer="code", use_lang=True, n_buckets=64,
              postings_per_shard=1 << 16, idf_variant="lucene",
              merge_partitions=64)
    s = get_spark(f"probe-{cpus}", master=f"local[{cpus}]", shuffle_partitions=32)
    build_index(s.read.parquet(wpath),
                tempfile.mkdtemp(prefix="probe_warm_", dir=scratch) + "/idx", **kw)
    corpus = s.read.parquet(cpath)
    n = corpus.count()

    me = os.getpid()
    gc0, jit0 = _jvm_beans(s)
    tree0 = _tree_cpu(me)
    (busy0, steal0), t0 = _sys_stat(), time.time()
    build_index(corpus,
                tempfile.mkdtemp(prefix=f"probe_{cpus}_", dir=scratch) + "/idx", **kw)
    wall = time.time() - t0
    busy1, steal1 = _sys_stat()
    tree1 = _tree_cpu(me)
    gc1, jit1 = _jvm_beans(s)
    s.stop()
    print("RESULT " + json.dumps({
        "cpus": cpus, "n_docs": n, "sec": round(wall, 2),
        "tree_cpu_sec": round(tree1 - tree0, 1),
        "sys_busy_sec": round(busy1 - busy0, 1),
        "steal_sec": round(steal1 - steal0, 1),
        "gc_sec": round(gc1 - gc0, 2),
        "jit_sec": round(jit1 - jit0, 2),
    }))


def main() -> None:
    if "--child" in sys.argv:
        child()
        return
    docs = int(sys.argv[sys.argv.index("--docs") + 1]) if "--docs" in sys.argv else 100000
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    scratch = os.environ.setdefault("SPARKGREP_LOCAL_DIR", "/dev/shm/sparkgrep_scratch")
    os.makedirs(scratch, exist_ok=True)
    from sparkgrep.session import get_spark
    from sparkgrep.sources.corpus import synth_code_corpus

    cpath, wpath = f"{scratch}/probe_corpus_{docs}", f"{scratch}/probe_warm"
    prep = get_spark("probe-prep", master="local[32]")
    synth_code_corpus(prep, docs, seed=5).repartition(128).write.mode("overwrite").parquet(cpath)
    synth_code_corpus(prep, 6000, seed=9).repartition(16).write.mode("overwrite").parquet(wpath)
    prep.stop()

    for rep in range(reps):
        for cpus in (1, 4):
            cmd = [sys.executable, os.path.abspath(__file__), "--child",
                   "--cpus", str(cpus), "--corpus", cpath, "--warm", wpath]
            p = subprocess.run(
                cmd, capture_output=True, text=True,
                preexec_fn=lambda c=cpus: os.sched_setaffinity(0, set(range(c))),
                env=os.environ.copy(),
            )
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    print(f"rep{rep} " + line[len("RESULT "):], flush=True)


if __name__ == "__main__":
    main()
