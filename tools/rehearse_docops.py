"""Large-corpus rehearsal runner for the document ops.

Times named `queries()` entries against a big documents-only table and
prints one JSON line per op: {"op", "sec", "rows", "docs_per_sec",
"peak_mem_gb"}. Peak memory is system-wide (MemTotal - MemAvailable)
sampled at 0.25 s during the op — it covers the driver, every Ray
worker, and the object store, which is what "did this fit" means.

Generate the corpus first (or on the fly with --gen-rows): the
deterministic documents-shaped synth corpus (probe_ray.data.synth
.make_documents — stopword lang signal, quality spread, exact dups
every 97 docs, planted benchmark 8-gram) written as
``<dir>/documents.parquet/part-*.parquet`` so the ops' directory read
parallelizes.

Usage:
    python tools/rehearse_docops.py --dir /tmp/docs10m --gen-rows 10000000 \
        [--cpus 32] [--nfiles 64] op [op ...]

Owns its Ray session (standalone tool, not imported by the driver).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem_used_gb() -> float:
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1])
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1])
    return (total - avail) / 1024 / 1024


class _MemSampler:
    def __init__(self):
        self.peak = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _mem_used_gb())
            self._stop.wait(0.25)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join()


def gen_corpus(d: str, rows: int, nfiles: int) -> None:
    import ray

    docs_dir = os.path.join(d, "documents.parquet")
    marker = os.path.join(d, f"_done_{rows}")
    if os.path.exists(marker):
        return
    import shutil

    shutil.rmtree(docs_dir, ignore_errors=True)
    os.makedirs(docs_dir, exist_ok=True)

    import pyarrow.parquet as pq

    from probe_ray.data.synth import make_documents

    @ray.remote
    def gen(part: int, start: int, count: int) -> None:
        pq.write_table(
            make_documents(start, count),
            os.path.join(docs_dir, f"part-{part:05d}.parquet"),
            row_group_size=16384,
        )

    per = (rows + nfiles - 1) // nfiles
    futs, start = [], 0
    for f in range(nfiles):
        count = min(per, rows - start)
        if count <= 0:
            break
        futs.append(gen.remote(f, start, count))
        start += count
    ray.get(futs)
    open(marker, "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/docs2m")
    ap.add_argument("--gen-rows", type=int, default=0)
    ap.add_argument("--nfiles", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("ops", nargs="+")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    if args.gen_rows:
        t0 = time.time()
        gen_corpus(args.dir, args.gen_rows, args.nfiles)
        print(
            json.dumps(
                {"op": "_gen", "sec": round(time.time() - t0, 1),
                 "rows": args.gen_rows}
            ),
            flush=True,
        )
    import pyarrow as pa

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in args.ops:
        t0 = time.time()
        with _MemSampler() as mem:
            res = qs[name](args.dir)
            if isinstance(res, pa.Table):
                n = res.num_rows
            else:  # ray Dataset: consume it (count drives execution)
                n = res.count()
        sec = time.time() - t0
        out = {"op": name, "sec": round(sec, 1), "rows": n,
               "peak_mem_gb": round(mem.peak, 1)}
        if args.gen_rows:
            out["docs_per_sec"] = round(args.gen_rows / sec)
        print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
