"""Large-corpus rehearsal runner for the document ops.

Times named `queries()` entries against a big documents-only table
(default the deterministic 2M-row Zipf corpus at /tmp/docs2m) and
prints one JSON line per op: {"op": name, "sec": s, "rows": n}.

Usage:
    python tools/rehearse_docops.py [--dir /tmp/docs2m] [--cpus 32] op [op ...]

Owns its Ray session (standalone tool, not imported by the driver).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/docs2m")
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
    import pyarrow as pa

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in args.ops:
        t0 = time.time()
        res = qs[name](args.dir)
        if isinstance(res, pa.Table):
            n = res.num_rows
        else:  # ray Dataset: consume it (count drives execution)
            n = res.count()
        sec = time.time() - t0
        print(
            json.dumps({"op": name, "sec": round(sec, 1), "rows": n}),
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
