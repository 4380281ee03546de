"""CLI entrypoints — the `ray job submit` surface (north rule).

  python -m probe_ray build  --input DIR [DIR...] --out INDEX_DIR
                             [--waves N] [--subshards N] [--max-content-bytes N]
  python -m probe_ray search --index INDEX_DIR "QUERY" [...]
                             [-k N] [--filter field=value ...] [--json]

Both own their Ray session: `ray.init(address="local")` is guarded so the
same commands work under `ray job submit` (Ray already initialised in the
job driver) and standalone.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    """Returns (ray, owns_session): shutdown only a session we started —
    under `ray job submit` (or tests) Ray is already initialised."""
    import ray

    if ray.is_initialized():
        return ray, False
    ray.init(address="local", include_dashboard=False)
    return ray, True


def cmd_build(args) -> int:
    ray, owns = _ray_init()
    from probe_ray.index.build import IndexConfig, build_index

    cfg = IndexConfig(
        num_waves=args.waves,
        subshards=args.subshards,
        max_content_bytes=args.max_content_bytes,
    )
    manifest = build_index(args.input, args.out, cfg)
    print(
        json.dumps(
            {
                "out": args.out,
                "n_docs": manifest["n_docs"],
                "n_tokens": manifest["n_tokens"],
                "avgdl": round(manifest["avgdl"], 3),
                "num_waves": manifest["num_waves"],
                "build_seconds": round(manifest["build_seconds"], 3),
            }
        )
    )
    if owns:
        ray.shutdown()
    return 0


def cmd_search(args) -> int:
    ray, owns = _ray_init()
    from probe_ray.search.searcher import IndexReader

    filters = {}
    for f in args.filter or []:
        if "=" not in f:
            print(f"error: --filter expects field=value, got {f!r}", file=sys.stderr)
            return 2
        fld, val = f.split("=", 1)
        if fld not in ("repo", "path", "lang"):
            print(f"error: filter field must be repo|path|lang, got {fld!r}", file=sys.stderr)
            return 2
        filters[fld] = val

    rd = IndexReader(args.index)
    # multiple query args are ANDed into one query, mirroring the
    # reference CLI (search_runner.rs:358-364)
    joined = " AND ".join(args.query)
    queries = {"q0": joined}
    results = rd.search_many(
        queries, k=args.k, filters={n: filters for n in queries},
        max_total_tokens=args.max_tokens,
    )
    t = results["q0"]
    if args.out:
        import os

        import pyarrow.parquet as pq

        os.makedirs(args.out, exist_ok=True)
        pq.write_table(t, os.path.join(args.out, "results.parquet"))
    if args.json:
        print(json.dumps({"query": joined, "results": t.to_pylist()}))
    else:
        print(f"# {joined}")
        for row in t.to_pylist():
            print(
                f"{row['rank']:3d}  {row['score']:.4f}  "
                f"{row['repo']}/{row['path']}"
            )
    rd.close()
    if owns:
        ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="probe_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an inverted index")
    b.add_argument("--input", nargs="+", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--waves", type=int, default=2)
    b.add_argument("--subshards", type=int, default=4)
    b.add_argument("--max-content-bytes", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="top-k BM25 boolean search")
    s.add_argument("--index", required=True)
    s.add_argument("query", nargs="+")
    s.add_argument("-k", type=int, default=10)
    s.add_argument(
        "--max-tokens", type=int, default=None,
        help="truncate results once their cumulative token count exceeds this",
    )
    s.add_argument("--filter", action="append", metavar="FIELD=VALUE")
    s.add_argument("--json", action="store_true")
    s.add_argument("--out", help="also write results as parquet (one file per query)")
    s.set_defaults(fn=cmd_search)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
