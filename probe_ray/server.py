"""MCP-analog stdio server — the engine's answer to the reference's MCP
surface (mcp/src/index.ts:153-330: tools search_code / query_code /
extract_code over a stdio transport).

Protocol: newline-delimited JSON-RPC 2.0, the MCP stdio framing.
Implemented methods: ``initialize``, ``notifications/initialized``
(no-op), ``ping``, ``tools/list``, ``tools/call``. No external SDK —
the MCP protocol subset used by the reference's three tools is small
enough to speak directly.

Data-model difference vs the reference (by design, not omission): the
reference's tools take ``path`` = a source-code DIRECTORY and shell out
to the probe binary which walks + scans it per call. Here ``path`` is a
corpus location — a directory of Parquet files (or one file) with the
(repo, path, commit, lang, content) schema — and the server builds the
inverted index for it ONCE (cached under ``cache_dir``, keyed by the
corpus path), then answers every subsequent call from the warm
``IndexReader`` actor pool. That is the reference's session-cache idea
(session_cache.rs) promoted to the index itself: first call pays the
build, later calls are index-path milliseconds. A pre-built index can
be supplied per call via the ``index`` argument to skip the build.

Usage:  python -m probe_ray serve [--cache-dir DIR]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile

SERVER_NAME = "probe-ray-mcp"
SERVER_VERSION = "0.3.0"
PROTOCOL_VERSION = "2024-11-05"

# JSON-RPC error codes (MCP reuses these; mcp/src/index.ts McpError)
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603

_CORPUS_SCHEMA_COLS = ("repo", "path", "lang", "content")

TOOLS = [
    {
        # mirrors mcp/src/index.ts:179-228 (search_code), minus the
        # filesystem-walk options (gitignore/ignore) that have no
        # analog over a Parquet corpus table
        "name": "search_code",
        "description": (
            "Search code in the corpus using an Elastic-style query "
            "(AND/OR/NOT, quotes for exact phrases, grouping with "
            "parentheses) ranked by BM25."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "path": {
                    "type": "string",
                    "description": (
                        "Corpus location: a directory of Parquet files "
                        "(or one file) with columns repo, path, commit, "
                        "lang, content."
                    ),
                },
                "query": {
                    "description": (
                        "Elastic-style query string, or a list of "
                        "queries ANDed together."
                    ),
                },
                "index": {
                    "type": "string",
                    "description": (
                        "Optional pre-built index directory; skips the "
                        "cached on-demand build."
                    ),
                },
                "filesOnly": {"type": "boolean"},
                "exact": {"type": "boolean"},
                "excludeFilenames": {"type": "boolean"},
                "allowTests": {"type": "boolean"},
                "maxResults": {"type": "number"},
                "maxTokens": {"type": "number"},
                "filters": {
                    "type": "object",
                    "description": "Field filters: repo / path / lang.",
                },
                "format": {
                    "type": "string",
                    "enum": ["markdown", "plain", "json", "xml"],
                    "default": "markdown",
                },
                "session": {
                    "type": "string",
                    "description": (
                        'Index reuse policy: "fresh" discards the '
                        "cached index for this corpus and rebuilds; "
                        "anything else reuses it."
                    ),
                    "default": "reuse",
                },
            },
            "required": ["path", "query"],
        },
    },
    {
        # mirrors mcp/src/index.ts:231-272 (query_code)
        "name": "query_code",
        "description": (
            "Structural pattern search (ast-grep style: $NAME, $$$) "
            "over the corpus."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "path": {"type": "string"},
                "pattern": {"type": "string"},
                "language": {"type": "string"},
                "allowTests": {"type": "boolean"},
                "maxResults": {"type": "number"},
                "format": {
                    "type": "string",
                    "enum": ["markdown", "plain", "json"],
                    "default": "json",
                },
            },
            "required": ["path", "pattern"],
        },
    },
    {
        # mirrors mcp/src/index.ts:275-316 (extract_code)
        "name": "extract_code",
        "description": (
            "Extract code blocks by file path, line (file:10 / "
            "file:10-20) or symbol (file#name) from the corpus."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "path": {"type": "string"},
                "files": {"type": "array", "items": {"type": "string"}},
                "allowTests": {"type": "boolean"},
                "contextLines": {"type": "number", "default": 0},
                "format": {
                    "type": "string",
                    "enum": ["markdown", "plain", "json"],
                    "default": "markdown",
                },
            },
            "required": ["path", "files"],
        },
    },
]


def _err(req_id, code: int, message: str) -> dict:
    return {
        "jsonrpc": "2.0",
        "id": req_id,
        "error": {"code": code, "message": message},
    }


def _ok(req_id, result: dict) -> dict:
    return {"jsonrpc": "2.0", "id": req_id, "result": result}


def _text_result(text: str, is_error: bool = False) -> dict:
    out = {"content": [{"type": "text", "text": text}]}
    if is_error:
        out["isError"] = True
    return out


class McpServer:
    """Transport-independent request handler; ``handle`` maps one
    JSON-RPC request dict to a response dict (or None for
    notifications). Ray and the heavy imports are touched only on the
    first ``tools/call`` so initialize / tools-list stay instant."""

    def __init__(self, cache_dir: str | None = None):
        self.cache_dir = cache_dir or os.path.join(
            tempfile.gettempdir(), "probe_ray_mcp"
        )
        self._readers: dict[str, object] = {}  # index_dir -> IndexReader
        self._built: dict[str, str] = {}  # corpus path -> index_dir
        self.initialized = False

    # ------------------------------------------------------------- rpc

    def handle(self, req: dict) -> dict | None:
        req_id = req.get("id")
        method = req.get("method")
        if req.get("jsonrpc") != "2.0" or not isinstance(method, str):
            return _err(req_id, INVALID_REQUEST, "not a JSON-RPC 2.0 request")
        if method == "initialize":
            self.initialized = True
            return _ok(
                req_id,
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": {
                        "name": SERVER_NAME,
                        "version": SERVER_VERSION,
                    },
                },
            )
        if method.startswith("notifications/"):
            return None
        if method == "ping":
            return _ok(req_id, {})
        if method == "tools/list":
            return _ok(req_id, {"tools": TOOLS})
        if method == "tools/call":
            params = req.get("params") or {}
            name = params.get("name")
            args = params.get("arguments") or {}
            try:
                if name == "search_code":
                    return _ok(req_id, self._search_code(args))
                if name == "query_code":
                    return _ok(req_id, self._query_code(args))
                if name == "extract_code":
                    return _ok(req_id, self._extract_code(args))
            except (KeyError, ValueError, TypeError) as e:
                return _err(req_id, INVALID_PARAMS, f"{type(e).__name__}: {e}")
            except Exception as e:  # tool failure -> MCP tool error
                return _ok(
                    req_id, _text_result(f"{type(e).__name__}: {e}", True)
                )
            return _err(req_id, METHOD_NOT_FOUND, f"Unknown tool: {name}")
        return _err(req_id, METHOD_NOT_FOUND, f"Unknown method: {method}")

    # ----------------------------------------------------------- tools

    def _ensure_ray(self):
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                log_to_driver=False,
            )

    def _reader(self, args: dict):
        """IndexReader for the call's corpus: explicit ``index`` dir, or
        the cached (building if absent) index for ``path``."""
        from probe_ray.search.searcher import IndexReader

        index_dir = args.get("index")
        if not index_dir:
            corpus = args["path"]
            fresh = args.get("session") == "fresh"
            index_dir = self._built.get(corpus)
            if index_dir is None or fresh:
                key = hashlib.sha256(
                    os.path.abspath(corpus).encode()
                ).hexdigest()[:16]
                index_dir = os.path.join(self.cache_dir, key)
                if fresh or not os.path.exists(
                    os.path.join(index_dir, "manifest.json")
                ):
                    self._ensure_ray()
                    from probe_ray.index.build import build_index

                    if fresh and os.path.exists(index_dir):
                        import shutil

                        shutil.rmtree(index_dir)
                        self._readers.pop(index_dir, None)
                    build_index(self._corpus_files(corpus), index_dir)
                self._built[corpus] = index_dir
        rd = self._readers.get(index_dir)
        if rd is None:
            self._ensure_ray()
            rd = IndexReader(index_dir)
            self._readers[index_dir] = rd
        return rd

    @staticmethod
    def _corpus_files(corpus: str) -> list[str]:
        import glob

        if os.path.isdir(corpus):
            files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
            if not files:
                raise ValueError(f"no .parquet files under {corpus!r}")
            return files
        if not os.path.exists(corpus):
            raise ValueError(f"corpus path {corpus!r} does not exist")
        return [corpus]

    def _search_code(self, args: dict) -> dict:
        from probe_ray.search.format import (
            apply_limits,
            format_json,
            format_markdown,
            format_plain,
            format_xml,
            rows_from_table,
        )

        corpus = args["path"]
        query = args["query"]
        if isinstance(query, list):
            query = " AND ".join(str(q) for q in query)
        filters = dict(args.get("filters") or {})
        bad = set(filters) - {"repo", "path", "lang"}
        if bad:
            raise ValueError(f"unknown filter fields: {sorted(bad)}")
        k = int(args.get("maxResults") or 10)
        rd = self._reader(args)
        self._ensure_ray()
        t = rd.search_many(
            {"q": query},
            k=k,
            filters={"q": filters},
            max_total_tokens=args.get("maxTokens"),
            exact=bool(args.get("exact")),
            exclude_filenames=bool(args.get("excludeFilenames")),
        )["q"]
        if not args.get("allowTests", True):
            from probe_ray.search.blocks import is_test_file

            keep = [
                i
                for i, p in enumerate(t.column("path").to_pylist())
                if not is_test_file(p)
            ]
            t = t.take(keep)
        if args.get("filesOnly"):
            seen, lines = set(), []
            for r in t.select(["repo", "path"]).to_pylist():
                key = (r["repo"], r["path"])
                if key not in seen:
                    seen.add(key)
                    lines.append(f"{r['repo']}/{r['path']}")
            return _text_result("\n".join(lines))
        from probe_ray.cli import _attach_code

        t = _attach_code(t, corpus)
        rows = rows_from_table(t)
        rows, _, _ = apply_limits(
            rows,
            max_results=k,
            max_tokens=args.get("maxTokens"),
        )
        fmt = args.get("format", "markdown")
        if fmt == "json":
            return _text_result(format_json(rows))
        if fmt == "plain":
            return _text_result(format_plain(rows))
        if fmt == "xml":
            return _text_result(format_xml(rows))
        return _text_result(f"# {query}\n" + format_markdown(rows))

    def _query_code(self, args: dict) -> dict:
        from probe_ray.search.pattern import query_pattern

        self._ensure_ray()
        t = query_pattern(
            self._corpus_files(args["path"]),
            args["pattern"],
            language=args.get("language"),
            allow_tests=args.get("allowTests", True),
            max_results=(
                int(args["maxResults"]) if args.get("maxResults") else None
            ),
        )
        fmt = args.get("format", "json")
        if fmt == "json":
            return _text_result(
                json.dumps(t.to_pylist(), indent=2, sort_keys=True)
            )
        lines = []
        for r in t.to_pylist():
            head = f"{r['repo']}/{r['path']}:{r['line_start']}-{r['line_end']}"
            if fmt == "markdown":
                lines.append(f"## {head}\n```\n{r['matched_text']}\n```")
            else:
                lines.append(f"{head}\n{r['matched_text']}")
        return _text_result("\n\n".join(lines))

    def _extract_code(self, args: dict) -> dict:
        from probe_ray.search.extract import extract

        self._ensure_ray()
        t = extract(
            self._corpus_files(args["path"]),
            list(args["files"]),
            context_lines=int(args.get("contextLines") or 0),
            allow_tests=args.get("allowTests", True),
        )
        fmt = args.get("format", "markdown")
        if fmt == "json":
            return _text_result(
                json.dumps(t.to_pylist(), indent=2, sort_keys=True)
            )
        lines = []
        for r in t.to_pylist():
            head = (
                f"{r['repo']}/{r['path']}:"
                f"{r['start_line']}-{r['end_line']} ({r['node_type']})"
            )
            if fmt == "markdown":
                lines.append(f"## {head}\n```\n{r['code']}\n```")
            else:
                lines.append(f"{head}\n{r['code']}")
        return _text_result("\n\n".join(lines))


def serve_stdio(cache_dir: str | None = None) -> int:
    """Newline-delimited JSON-RPC loop on stdin/stdout until EOF."""
    server = McpServer(cache_dir)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            resp = _err(None, PARSE_ERROR, f"parse error: {e}")
        else:
            resp = server.handle(req)
        if resp is not None:
            sys.stdout.write(json.dumps(resp, separators=(",", ":")) + "\n")
            sys.stdout.flush()
    return 0
