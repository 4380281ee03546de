"""`probe query` analog: structural pattern search (pattern-query lite).

Reference: src/query.rs (ast-grep over tree-sitter ASTs; AstMatch rows
with file/line/column spans). ast-grep needs tree-sitter grammars that
are not available in this environment, so this is a documented
TEXT-LEVEL APPROXIMATION of the pattern language:

  $NAME   — a metavariable binding one identifier
            ([A-Za-z_][A-Za-z0-9_]*); a repeated metavariable must
            bind the same text (backreference), like ast-grep
  $$$     — zero or more of anything, non-greedy (ast-grep's multi
            metavariable)
  literal — matched exactly, with whitespace runs relaxed to \\s*
            (AST matching is whitespace-insensitive)

It matches raw text, so it can match inside strings/comments where a
real AST matcher would not — an explicit, documented divergence.

Output mirrors AstMatch (query.rs:13-20): one row per match with
(repo, path, line_start, line_end, column_start, column_end,
matched_text, captures as a JSON object of metavar bindings).
Columns are 1-based, like editors and the reference's printed output.

Distributed composition: one map_batches scan over the corpus (language
pruning by extension happens in the reader filter when ``language`` is
given), per-batch regex matching with a pattern compiled once per task.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from probe_ray.search.blocks import is_test_file

# query.rs:55-72 language -> extensions table
LANG_EXTENSIONS: dict[str, list[str]] = {
    "rust": ["rs"],
    "javascript": ["js", "jsx", "mjs"],
    "typescript": ["ts", "tsx"],
    "python": ["py"],
    "go": ["go"],
    "c": ["c", "h"],
    "cpp": ["cpp", "hpp", "cc", "hh", "cxx", "hxx"],
    "java": ["java"],
    "ruby": ["rb"],
    "php": ["php"],
    "swift": ["swift"],
    "csharp": ["cs"],
}

_META = re.compile(r"\$\$\$|\$[A-Z_][A-Z0-9_]*")
_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def compile_pattern(pattern: str) -> re.Pattern:
    """Translate an ast-grep-style pattern into a regex."""
    out: list[str] = []
    seen: set[str] = set()
    pos = 0
    for m in _META.finditer(pattern):
        out.append(_literal(pattern[pos : m.start()]))
        tok = m.group(0)
        if tok == "$$$":
            out.append(r"[\s\S]*?")
        else:
            name = tok[1:]
            if name in seen:
                out.append(f"(?P={name})")  # same metavar -> same text
            else:
                seen.add(name)
                out.append(f"(?P<{name}>{_IDENT})")
        pos = m.end()
    out.append(_literal(pattern[pos:]))
    return re.compile("".join(out))


def _literal(text: str) -> str:
    # whitespace-insensitive literals: any whitespace run in the pattern
    # matches any (possibly empty) whitespace run in the source
    parts = re.split(r"\s+", text)
    return r"\s*".join(re.escape(p) for p in parts)


def match_content(
    pattern: re.Pattern, content: str
) -> list[tuple[int, int, int, int, str, dict[str, str]]]:
    """(line_start, line_end, col_start, col_end, text, captures) per
    match; lines and columns 1-based."""
    # line-start offsets for offset -> (line, col)
    starts = [0]
    for i, ch in enumerate(content):
        if ch == "\n":
            starts.append(i + 1)

    import bisect

    def linecol(off: int) -> tuple[int, int]:
        li = bisect.bisect_right(starts, off) - 1
        return li + 1, off - starts[li] + 1

    out = []
    for m in pattern.finditer(content):
        if m.start() == m.end():
            continue
        ls, cs = linecol(m.start())
        le, ce = linecol(max(m.start(), m.end() - 1))
        out.append((ls, le, cs, ce, m.group(0), m.groupdict()))
    return out


_SCHEMA = {
    "repo": pa.string(),
    "path": pa.string(),
    "line_start": pa.int64(),
    "line_end": pa.int64(),
    "column_start": pa.int64(),
    "column_end": pa.int64(),
    "matched_text": pa.string(),
    "captures": pa.string(),
}


def query_pattern(
    corpus_files: list[str] | str,
    pattern: str,
    language: str | None = None,
    allow_tests: bool = True,
    max_results: int | None = None,
) -> pa.Table:
    """Distributed pattern scan over the corpus table."""
    import pyarrow.dataset as pads
    import ray.data

    exts = LANG_EXTENSIONS.get(language.lower()) if language else None
    if language and not exts:
        raise ValueError(f"unsupported language {language!r}")

    def fn(batch: pa.Table) -> pa.Table:
        compiled = compile_pattern(pattern)
        out = {k: [] for k in _SCHEMA}
        for repo, path, content in zip(
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("content").to_pylist(),
        ):
            if not allow_tests and is_test_file(path):
                continue
            if exts is not None:
                base = path.rsplit("/", 1)[-1]
                ext = base.rsplit(".", 1)[-1] if "." in base else ""
                if ext not in exts:
                    continue
            for ls, le, cs, ce, text, caps in match_content(compiled, content):
                out["repo"].append(repo)
                out["path"].append(path)
                out["line_start"].append(ls)
                out["line_end"].append(le)
                out["column_start"].append(cs)
                out["column_end"].append(ce)
                out["matched_text"].append(text)
                out["captures"].append(json.dumps(caps, sort_keys=True))
        return pa.table({k: pa.array(out[k], t) for k, t in _SCHEMA.items()})

    ds = ray.data.read_parquet(
        corpus_files if isinstance(corpus_files, list) else [corpus_files],
        columns=["repo", "path", "content"],
    )
    parts = [
        pa.table(b)
        for b in ds.map_batches(fn, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    t = (
        pa.concat_tables(parts)
        if parts
        else pa.table({k: pa.array([], t_) for k, t_ in _SCHEMA.items()})
    )
    t = t.sort_by(
        [
            ("repo", "ascending"),
            ("path", "ascending"),
            ("line_start", "ascending"),
            ("column_start", "ascending"),
        ]
    )
    return t.slice(0, max_results) if max_results is not None else t
