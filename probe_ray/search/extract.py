"""`probe extract` analog over the corpus table (file granularity).

Reference: src/extract/file_paths.rs:732-1000 (spec parsing),
symbol_finder.rs:27-650 (symbol lookup; the tree-sitter path is not
portable — this implements the documented non-AST fallbacks: whole file
for unsupported languages, line text-search + context window when the
symbol is not an AST node), processor.rs:24-610 (range clamping, context
fallback, node_type labels: "range" / "context" / "file" /
"text_search").

Specs:
  path            -> whole file                      (node_type "file")
  path:N          -> line N +/- context_lines        (node_type "context")
  path:N-M        -> clamped inclusive range         (node_type "range")
  path#symbol     -> first line containing the symbol (all dot-parts for
                     nested a.b) +/- context_lines   (node_type
                     "text_search"); whole file if absent from the file
                     is NOT returned — missing symbols yield no row

Distributed composition: specs are parsed driver-side (tiny), the corpus
read is predicate-pushdown filtered to just the referenced paths, and
each file's extraction runs inside map_batches; the result is one row
per resolved spec."""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

from probe_ray.search.blocks import is_test_file

_LINE = re.compile(r"^(\d+)$")
_RANGE = re.compile(r"^(\d+)-(\d+)$")


@dataclass(frozen=True)
class ExtractSpec:
    path: str
    start: int | None = None  # 1-based
    end: int | None = None
    symbol: str | None = None


def parse_extract_spec(text: str) -> ExtractSpec | None:
    """file_paths.rs:732-1000 parse rules (no filesystem resolution —
    paths name rows of the corpus table)."""
    s = text.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "`'\"":
        s = s[1:-1]
    else:
        s = s.strip("`\"")
    if not s:
        return None
    if "#" in s:
        path, sym = s.split("#", 1)
        if path and sym:
            return ExtractSpec(path=path, symbol=sym)
        return None
    if ":" in s:
        path, rest = s.split(":", 1)
        spec = rest.split(":", 1)[0]
        if not spec:
            return ExtractSpec(path=path)
        m = _RANGE.match(spec)
        if m:
            return ExtractSpec(path=path, start=int(m.group(1)), end=int(m.group(2)))
        m = _LINE.match(spec)
        if m:
            n = int(m.group(1))
            return ExtractSpec(path=path, start=n, end=None)
        return ExtractSpec(path=path)
    return ExtractSpec(path=s)


def extract_from_content(
    spec: ExtractSpec,
    content: str,
    context_lines: int = 0,
) -> tuple[int, int, str, str] | None:
    """(start_line, end_line, node_type, code) for one file's content,
    or None when a symbol spec does not occur in the file."""
    lines = content.split("\n")
    n = len(lines)
    if spec.symbol is not None:
        parts = spec.symbol.split(".")
        found = None
        for i, ln in enumerate(lines):
            if all(p in ln for p in parts):
                found = i + 1
                break
        if found is None:
            return None
        start = max(1, found - context_lines)
        end = min(found + context_lines, n)
        return (start, end, "text_search", "\n".join(lines[start - 1 : end]))
    if spec.start is not None and spec.end is not None:
        # processor.rs:84-105 clamping
        start = min(max(spec.start, 1), n)
        end = min(max(spec.end, start), n)
        return (start, end, "range", "\n".join(lines[start - 1 : end]))
    if spec.start is not None:
        ln = min(max(spec.start, 1), n)
        start = 1 if ln <= context_lines else ln - context_lines
        end = min(ln + context_lines, n)
        return (start, end, "context", "\n".join(lines[start - 1 : end]))
    return (1, n, "file", content)


def is_git_diff_format(content: str) -> bool:
    """file_paths.rs:76-78."""
    return content.lstrip().startswith("diff --git")


_DIFF_HEADER = re.compile(r"^diff --git a/(.*) b/(.*)$")
_HUNK_HEADER = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


def parse_specs_from_git_diff(text: str, allow_tests: bool = True) -> list[ExtractSpec]:
    """Port of extract_file_paths_from_git_diff (file_paths.rs:94-275):
    walk diff headers + hunks, track ADDED lines ('+' but not '+++') at
    their new-file line numbers; one spec per file spanning
    [min changed, max changed]. First occurrence of a file wins."""
    results: list[ExtractSpec] = []
    processed: set[str] = set()
    current: str | None = None
    lines_changed: set[int] = set()

    def finalize():
        if current and lines_changed and current not in processed:
            if allow_tests or not is_test_file(current):
                results.append(
                    ExtractSpec(
                        current, min(lines_changed), max(lines_changed)
                    )
                )
            processed.add(current)

    lines = text.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        m = _DIFF_HEADER.match(line)
        if m:
            finalize()
            current = m.group(2)
            lines_changed = set()
            i += 1
            continue
        m = _HUNK_HEADER.match(line)
        if m and current is not None:
            cur = int(m.group(3))
            i += 1
            while i < len(lines):
                hl = lines[i]
                if hl.startswith("@@") or hl.startswith("diff --git"):
                    break
                if hl.startswith("+") and not hl.startswith("+++"):
                    lines_changed.add(cur)
                if not hl.startswith("-"):
                    cur += 1
                i += 1
            continue
        i += 1
    finalize()
    return results


# path token with an extension, optionally :line(-end)(:col) or #symbol
# (extract_file_paths_from_text core patterns, file_paths.rs:275-700 —
# the markdown/quote preprocessing there is simplified to wrapper
# stripping via the existing parse_extract_spec)
_PATH_IN_TEXT = re.compile(
    r"(?P<path>[A-Za-z0-9_./-]+\.[A-Za-z0-9]{1,8})"
    r"(?P<spec>:\d+(?:-\d+)?(?::\d+)?|#[A-Za-z_][A-Za-z0-9_.]*)?"
)


def parse_specs_from_text(text: str, allow_tests: bool = True) -> list[ExtractSpec]:
    """Extract file references (path.ext[:N[-M]][:col] / path.ext#symbol)
    from free text — compiler output, review comments, markdown. Quote/
    backtick/markdown wrappers are neutralized; duplicates collapse to
    the first occurrence."""
    cleaned = re.sub(r"[*~`'\"]+", " ", text)
    out: list[ExtractSpec] = []
    seen: set[str] = set()
    for m in _PATH_IN_TEXT.finditer(cleaned):
        raw = m.group(0)
        path = m.group("path")
        if "." not in path.rsplit("/", 1)[-1]:
            continue
        if path in seen:
            continue
        seen.add(path)
        if not allow_tests and is_test_file(path):
            continue
        spec = m.group("spec") or ""
        if spec.startswith("#"):
            out.append(ExtractSpec(path, symbol=spec[1:]))
            continue
        if spec.startswith(":"):
            nums = spec[1:]
            rng = _RANGE.match(nums.split(":", 1)[0])
            if rng:
                out.append(
                    ExtractSpec(path, int(rng.group(1)), int(rng.group(2)))
                )
                continue
            ln = _LINE.match(nums.split(":", 1)[0])
            if ln:
                # file.rs:10:42 => line 10, column ignored (:620-640)
                out.append(ExtractSpec(path, int(ln.group(1)), None))
                continue
        out.append(ExtractSpec(path))
    return out


_EMPTY = pa.table(
    {
        "spec": pa.array([], pa.string()),
        "repo": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "start_line": pa.array([], pa.int64()),
        "end_line": pa.array([], pa.int64()),
        "node_type": pa.array([], pa.string()),
        "code": pa.array([], pa.string()),
    }
)


def spec_string(p: ExtractSpec) -> str:
    if p.symbol is not None:
        return f"{p.path}#{p.symbol}"
    if p.start is not None and p.end is not None:
        return f"{p.path}:{p.start}-{p.end}"
    if p.start is not None:
        return f"{p.path}:{p.start}"
    return p.path


def extract(
    corpus_files: list[str] | str,
    specs: list,
    context_lines: int = 0,
    allow_tests: bool = True,
) -> pa.Table:
    """Resolve extraction specs (strings or ExtractSpec objects, e.g.
    from parse_specs_from_text / parse_specs_from_git_diff) against the
    corpus table. Returns one row per (spec, matching corpus row),
    ordered by (spec, repo, path)."""
    import pyarrow.dataset as pads
    import ray.data

    parsed: list[tuple[str, ExtractSpec]] = []
    for s in specs:
        if isinstance(s, ExtractSpec):
            p, raw = s, spec_string(s)
        else:
            p, raw = parse_extract_spec(s), s
        if p is None:
            continue
        if not allow_tests and is_test_file(p.path):
            continue
        parsed.append((raw, p))
    if not parsed:
        return _EMPTY

    by_path: dict[str, list[tuple[str, ExtractSpec]]] = {}
    for raw, p in parsed:
        by_path.setdefault(p.path, []).append((raw, p))
    paths = sorted(by_path)

    def fn(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in _EMPTY.column_names}
        for repo, path, content in zip(
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("content").to_pylist(),
        ):
            for raw, p in by_path.get(path, ()):
                got = extract_from_content(p, content, context_lines)
                if got is None:
                    continue
                start, end, node_type, code = got
                out["spec"].append(raw)
                out["repo"].append(repo)
                out["path"].append(path)
                out["start_line"].append(start)
                out["end_line"].append(end)
                out["node_type"].append(node_type)
                out["code"].append(code)
        return pa.table(
            {
                "spec": pa.array(out["spec"], pa.string()),
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "start_line": pa.array(out["start_line"], pa.int64()),
                "end_line": pa.array(out["end_line"], pa.int64()),
                "node_type": pa.array(out["node_type"], pa.string()),
                "code": pa.array(out["code"], pa.string()),
            }
        )

    ds = ray.data.read_parquet(
        corpus_files,
        columns=["repo", "path", "content"],
        filter=pads.field("path").isin(paths),
    )
    batches = [
        pa.table(b)
        for b in ds.map_batches(fn, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    t = pa.concat_tables(batches) if batches else _EMPTY
    return t.sort_by(
        [("spec", "ascending"), ("repo", "ascending"), ("path", "ascending")]
    )
