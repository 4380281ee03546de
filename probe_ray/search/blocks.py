"""Code-block granularity: line-heuristic context windows + node-type
boosted block ranking (the reference's tree-sitter-free fallback path).

tree-sitter is not available in this environment, so every matched line
takes the reference's *fallback* path — pure string logic, ported from:
  - determine_fallback_node_type   file_processing.rs:358-422
  - +/-5-line context windows with dynamic-threshold merging
                                   file_processing.rs:477-648
  - test-context string filter     file_processing.rs:703-731
  - aggressive pre-filter          file_processing.rs:737-768
  - filter_tokenized_block gate    file_processing.rs:202-279
  - node-type boost table          result_ranking.rs:190-276
  - block re-ranking (BM25 over the result set with pre-tokenized
    block content, then boost, then sort desc)
                                   result_ranking.rs:18-330
  - test-file path patterns        file_list_cache.rs:227-260

Divergence (documented): the reference's final sort is an unstable f64
sort with no tiebreak; ours breaks ties deterministically by
(path asc, start_line asc) — required by the determinism contract
(north_rule) and unobservable when scores differ.

Distributed composition (`search_blocks`): the inverted index is the
candidate generator (top file candidates by whole-file BM25 — SURVEY
§2.4), block extraction runs as a map_batches stage over ONLY the
candidate files (predicate-pushdown parquet read), and the bounded
result set is ranked like the reference ranks its in-memory results.
Partitioning assumption: blocks of one file are extracted by one task
(a row is a whole file), so no cross-task merge is needed."""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass

import pyarrow as pa

from probe_ray.query.bm25 import QueryPlan, create_query_plan, rank_documents
from probe_ray.query.parser import evaluate, is_only_excluded_terms
from probe_ray.tokenize.tokenizer import is_special_case, tokenize

CONTEXT_SIZE = 5  # default_context_size, file_processing.rs:477
MAX_LINE_LEN = 500  # lines longer than this are blanked, :1094


def determine_fallback_node_type(line: str, extension: str | None) -> str:
    """Port of file_processing.rs:358-422 (same rule order)."""
    trimmed = line.strip()
    if (
        trimmed.startswith("//")
        or trimmed.startswith("/*")
        or trimmed.startswith("*")
        or (trimmed.startswith("#") and extension in ("py", "rb"))
        or trimmed.startswith("'''")
        or trimmed.startswith('"""')
    ):
        return "comment"
    lowercase = trimmed.lower()
    if (
        ("fn " in trimmed and ("(" in trimmed or ")" in trimmed) and extension == "rs")
        or ("func " in trimmed and extension == "go")
        or ("function " in trimmed and extension in ("js", "ts"))
        or ("def " in lowercase and extension == "py")
        or ("public" in trimmed and "void" in trimmed and extension in ("java", "kt"))
    ):
        return "function"
    if (
        ("class " in trimmed or "interface " in trimmed)
        or ("struct " in trimmed and extension in ("rs", "go", "c", "cpp"))
        or ("type " in trimmed and "struct" in trimmed and extension == "go")
        or ("enum " in trimmed)
    ):
        return "class"
    if (
        trimmed.startswith("import ")
        or trimmed.startswith("from ")
        or trimmed.startswith("require ")
        or trimmed.startswith("use ")
        or trimmed.startswith("#include ")
    ):
        return "import"
    if (
        trimmed.startswith("let ")
        or trimmed.startswith("var ")
        or trimmed.startswith("const ")
    ) or ("=" in trimmed and "==" not in trimmed and "=>" not in trimmed):
        return "variable_declaration"
    if (
        trimmed.startswith("if ")
        or trimmed.startswith("for ")
        or trimmed.startswith("while ")
        or trimmed.startswith("switch ")
        or trimmed.startswith("match ")
    ):
        return "control_flow"
    return "code"


TEST_FILE_PATTERNS = [
    # file_list_cache.rs:227-260 (allow_tests=false ignore set)
    "*_test.rs", "*_tests.rs", "test_*.rs", "tests.rs",
    "*.spec.js", "*.test.js", "*.spec.ts", "*.test.ts",
    "*.spec.jsx", "*.test.jsx", "*.spec.tsx", "*.test.tsx",
    "test_*.py", "*_test.go", "test_*.c", "*_test.c",
    "*_test.cpp", "*_test.cc", "*_test.cxx", "*Test.java",
    "*_test.rb", "test_*.rb", "*_spec.rb", "*Test.php", "test_*.php",
]
TEST_DIR_PARTS = {"tests", "test", "__tests__", "__test__", "spec", "specs"}


def is_test_file(path: str) -> bool:
    parts = path.split("/")
    if any(p in TEST_DIR_PARTS for p in parts[:-1]):
        return True
    base = parts[-1]
    return any(fnmatch.fnmatch(base, pat) for pat in TEST_FILE_PATTERNS)


def merge_context_windows(
    matched_lines: list[int], n_lines: int, context: int = CONTEXT_SIZE
) -> list[tuple[list[int], int, int]]:
    """Window generation + smart merging, file_processing.rs:497-648.

    Returns [(original_lines, start, end)] with 1-based inclusive line
    ranges. Merge threshold is dynamic on window count: >10 windows ->
    context+3, >5 -> context+1, else 1 (merge only overlap/adjacent)."""
    if n_lines == 0:
        return []
    windows = []
    for ln in sorted(set(matched_lines)):
        idx = ln - 1
        s_idx = max(0, idx - context)
        e_idx = min(idx + context, n_lines - 1)
        if s_idx <= e_idx:
            windows.append((ln, s_idx + 1, e_idx + 1))
    windows.sort(key=lambda w: w[1])
    if len(windows) > 10:
        threshold = context + 3
    elif len(windows) > 5:
        threshold = context + 1
    else:
        threshold = 1
    merged: list[tuple[list[int], int, int]] = []
    cur: tuple[list[int], int, int] | None = None
    for ln, start, end in windows:
        if cur is None:
            cur = ([ln], start, end)
        elif start <= cur[2] + threshold:
            cur[0].append(ln)
            cur = (cur[0], cur[1], max(cur[2], end))
        else:
            merged.append(cur)
            cur = ([ln], start, end)
    if cur is not None:
        merged.append(cur)
    return merged


def _is_function_like(node_type: str) -> bool:
    # block_merging.rs:240-246
    return (
        "function" in node_type
        or "method" in node_type
        or "fn" in node_type
        or "func" in node_type
    )


def _should_merge_ranked(b1: dict, b2: dict, threshold: int) -> bool:
    """block_merging.rs:178-237 — same file, and overlap OR gap <=
    threshold OR comment-adjacent-function with gap <= 2*threshold."""
    if (b1["repo"], b1["path"]) != (b2["repo"], b2["path"]):
        return False
    s1, e1 = b1["start_line"], b1["end_line"]
    s2, e2 = b2["start_line"], b2["end_line"]
    overlapping = s1 <= e2 and s2 <= e1
    if overlapping:
        distance = 0
    elif s2 > e1:
        distance = s2 - e1 - 1
    else:
        distance = s1 - e2 - 1
    comment_with_function = (
        "comment" in b1["node_type"] and _is_function_like(b2["node_type"])
    ) or ("comment" in b2["node_type"] and _is_function_like(b1["node_type"]))
    return (
        overlapping
        or distance <= threshold
        or (comment_with_function and distance <= threshold * 2)
    )


def _merge_block_content(b1: dict, b2: dict, file_lines: list[str] | None) -> str:
    """block_merging.rs:255-411 — union the two blocks' lines by absolute
    position; fill gaps from the file content when available, else emit
    the reference's placeholder lines (<10-line gaps 'should be
    included', larger gaps 'skipped')."""
    s1, e1 = b1["start_line"], b1["end_line"]
    s2, e2 = b2["start_line"], b2["end_line"]
    ms, me = min(s1, s2), max(e1, e2)
    if s1 == ms and e1 == me:
        return b1["code"]
    if s2 == ms and e2 == me:
        return b2["code"]
    line_map: dict[int, str] = {}
    for i, ln in enumerate(b1["code"].split("\n")):
        line_map[s1 + i] = ln
    for i, ln in enumerate(b2["code"].split("\n")):
        line_map.setdefault(s2 + i, ln)
    out: list[str] = []
    cur = ms
    while cur <= me:
        if cur in line_map:
            out.append(line_map[cur])
            cur += 1
            continue
        gap_start = gap_end = cur
        while gap_end < me and (gap_end + 1) not in line_map:
            gap_end += 1
        gap_size = gap_end - gap_start + 1
        filled = False
        if gap_size < 10 and file_lines is not None:
            seg = file_lines[gap_start - 1 : gap_end]
            if seg:
                out.extend(seg)
                filled = True
        if not filled:
            if gap_size < 10:
                out.append(
                    f"... lines {gap_start}-{gap_end} should be included ..."
                )
            else:
                out.append(f"... lines {gap_start}-{gap_end} skipped...")
        cur = gap_end + 1
    return "\n".join(out)


def merge_ranked_blocks(
    results: pa.Table,
    threshold: int = 5,
    content_of: dict[tuple[str, str], str] | None = None,
) -> pa.Table:
    """Post-rank block merging, block_merging.rs:18-168: group the ranked
    result table by file (deterministic sorted-file order, the BTreeMap
    analog), per file greedily merge overlapping / within-threshold
    blocks to a fixed point. Merged row: lines = span union; every score
    = MAX of the pair; block_unique_terms = MAX; node_type from the
    higher-ranked (earlier) row; code = line-map union with gap fill
    from ``content_of[(repo, path)]`` when given, reference placeholder
    lines otherwise. Row order = file order then merged emission order
    (the reference re-ranks downstream, not here).

    Bounded driver work by construction: the input is an already-ranked
    top-k table, never the full block stream."""
    rows = results.to_pylist()
    for rank, r in enumerate(rows):
        r["_rank"] = rank
    by_file: dict[tuple[str, str], list[dict]] = {}
    for r in rows:
        by_file.setdefault((r["repo"], r["path"]), []).append(r)
    out_rows: list[dict] = []
    for key in sorted(by_file):
        blocks = by_file[key]
        if len(blocks) == 1:
            out_rows.append(blocks[0])
            continue
        file_lines = None
        if content_of is not None and key in content_of:
            file_lines = content_of[key].split("\n")
        blocks.sort(key=lambda b: b["start_line"])
        processed: set[int] = set()
        for i in range(len(blocks)):
            if i in processed:
                continue
            cur = dict(blocks[i])
            processed.add(i)
            changed = True
            while changed:
                changed = False
                for j, nxt in enumerate(blocks):
                    if j in processed:
                        continue
                    if not _should_merge_ranked(cur, nxt, threshold):
                        continue
                    code = _merge_block_content(cur, nxt, file_lines)
                    if cur["_rank"] > nxt["_rank"]:
                        cur["node_type"] = nxt["node_type"]
                    cur["start_line"] = min(cur["start_line"], nxt["start_line"])
                    cur["end_line"] = max(cur["end_line"], nxt["end_line"])
                    cur["code"] = code
                    for col in ("score", "bm25"):
                        if col in cur:
                            cur[col] = max(cur[col], nxt[col])
                    if "block_unique_terms" in cur:
                        cur["block_unique_terms"] = max(
                            cur["block_unique_terms"], nxt["block_unique_terms"]
                        )
                    cur["_rank"] = min(cur["_rank"], nxt["_rank"])
                    processed.add(j)
                    changed = True
            out_rows.append(cur)
    for r in out_rows:
        r.pop("_rank", None)
    if not out_rows:
        return results
    return pa.table(
        {name: [r[name] for r in out_rows] for name in results.column_names},
        schema=results.schema,
    )


def filter_tokenized_block(tokens: list[str], plan: QueryPlan) -> bool:
    """filter_tokenized_block port (file_processing.rs:202-279): term
    matched iff its (already tokenized/stemmed) keyword is a block token,
    with the special-case fallback (verbatim exact keywords match when
    their lowercase form is a token); then AST evaluate() decides."""
    tokset = set(tokens)
    if not tokens:
        return is_only_excluded_terms(plan.ast)
    matched = {idx for t, idx in plan.term_indices.items() if t in tokset}
    for t, idx in plan.term_indices.items():
        if idx not in matched and is_special_case(t, plan.special_terms):
            if t.lower() in tokset:
                matched.add(idx)
    if not matched:
        return is_only_excluded_terms(plan.ast)
    return evaluate(plan.ast, matched, plan.term_indices)


_TEST_FN = re.compile(r"^\s*(pub\s+)?fn test_")

#: Text-level analogs of the per-language AST ``is_test_node`` checks
#: (src/language/{go,python,javascript,typescript,rust}.rs). The
#: reference applies these on its tree-sitter path; its fallback path
#: (the one this module ports) only has the Rust string checks. Since
#: every block here takes the fallback path, these line heuristics
#: stand in for the AST checks — a documented superset of the fallback
#: filter, matching what the reference's primary path would filter.
_LANG_TEST_LINE = {
    # go.rs:45-66 — function_declaration whose identifier starts "Test"
    # (method declarations are NOT flagged: the receiver form is skipped)
    "go": re.compile(r"^\s*func\s+Test\w*\s*\("),
    # python.rs:41-62 — function_definition named test_*
    "py": re.compile(r"^\s*(async\s+)?def\s+test_"),
    # rust.rs:98-140 — #[test] attr (handled separately) or fn test_*
    "rs": re.compile(r"^\s*(pub\s+)?fn\s+test_"),
}
# javascript.rs:51-95 / typescript.rs:59-105 — function/method/arrow
# whose name contains test/Test, or describe/it/test/expect call
_JS_TEST_DEF = re.compile(
    r"^\s*(?:export\s+)?(?:async\s+)?function\s+\w*[tT]est\w*\s*\("
    r"|^\s*(?:const|let|var)\s+\w*[tT]est\w*\s*=.*=>"
)
_JS_TEST_CALL = re.compile(r"\b(?:describe|it|test|expect)\s*\(")
_JS_EXTS = {"js", "ts", "jsx", "tsx", "mjs", "cjs"}


def _is_test_context(code: str, ext: str | None = None) -> bool:
    """String-based test detection for merged windows.

    The ext=None behavior is the exact port of the reference's fallback
    filter (file_processing.rs:703-714: #[test] / fn test_); with an
    extension, the matching language's ``is_test_node`` analog from
    ``_LANG_TEST_LINE`` / the JS rules also applies."""
    if "#[test]" in code:
        return True
    lang_re = _LANG_TEST_LINE.get(ext or "")
    is_js = ext in _JS_EXTS
    for line in code.split("\n"):
        t = line.strip()
        if t.startswith("fn test_") or t.startswith("pub fn test_"):
            return True
        if lang_re is not None and lang_re.match(line):
            return True
        if is_js and (_JS_TEST_DEF.match(line) or _JS_TEST_CALL.search(line)):
            return True
    return False


@dataclass
class Block:
    repo: str
    path: str
    start_line: int
    end_line: int
    node_type: str
    code: str
    tokens: list[str]
    block_unique_terms: int


# ---- balanced node extents (opt-in) ---------------------------------------
# The reference's PRIMARY output unit is a tree-sitter node
# (src/language/parser.rs); this environment has no tree-sitter, so the
# default here is the reference's fallback line-window path. node_extent=
# "balanced" is the closest text-level approximation of the AST path: a
# matched window whose nearest enclosing declaration can be found gets the
# declaration's full extent — balanced-brace counting for brace languages,
# the indentation suite for Python — so "show me the function" returns the
# function. Opt-in only: default output stays pinned to the fallback port.

_BRACE_EXTS = {
    "rs", "go", "js", "jsx", "ts", "tsx", "java", "c", "h", "cpp", "hpp",
    "cc", "hh", "cs", "php", "swift", "kt", "mjs", "cjs",
}
_DECL_SCAN_UP = 200  # how far above a match to look for its declaration
_EXTENT_CAP = 2000  # max lines a balanced extent may span


def _find_declaration(lines: list[str], seed_idx: int, ext: str | None):
    """Index of the nearest declaration line at/above ``seed_idx`` whose
    fallback node type is function/class, or None."""
    lo = max(0, seed_idx - _DECL_SCAN_UP)
    for i in range(seed_idx, lo - 1, -1):
        if not lines[i]:
            continue
        if determine_fallback_node_type(lines[i], ext) in ("function", "class"):
            return i
    return None


_DECORATOR_PREFIX = {
    "py": ("@",),
    "rs": ("#[",),
    "java": ("@",), "kt": ("@",),
    "ts": ("@",), "tsx": ("@",),
    "cs": ("[",),
}


def _absorb_decorators(lines: list[str], decl_idx: int, ext: str | None) -> int:
    """Start index after absorbing contiguous decorator/attribute lines
    immediately above the declaration — tree-sitter's
    decorated_definition (py) / item-with-attributes (rs) / annotated
    member (java, kt, ts, cs) nodes include them, so the balanced
    extent does too. Comments stay siblings (the adjacency merge rule
    handles them, like the reference's)."""
    prefixes = _DECORATOR_PREFIX.get(ext or "")
    if not prefixes:
        return decl_idx
    i = decl_idx
    while i > 0:
        s = lines[i - 1].strip()
        if s and s.startswith(prefixes):
            i -= 1
        else:
            break
    return i


def _balanced_extent(lines: list[str], decl_idx: int, ext: str | None):
    """(start_idx, end_idx) 0-based inclusive extent of the declaration
    at ``decl_idx`` — including contiguous decorator/attribute lines
    above it — or None when no well-formed extent is found."""
    start_idx = _absorb_decorators(lines, decl_idx, ext)
    if ext in _BRACE_EXTS:
        depth = 0
        opened = False
        hi = min(len(lines), decl_idx + _EXTENT_CAP)
        for i in range(decl_idx, hi):
            for ch in lines[i]:
                if ch == "{":
                    depth += 1
                    opened = True
                elif ch == "}":
                    depth -= 1
                    if opened and depth == 0:
                        return start_idx, i
            if not opened and i > decl_idx + 10:
                return None  # declaration never opened a body
        return None
    if ext == "py":
        decl = lines[decl_idx]
        base = len(decl) - len(decl.lstrip())
        end = decl_idx
        hi = min(len(lines), decl_idx + 1 + _EXTENT_CAP)
        for i in range(decl_idx + 1, hi):
            ln = lines[i]
            if not ln.strip():
                continue  # blank lines don't end a suite
            if len(ln) - len(ln.lstrip()) <= base:
                break
            end = i
        return (start_idx, end) if end > decl_idx else None
    return None


def extract_blocks(
    repo: str,
    path: str,
    content: str,
    plan: QueryPlan,
    allow_tests: bool = True,
    context: int = CONTEXT_SIZE,
    node_extent: str = "window",
) -> list[Block]:
    """All blocks of one file that pass the tokenized-block filter.

    Line matching (the candidate lines that seed context windows) is
    token-level: a line matches a term iff the term is among the line's
    tokens under the query's special-term context — the tokenized
    analog of the reference's per-term regex patterns (query.rs:409-487
    generates one pattern per tokenized/stemmed keyword). Exact-term
    keywords additionally match by lowercase substring (their pattern is
    the verbatim literal).

    ``node_extent="balanced"`` (opt-in): windows whose nearest enclosing
    declaration is found are widened to that declaration's balanced
    extent and de-duplicated — see the _balanced_extent block comment."""
    if not allow_tests and is_test_file(path):
        return []
    ext = path.rsplit(".", 1)[-1] if "." in path.rsplit("/", 1)[-1] else None
    lines = [
        ("" if len(ln) > MAX_LINE_LEN else ln) for ln in content.split("\n")
    ]
    exact_lits = [
        t.lower() for t in plan.term_indices if is_special_case(t, plan.special_terms)
    ]
    matched_lines = []
    for i, ln in enumerate(lines):
        if not ln:
            continue
        low = ln.lower()
        if any(lit in low for lit in exact_lits):
            matched_lines.append(i + 1)
            continue
        ltoks = set(tokenize(ln, plan.special_terms))
        if any(t in ltoks for t in plan.term_indices):
            matched_lines.append(i + 1)
    if not matched_lines:
        return []

    query_terms_lower = [t.lower() for t in plan.term_indices]
    windows = merge_context_windows(matched_lines, len(lines), context)
    if node_extent == "balanced":
        widened: list[tuple[list[int], int, int, str | None]] = []
        seen_ranges: dict[tuple[int, int], int] = {}
        for original, start, end in windows:
            d = _find_declaration(lines, original[0] - 1, ext)
            rng = _balanced_extent(lines, d, ext) if d is not None else None
            if rng is None:
                widened.append((original, start, end, None))
                continue
            s, e = rng[0] + 1, rng[1] + 1
            key = (s, e)
            if key in seen_ranges:  # two windows inside one declaration
                widened[seen_ranges[key]][0].extend(original)
                continue
            seen_ranges[key] = len(widened)
            # node type from the DECLARATION line, not the extent start
            # (the extent may begin at an absorbed decorator/attribute)
            ntype = determine_fallback_node_type(lines[d], ext)
            widened.append((original, s, e, ntype))
        windows_iter = widened
    else:
        windows_iter = [(o, s, e, None) for o, s, e in windows]
    out: list[Block] = []
    for original, start, end, forced_type in windows_iter:
        code = "\n".join(lines[start - 1 : end])
        if not allow_tests and _is_test_context(code, ext):
            continue
        # aggressive pre-filter: cheap substring check before tokenizing
        low = code.lower()
        if not any(t in low for t in query_terms_lower):
            continue
        toks = tokenize(code, plan.special_terms)
        if not filter_tokenized_block(toks, plan):
            continue
        node_type = forced_type or determine_fallback_node_type(
            lines[original[0] - 1], ext
        )
        tokset = set(toks)
        uniq = sum(1 for t in plan.term_indices if t in tokset)
        out.append(
            Block(repo, path, start, end, node_type, code, toks, uniq)
        )
    return out


# result_ranking.rs:190-276 — full table kept even though the fallback
# extractor only emits (comment, function, class, import,
# variable_declaration, control_flow, code): parity for future AST types.
NODE_TYPE_BOOSTS: dict[str, float] = {
    **dict.fromkeys(
        [
            "function_item", "function_declaration", "method_declaration",
            "function_definition", "function_expression", "arrow_function",
            "method_definition", "method", "singleton_method",
            "constructor_declaration",
        ],
        2.0,
    ),
    **dict.fromkeys(
        [
            "impl_item", "struct_item", "class_declaration", "type_definition",
            "interface_declaration", "class_specifier", "struct_specifier",
            "struct_declaration", "interface_type", "protocol_declaration",
            "type_alias_declaration", "typealias_declaration",
        ],
        1.8,
    ),
    **dict.fromkeys(
        [
            "enum_item", "trait_item", "enum_declaration", "enum_specifier",
            "type_declaration", "type_spec", "trait_declaration",
            "extension_declaration", "delegate_declaration",
        ],
        1.6,
    ),
    **dict.fromkeys(
        [
            "module", "mod_item", "namespace", "namespace_declaration",
            "namespace_definition", "module_declaration", "package_declaration",
        ],
        1.4,
    ),
    **dict.fromkeys(
        [
            "property_declaration", "event_declaration", "const_declaration",
            "var_declaration", "variable_declaration", "constant_declaration",
            "const_spec", "var_spec",
        ],
        1.3,
    ),
    **dict.fromkeys(["export_statement", "declare_statement", "declaration"], 1.1),
    **dict.fromkeys(["line_comment", "comment", "//", "/*", "*/"], 0.5),
}


def node_type_boost(node_type: str, start_line: int, end_line: int) -> float:
    if node_type in ("doc_comment", "block_comment"):
        # multi-line doc blocks only (result_ranking.rs:249-253)
        return 1.2 if end_line - start_line > 3 else 1.0
    if node_type in NODE_TYPE_BOOSTS:
        return NODE_TYPE_BOOSTS[node_type]
    if "test" in node_type or "Test" in node_type:
        return 0.7
    return 1.0


def rank_blocks(blocks: list[Block], query: str) -> list[tuple[Block, float, float]]:
    """(block, boosted_score, bm25) ranked like result_ranking.rs: BM25
    over the result set itself (pre-tokenized block content; stats from
    the blocks, not the corpus), score x node-type boost, sorted desc
    with deterministic (path, start) tiebreak."""
    if not blocks:
        return []
    pre = [b.tokens for b in blocks]
    scored = rank_documents(None, query, pre_tokenized=pre)
    rows = []
    for i, bm25 in scored:
        b = blocks[i]
        boost = node_type_boost(b.node_type, b.start_line, b.end_line)
        rows.append((b, bm25 * boost, bm25))
    rows.sort(key=lambda r: (-r[1], r[0].path, r[0].start_line))
    return rows


def _blocks_to_table(ranked: list[tuple[Block, float, float]], k: int) -> pa.Table:
    ranked = ranked[:k]
    return pa.table(
        {
            "score": pa.array([r[1] for r in ranked], pa.float64()),
            "bm25": pa.array([r[2] for r in ranked], pa.float64()),
            "repo": pa.array([r[0].repo for r in ranked], pa.string()),
            "path": pa.array([r[0].path for r in ranked], pa.string()),
            "start_line": pa.array([r[0].start_line for r in ranked], pa.int64()),
            "end_line": pa.array([r[0].end_line for r in ranked], pa.int64()),
            "node_type": pa.array([r[0].node_type for r in ranked], pa.string()),
            "block_unique_terms": pa.array(
                [r[0].block_unique_terms for r in ranked], pa.int64()
            ),
            "code": pa.array([r[0].code for r in ranked], pa.string()),
        }
    )


FILE_CANDIDATES = 50


def search_blocks(
    reader,
    corpus_files: list[str] | str,
    query: str,
    k: int = 10,
    allow_tests: bool = True,
    file_candidates: int = FILE_CANDIDATES,
    node_extent: str = "window",
    merge_threshold: int | None = None,
) -> pa.Table:
    """Distributed block search: index-guided candidate files -> block
    extraction as a map_batches stage over only those files (pushdown
    path filter at the parquet read) -> bounded driver-side re-rank.

    ``merge_threshold`` (opt-in; the reference's --merge-threshold with
    no_merge=false default) applies the post-rank merge pass to the
    top-k table, gap-filling merged code from one bounded filtered read
    of only the <= k result files.

    ``reader`` is an IndexReader over the same corpus."""
    import pyarrow.dataset as pads
    import ray.data

    plan = create_query_plan(query)
    files = reader.search(query, k=file_candidates)
    if files.num_rows == 0:
        return _blocks_to_table([], k)
    paths = files.column("path").to_pylist()

    def extract(batch: pa.Table) -> pa.Table:
        rows: list[Block] = []
        for repo, path, content in zip(
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("content").to_pylist(),
        ):
            rows.extend(
                extract_blocks(
                    repo, path, content, plan, allow_tests,
                    node_extent=node_extent,
                )
            )
        return pa.table(
            {
                "repo": pa.array([b.repo for b in rows], pa.string()),
                "path": pa.array([b.path for b in rows], pa.string()),
                "start_line": pa.array([b.start_line for b in rows], pa.int64()),
                "end_line": pa.array([b.end_line for b in rows], pa.int64()),
                "node_type": pa.array([b.node_type for b in rows], pa.string()),
                "code": pa.array([b.code for b in rows], pa.string()),
                "tokens": pa.array([b.tokens for b in rows], pa.list_(pa.string())),
                "block_unique_terms": pa.array(
                    [b.block_unique_terms for b in rows], pa.int64()
                ),
            }
        )

    ds = ray.data.read_parquet(
        corpus_files,
        columns=["repo", "path", "content"],
        filter=pads.field("path").isin(paths),
    )
    rows = ds.map_batches(extract, batch_format="pyarrow").take_all()
    blocks = [
        Block(
            r["repo"], r["path"], int(r["start_line"]), int(r["end_line"]),
            r["node_type"], r["code"], list(r["tokens"]),
            int(r["block_unique_terms"]),
        )
        for r in rows
    ]
    out = _blocks_to_table(rank_blocks(blocks, query), k)
    if merge_threshold is not None and out.num_rows > 1:
        want = sorted(
            set(
                zip(
                    out.column("repo").to_pylist(),
                    out.column("path").to_pylist(),
                )
            )
        )
        content_of: dict[tuple[str, str], str] = {}
        t = pads.dataset(corpus_files).to_table(
            columns=["repo", "path", "content"],
            filter=pads.field("path").isin([p for _, p in want]),
        )  # <= k result files — bounded
        for rp, p, c in zip(
            t.column("repo").to_pylist(),
            t.column("path").to_pylist(),
            t.column("content").to_pylist(),
        ):
            if (rp, p) in set(want):
                content_of[(rp, p)] = c
        out = merge_ranked_blocks(out, merge_threshold, content_of)
    return out


def search_blocks_scalar(
    corpus_rows: list[tuple[str, str, str]],  # (repo, path, content)
    query: str,
    k: int = 10,
    allow_tests: bool = True,
    file_candidates: int = FILE_CANDIDATES,
    node_extent: str = "window",
) -> pa.Table:
    """Pure-scalar oracle for search_blocks: whole-file BM25 candidate
    ranking via rank_files over the full corpus, sequential block
    extraction, same re-rank. No Ray."""
    from probe_ray.query.bm25 import rank_files

    ranked_files = rank_files(
        [(p, c) for _, p, c in corpus_rows], query
    )[:file_candidates]
    plan = create_query_plan(query)
    blocks: list[Block] = []
    for i, _score in ranked_files:
        repo, path, content = corpus_rows[i]
        blocks.extend(
            extract_blocks(
                repo, path, content, plan, allow_tests, node_extent=node_extent
            )
        )
    return _blocks_to_table(rank_blocks(blocks, query), k)
