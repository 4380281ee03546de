"""`probe query` analog: structural pattern search (pattern-query lite).

Reference: src/query.rs (ast-grep over tree-sitter ASTs; AstMatch rows
with file/line/column spans). ast-grep needs tree-sitter grammars that
are not available in this environment, so this is a documented
TEXT-LEVEL APPROXIMATION of the pattern language:

  $NAME      — a metavariable binding one identifier
               ([A-Za-z_][A-Za-z0-9_]*); a repeated metavariable must
               bind the same text (backreference), like ast-grep
  $$$        — zero or more of anything (ast-grep's anonymous multi
               metavariable)
  $$$PARAMS  — named multi metavariable: same extent rules, and the
               matched text is captured under PARAMS (the form the
               reference's own test fixtures use,
               tests/query_command_tests.rs:28,80,100)
  literal    — matched exactly, with whitespace runs relaxed to \\s*
               (AST matching is whitespace-insensitive)

Multi-metavariable extent (balanced, counted — not line-local regex):
  - between a delimiter pair — ``($$$)`` / ``[$$$]`` / ``{$$$}`` — the
    extent is found by COUNTING NESTING of that delimiter kind, so
    ``foo($$$ARGS)`` matches ``foo(bar(x), y)`` whole, binding
    ``bar(x), y``;
  - trailing (end of pattern, the ast-grep "rest of the node" position,
    e.g. ``fn $NAME($$$) $$$BODY``): the extent runs through the first
    balanced ``{...}`` block if a ``{`` opens before any ``;``,
    else up to and including the next ``;`` (statement end), else to
    end of line — mirroring what the reference's fixtures assert
    (a fn match includes its whole body; an arrow-fn body stops at
    the statement);
  - otherwise: shortest extent such that the rest of the pattern
    matches (lazy), as before.

String/comment masking: each scanned file gets a per-extension lexical
mask of string-literal and comment spans (one regex pass). Matches may
not START inside a masked span, and balanced-delimiter counting and
multi-metavariable extent scans SKIP masked spans — so
``foo($$$ARGS)`` matches ``foo(a, ")", b)`` whole, and ``$A + $B``
does not fire on commented-out code, matching what an AST matcher
sees. The mask is lexical: exotic syntaxes (Rust raw strings, Python
f-string nesting, heredocs, nested block comments) degrade to the
plain-quote rules.

``$_``-prefixed metavariables (``$_``, ``$_FOO``) are wildcards, like
ast-grep: each matches one identifier independently, with no capture
and no backreference linking.

``$$`` / ``$$NAME`` match exactly ONE node, including unnamed nodes
(ast-grep's single-node-any form). In this text approximation one
"node" is a base token — a balanced ``(...)`` / ``[...]`` / ``{...}``
group (whole), a string literal (the full masked span), an identifier
or number token, or one maximal operator token (``==``, ``->``, ...)
— optionally extended by postfix call/index groups and ``.``/``::``
member steps (``bar(x, y)`` and ``cfg.items()`` are each one
expression node); the matcher takes the shortest extent that lets the
rest of the pattern match. ``$$NAME`` captures and
backreference-links like ``$NAME``; bare ``$$`` matches anonymously.

REMAINING DIVERGENCE from real AST matching (the documented set):
  1. node boundaries are enforced by an operator-PRECEDENCE heuristic,
     not a real parse (see "node-boundary anchoring" below): matches
     starting/ending against a tighter-binding operator or a ``.``
     member name are rejected, so ``$A + $B`` no longer matches the
     ``y + z`` slice of ``x * y + z`` — but exotic language-specific
     precedence (e.g. custom operators) falls back to the generic
     C-family table.

Output mirrors AstMatch (query.rs:13-20): one row per match with
(repo, path, line_start, line_end, column_start, column_end,
matched_text, captures as a JSON object of metavar bindings).
Columns are 1-based, like editors and the reference's printed output.

Distributed composition: one map_batches scan over the corpus (language
pruning by extension happens in the reader filter when ``language`` is
given), per-batch matching with a pattern compiled once per task.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

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

_META = re.compile(
    r"\$\$\$[A-Z_][A-Z0-9_]*|\$\$\$"
    r"|\$\$[A-Z_][A-Z0-9_]*|\$\$"
    r"|\$[A-Z_][A-Z0-9_]*"
)

# -- lexical string/comment mask ------------------------------------------

_STR_DQ = r'"(?:\\.|[^"\\\n])*"'
_STR_SQ = r"'(?:\\.|[^'\\\n])*'"
_STR_BT = r"`(?:\\.|[^`\\])*`"
_CMT_LINE = r"//[^\n]*"
_CMT_BLOCK = r"/\*(?:.|\n)*?\*/"
_CMT_HASH = r"#[^\n]*"
# One alternation per language family; the regex engine's leftmost-first
# scan gives the right precedence for free (a comment opened first hides
# the quote inside it, a string opened first hides the // inside it).
_MASK_RES: dict[str, re.Pattern] = {}


def _mask_re(ext: str) -> re.Pattern:
    fam = {
        "py": "py", "rb": "hash", "sh": "hash", "yaml": "hash", "yml": "hash",
        "php": "php",
        "js": "bt", "jsx": "bt", "mjs": "bt", "ts": "bt", "tsx": "bt",
        "go": "bt",
    }.get(ext, "c")
    pat = _MASK_RES.get(fam)
    if pat is None:
        if fam == "py":
            alts = [_CMT_HASH, "'''(?:.|\n)*?'''", '"""(?:.|\n)*?"""',
                    _STR_DQ, _STR_SQ]
        elif fam == "hash":
            alts = [_CMT_HASH, _STR_DQ, _STR_SQ]
        elif fam == "php":
            alts = [_CMT_LINE, _CMT_HASH, _CMT_BLOCK, _STR_DQ, _STR_SQ]
        elif fam == "bt":
            alts = [_CMT_LINE, _CMT_BLOCK, _STR_DQ, _STR_SQ, _STR_BT]
        else:  # C family (rs, c, cpp, java, swift, cs, ...)
            alts = [_CMT_LINE, _CMT_BLOCK, _STR_DQ, _STR_SQ]
        pat = _MASK_RES[fam] = re.compile("|".join(alts))
    return pat


class Mask:
    """Sorted string/comment spans with O(log n) point queries."""

    __slots__ = ("starts", "ends")

    def __init__(self, spans: list[tuple[int, int]]):
        self.starts = [s for s, _ in spans]
        self.ends = [e for _, e in spans]

    def covers(self, i: int) -> bool:
        import bisect

        j = bisect.bisect_right(self.starts, i) - 1
        return j >= 0 and i < self.ends[j]

    def skip(self, i: int) -> int:
        """First index >= i outside every span."""
        import bisect

        j = bisect.bisect_right(self.starts, i) - 1
        return self.ends[j] if j >= 0 and i < self.ends[j] else i


_EMPTY_MASK = Mask([])


def code_mask(content: str, ext: str) -> Mask:
    """Mask of string-literal and comment spans for one file (one regex
    pass; see module docstring for the per-extension rules)."""
    return Mask([m.span() for m in _mask_re(ext).finditer(content)])
_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_IDENT_RE = re.compile(_IDENT)
_OPEN_FOR = {")": "(", "]": "[", "}": "{"}
_CLOSE_FOR = {v: k for k, v in _OPEN_FOR.items()}

# -- node-boundary anchoring ------------------------------------------------
# Closes the last documented divergence (module docstring item 1): a
# pattern whose TOP level contains a binary operator (e.g. ``$A + $B``)
# must bind a whole expression node, never a slice of a larger one.
# Text-level approximation of the AST rule: a candidate match is a node
# slice — and is rejected — when the operator token immediately BEFORE
# its start or AFTER its end binds tighter than the pattern's loosest
# top-level operator (``y + z`` inside ``x * y + z``: pre-op ``*`` >
# ``+``). Equal precedence follows associativity: left-assoc binds the
# left neighbour (``y + z`` in ``x + y + z`` is not a node; ``x + y``
# is), right-assoc the right (``b = c`` in ``a = b = c`` is a node).
# Patterns with no top-level operator (calls, statements) bind tightest
# and are exempt. Additionally a match may not start on a word char
# preceded by ``.``: that name is a member/field, not an independent
# node (``foo($A)`` must not fire inside ``a.foo(x)`` — the callee
# there is the member expression, not the identifier ``foo``).
_OPCHARS = set("+-*/%<>=&|^")
_OP_PRECEDENCE = {
    "**": 14,
    "*": 13, "/": 13, "//": 13, "%": 13,
    "+": 12, "-": 12,
    "<<": 11, ">>": 11, ">>>": 11,
    "<": 10, ">": 10, "<=": 10, ">=": 10,
    "==": 9, "!=": 9, "===": 9, "!==": 9, "<>": 9,
    "&": 8, "^": 7, "|": 6,
    "&&": 5, "||": 4, "??": 4,
    "=": 2, "+=": 2, "-=": 2, "*=": 2, "/=": 2, "%=": 2,
    "&=": 2, "|=": 2, "^=": 2, "<<=": 2, ">>=": 2, "**=": 2,
}
_RIGHT_ASSOC = {
    "**", "=", "+=", "-=", "*=", "/=", "%=",
    "&=", "|=", "^=", "<<=", ">>=", "**=",
}
_TOP_PREC_EXEMPT = float("inf")


def _pattern_top_prec(pattern: str) -> float:
    """Loosest (minimum) operator precedence at bracket depth 0 of the
    raw pattern text; inf when the pattern has no top-level operator."""
    top = _TOP_PREC_EXEMPT
    depth = 0
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth = max(0, depth - 1)
        elif c in _OPCHARS and depth == 0:
            j = i
            while j < n and pattern[j] in _OPCHARS:
                j += 1
            prec = _OP_PRECEDENCE.get(pattern[i:j])
            if prec is not None:
                top = min(top, prec)
            i = j
            continue
        i += 1
    return top


def _op_before(content: str, pos: int) -> str:
    """The operator-char run ending at the last non-whitespace char
    before ``pos`` ('' when that char is not an operator char)."""
    j = pos - 1
    while j >= 0 and content[j].isspace():
        j -= 1
    k = j
    while k >= 0 and content[k] in _OPCHARS:
        k -= 1
    return content[k + 1 : j + 1]


def _op_after(content: str, pos: int) -> str:
    """The operator-char run starting at the first non-whitespace char
    at/after ``pos`` ('' when that char is not an operator char)."""
    n = len(content)
    q = pos
    while q < n and content[q].isspace():
        q += 1
    r = q
    while r < n and content[r] in _OPCHARS:
        r += 1
    return content[q:r]


@dataclass(frozen=True)
class _Lit:
    frag: str  # whitespace-relaxed regex fragment
    text: str  # the raw pattern text (for delimiter-context checks)


@dataclass(frozen=True)
class _Var:
    name: str


@dataclass(frozen=True)
class _Multi:
    name: str | None  # None for anonymous $$$


@dataclass(frozen=True)
class _Node:
    name: str | None  # None for anonymous $$


class _Match:
    """re.Match-alike over the custom matcher's result."""

    __slots__ = ("_start", "_end", "_text", "_caps")

    def __init__(self, start: int, end: int, text: str, caps: dict[str, str]):
        self._start, self._end, self._text, self._caps = start, end, text, caps

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def group(self, i: int = 0) -> str:
        assert i == 0
        return self._text

    def groupdict(self) -> dict[str, str]:
        return dict(self._caps)


class CompiledPattern:
    """Token-level matcher with backtracking and balanced-delimiter
    multi-metavariable extents (see module docstring)."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.tokens: list[_Lit | _Var | _Multi | _Node] = []
        pos = 0
        for m in _META.finditer(pattern):
            if m.start() > pos:
                self._push_lit(pattern[pos : m.start()])
            tok = m.group(0)
            if tok.startswith("$$$"):
                self.tokens.append(_Multi(tok[3:] or None))
            elif tok.startswith("$$"):
                self.tokens.append(_Node(tok[2:] or None))
            else:
                self.tokens.append(_Var(tok[1:]))
            pos = m.end()
        if pos < len(pattern):
            self._push_lit(pattern[pos:])
        # pre-compiled anchored fragments for _Lit tokens
        self._lit_re = {
            i: re.compile(t.frag)
            for i, t in enumerate(self.tokens)
            if isinstance(t, _Lit)
        }
        self._top_prec = _pattern_top_prec(pattern)
        # a scanner for candidate start positions of the first token
        first = self.tokens[0] if self.tokens else None
        if isinstance(first, _Lit):
            self._scan = re.compile(first.frag)
        elif isinstance(first, _Var):
            self._scan = _IDENT_RE
        else:  # starts with $$$ (or empty): try every position
            self._scan = None

    def _push_lit(self, text: str):
        if text.strip() == "" and not self.tokens:
            return  # leading pure-whitespace literal carries no anchor
        # whitespace-insensitive between ALL pattern tokens (words and
        # punctuation), like AST matching: "() {}" matches "()\n{\n}"
        parts = re.findall(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]", text)
        frag = r"\s*".join(re.escape(p) for p in parts)
        if not parts:
            frag = r"\s*"
        elif self.tokens:
            frag = r"\s*" + frag  # interior literal: ws-insensitive edge
        self.tokens.append(_Lit(frag, text))

    # -- matching ---------------------------------------------------------

    def finditer(self, content: str, mask: Mask | None = None):
        """Leftmost, non-overlapping matches (re.finditer semantics).
        A match may not START inside a ``mask`` span (string/comment),
        nor start or end MID-IDENTIFIER: when the match's first/last
        character is a word character, the adjacent content character
        must not be one (an AST matcher's tokens are whole — ``foo(``
        must not fire inside ``myfoo(``, nor a trailing literal ``foo``
        on the prefix of ``foobar``)."""
        mask = mask if mask is not None else _EMPTY_MASK
        pos = 0
        n = len(content)
        while pos <= n:
            if self._scan is not None:
                anchor = self._scan.search(content, pos)
                if anchor is None:
                    return
                start = anchor.start()
            else:
                start = pos
            if mask.covers(start):
                pos = mask.skip(start)
                continue
            if (
                start > 0
                and start < n
                and _is_word(content[start])
                and _is_word(content[start - 1])
            ):
                pos = start + 1
                continue
            # node-boundary anchoring, start side: a word char after '.'
            # is a member/field name, and an operator binding tighter
            # than the pattern's top-level operator (or equal,
            # left-assoc) makes this start a slice of a larger
            # expression — neither can begin a matching node
            if start > 0 and start < n and _is_word(content[start]):
                j = start - 1
                while j >= 0 and content[j].isspace():
                    j -= 1
                if j >= 0 and content[j] == ".":
                    pos = start + 1
                    continue
            if self._top_prec != _TOP_PREC_EXEMPT:
                prec = _OP_PRECEDENCE.get(_op_before(content, start))
                if prec is not None and (
                    prec > self._top_prec
                    or (
                        prec == self._top_prec
                        and _op_before(content, start) not in _RIGHT_ASSOC
                    )
                ):
                    pos = start + 1
                    continue
            got = self._match_from(0, content, start, {}, mask)
            if got is not None:
                end, caps = got
                if end > start and not (
                    end < n
                    and _is_word(content[end - 1])
                    and _is_word(content[end])
                ):
                    yield _Match(start, end, content[start:end], caps)
                    pos = end
                    continue
            pos = start + 1

    def _match_from(
        self, ti: int, content: str, pos: int, caps: dict[str, str], mask: Mask
    ):
        if ti == len(self.tokens):
            # node-boundary anchoring, end side: a following operator
            # that binds tighter than the pattern's top-level operator
            # (or equal, right-assoc) means the last operand continues
            # into a larger expression — returning None here lets
            # $$/$$$ backtrack into longer extents before failing
            if self._top_prec != _TOP_PREC_EXEMPT:
                op = _op_after(content, pos)
                prec = _OP_PRECEDENCE.get(op)
                if prec is not None and (
                    prec > self._top_prec
                    or (prec == self._top_prec and op in _RIGHT_ASSOC)
                ):
                    return None
            return pos, caps
        tok = self.tokens[ti]
        if isinstance(tok, _Lit):
            m = self._lit_re[ti].match(content, pos)
            if m is None:
                return None
            return self._match_from(ti + 1, content, m.end(), caps, mask)
        if isinstance(tok, _Var):
            m = _IDENT_RE.match(content, _skip_ws(content, pos))
            if m is None:
                return None
            if tok.name.startswith("_"):
                # $_ / $_FOO wildcard: matches, never captures or links
                return self._match_from(ti + 1, content, m.end(), caps, mask)
            if tok.name in caps and caps[tok.name] != m.group(0):
                return None
            return self._match_from(
                ti + 1, content, m.end(), {**caps, tok.name: m.group(0)}, mask
            )
        if isinstance(tok, _Node):
            p = _skip_ws(content, pos)
            # comments are invisible to an AST matcher: hop masked spans
            # that do not open a string literal
            while (
                p < len(content)
                and mask.covers(p)
                and content[p] not in "\"'`"
            ):
                p = _skip_ws(content, mask.skip(p))
            for end in _node_candidates(content, p, mask):
                if tok.name is None or tok.name.startswith("_"):
                    got = self._match_from(ti + 1, content, end, caps, mask)
                else:
                    text = content[p:end]
                    if tok.name in caps and caps[tok.name] != text:
                        continue
                    got = self._match_from(
                        ti + 1, content, end, {**caps, tok.name: text}, mask
                    )
                if got is not None:
                    return got
            return None
        return self._match_multi(ti, tok, content, pos, caps, mask)

    def _match_multi(
        self, ti: int, tok: _Multi, content: str, pos: int,
        caps: dict[str, str], mask: Mask,
    ):
        pos = _skip_ws(content, pos)

        def bind_and_continue(end: int, cont: int):
            text = content[pos:end]
            if tok.name is not None:
                if tok.name in caps and caps[tok.name] != text:
                    return None
                new = {**caps, tok.name: text}
            else:
                new = caps
            return self._match_from(ti + 1, content, cont, new, mask)

        nxt = self.tokens[ti + 1] if ti + 1 < len(self.tokens) else None

        # between a delimiter pair: counted-nesting extent
        if isinstance(nxt, _Lit):
            closer = nxt.text.lstrip()[:1]
            prev = self.tokens[ti - 1] if ti > 0 else None
            opener = (
                prev.text.rstrip()[-1:] if isinstance(prev, _Lit) else ""
            )
            if closer in _OPEN_FOR and _OPEN_FOR[closer] == opener:
                end = _balanced_end(content, pos, opener, closer, mask)
                if end is None:
                    return None
                return bind_and_continue(end, end)

        # trailing: through the first balanced {...} block opening before
        # any ';', else through the next ';', else to end of line
        if nxt is None:
            brace = _find_unmasked(content, "{", pos, mask)
            semi = _find_unmasked(content, ";", pos, mask)
            if brace != -1 and (semi == -1 or brace < semi):
                close = _balanced_end(content, brace + 1, "{", "}", mask)
                if close is not None:
                    return bind_and_continue(close + 1, close + 1)
            if semi != -1:
                return bind_and_continue(semi + 1, semi + 1)
            nl = content.find("\n", pos)
            end = nl if nl != -1 else len(content)
            return bind_and_continue(end, end)

        # general case: lazy — shortest extent whose continuation matches
        if isinstance(nxt, _Lit):
            scan = self._lit_re[ti + 1]
            cur = pos
            while cur <= len(content):
                m = scan.search(content, cur)
                if m is None:
                    return None
                if mask.covers(m.start()):
                    cur = mask.skip(m.start())
                    continue
                got = bind_and_continue(m.start(), m.start())
                if got is not None:
                    return got
                cur = m.start() + 1
            return None
        # next token is a metavar: step one char at a time (rare shape)
        for end in range(pos, len(content) + 1):
            got = bind_and_continue(end, end)
            if got is not None:
                return got
        return None


_NUM_RE = re.compile(r"[0-9][0-9A-Za-z_.]*")
_OP_RE = re.compile(r"[!%&*+\-./:<=>?@^|~]+")


def _node_end(content: str, pos: int, mask: Mask):
    """End offset of exactly ONE node-ish unit starting at ``pos`` (the
    ``$$`` single-node approximation — see module docstring): a whole
    balanced delimiter group, a string literal (full masked span), an
    identifier/number, or one maximal operator token. None if ``pos``
    starts none of these (e.g. at a ``,`` / ``;`` separator or EOF)."""
    if pos >= len(content):
        return None
    c = content[pos]
    if c in _CLOSE_FOR:  # an opener: the balanced group is one node
        end = _balanced_end(content, pos + 1, c, _CLOSE_FOR[c], mask)
        return None if end is None else end + 1
    if mask.covers(pos):  # string literal (comments were hopped upstream)
        return mask.skip(pos)
    m = _IDENT_RE.match(content, pos) or _NUM_RE.match(content, pos)
    if m is not None:
        return m.end()
    m = _OP_RE.match(content, pos)
    return m.end() if m is not None else None


def _node_candidates(content: str, pos: int, mask: Mask):
    """Candidate end offsets for ONE node at ``pos``, shortest first:
    the base token (see _node_end), then each postfix extension — a
    call/index balanced group or a ``.``/``::`` member step — since at
    text level ``bar(x, y)`` or ``cfg.items()`` is one expression node.
    The matcher backtracks through these lazily."""
    end = _node_end(content, pos, mask)
    if end is None:
        return
    yield end
    while True:
        p = _skip_ws(content, end)
        if p < len(content) and content[p] in "([":
            nxt = _balanced_end(
                content, p + 1, content[p], _CLOSE_FOR[content[p]], mask
            )
            if nxt is None:
                return
            end = nxt + 1
        elif p < len(content) and (
            content[p] == "." or content.startswith("::", p)
        ):
            q = p + (2 if content.startswith("::", p) else 1)
            m = _IDENT_RE.match(content, _skip_ws(content, q))
            if m is None:
                return
            end = m.end()
        else:
            return
        yield end


def _is_word(c: str) -> bool:
    return c.isalnum() or c == "_"


def _skip_ws(content: str, pos: int) -> int:
    while pos < len(content) and content[pos].isspace():
        pos += 1
    return pos


def _find_unmasked(content: str, ch: str, pos: int, mask: Mask) -> int:
    i = content.find(ch, pos)
    while i != -1 and mask.covers(i):
        i = content.find(ch, mask.skip(i))
    return i


def _balanced_end(
    content: str, pos: int, opener: str, closer: str, mask: Mask = _EMPTY_MASK
):
    """Index of the closer matching an already-open ``opener`` (depth 1
    at ``pos``), counting nesting; delimiters inside ``mask`` spans
    (string literals / comments) do not count. None if unbalanced."""
    i = pos
    depth = 1
    n = len(content)
    while i < n:
        if mask.covers(i):
            i = mask.skip(i)
            continue
        c = content[i]
        if c == opener:
            depth += 1
        elif c == closer:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return None


def compile_pattern(pattern: str) -> CompiledPattern:
    """Compile an ast-grep-style pattern (see module docstring)."""
    return CompiledPattern(pattern)


def match_content(
    pattern: re.Pattern, content: str, ext: str = ""
) -> list[tuple[int, int, int, int, str, dict[str, str]]]:
    """(line_start, line_end, col_start, col_end, text, captures) per
    match; lines and columns 1-based. ``ext`` picks the string/comment
    mask rules (empty -> C-family defaults)."""
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
    for m in pattern.finditer(content, code_mask(content, ext)):
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
            base = path.rsplit("/", 1)[-1]
            ext = base.rsplit(".", 1)[-1] if "." in base else ""
            if exts is not None and ext not in exts:
                continue
            for ls, le, cs, ce, text, caps in match_content(
                compiled, content, ext
            ):
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
