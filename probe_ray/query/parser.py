"""Elastic-style boolean query language: lexer, parser, AST, evaluation.

Behavior-parity reimplementation of /root/reference/src/search/elastic_query.rs:
  - lexer :520-622 (operators + - ( ) :, quoted strings with escapes,
    identifiers [A-Za-z0-9_.-] starting alnum/_/., AND/OR case-insensitive,
    unknown chars skipped)
  - recursive-descent parser :655-882 (OR outer loop; AND and prefix +/-
    bind as AND; adjacent bare terms combine as OR; field:term captured but
    ignored in evaluation; quoted => exact)
  - keyword expansion :740-802: non-exact, non-excluded keywords run through
    the document tokenizer; exact/excluded keywords are kept verbatim and
    registered as *dynamic special terms* that alter document tokenization
    (hazard H2) — here collected into ``ParseResult.special_terms`` instead
    of a process-global.
  - fallbacks :913-963 and the exact top-level mode :892-904.
  - evaluate() :365-443 with the global required-term rule :107-174.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from probe_ray.tokenize.tokenizer import tokenize as doc_tokenize


class ParseError(Exception):
    pass


@dataclass
class Term:
    keywords: list[str]
    field: str | None = None
    required: bool = False
    excluded: bool = False
    exact: bool = False


@dataclass
class And:
    left: "Expr"
    right: "Expr"


@dataclass
class Or:
    left: "Expr"
    right: "Expr"


Expr = Term | And | Or


# --- lexer -----------------------------------------------------------------

_PLUS, _MINUS, _AND, _OR, _LP, _RP, _COLON = (
    "PLUS", "MINUS", "AND", "OR", "LP", "RP", "COLON",
)


def _lex(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
        elif ch == "+":
            tokens.append((_PLUS, "+")); i += 1
        elif ch == "-":
            tokens.append((_MINUS, "-")); i += 1
        elif ch == "(":
            tokens.append((_LP, "(")); i += 1
        elif ch == ")":
            tokens.append((_RP, ")")); i += 1
        elif ch == ":":
            tokens.append((_COLON, ":")); i += 1
        elif ch == '"':
            i += 1
            buf: list[str] = []
            escaped = False
            closed = False
            while i < n:
                c = text[i]
                if escaped:
                    buf.append(c); escaped = False; i += 1
                elif c == "\\":
                    escaped = True; i += 1
                elif c == '"':
                    i += 1; closed = True
                    break
                else:
                    buf.append(c); i += 1
            if not closed:
                raise ParseError("unexpected end of input in quoted string")
            tokens.append(("QUOTED", "".join(buf)))
        elif ch.isalnum() or ch in "_.":
            buf = []
            while i < n and (text[i].isalnum() or text[i] in "_.-"):
                buf.append(text[i]); i += 1
            ident = "".join(buf)
            upper = ident.upper()
            if upper == "AND":
                tokens.append((_AND, ident))
            elif upper == "OR":
                tokens.append((_OR, ident))
            else:
                tokens.append(("IDENT", ident))
        else:
            i += 1  # skip unknown characters
    if not tokens:
        raise ParseError("no valid tokens found in input")
    return tokens


# --- parser ----------------------------------------------------------------


@dataclass
class ParseResult:
    ast: Expr
    # Dynamic special terms registered while parsing (exact/excluded
    # keywords, lowercased) — must be threaded into document tokenization.
    special_terms: frozenset[str] = field(default_factory=frozenset)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.pos = 0
        self.special: set[str] = set()

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self):
        t = self.peek()
        if t is not None:
            self.pos += 1
        return t

    def parse_expr(self) -> Expr:
        return self.parse_or()

    def parse_or(self) -> Expr:
        left = self.parse_and()
        while (t := self.peek()) and t[0] == _OR:
            self.next()
            left = Or(left, self.parse_and())
        return left

    def parse_and(self) -> Expr:
        left = self.parse_factor()
        while (t := self.peek()) is not None:
            kind = t[0]
            if kind == _AND:
                self.next()
                left = And(left, self.parse_factor())
            elif kind == _OR:
                break
            elif kind in (_PLUS, _MINUS):
                left = And(left, self.parse_factor())
            elif kind in ("IDENT", "QUOTED", _LP):
                # True Lucene semantics: implicit combination is OR.
                left = Or(left, self.parse_factor())
            else:
                break
        return left

    def parse_factor(self) -> Expr:
        t = self.peek()
        if t and t[0] == _LP:
            self.next()
            expr = self.parse_expr()
            t = self.peek()
            if not t or t[0] != _RP:
                raise ParseError("expected ')'")
            self.next()
            return expr
        return self.parse_prefixed_term()

    def parse_prefixed_term(self) -> Expr:
        required = excluded = False
        t = self.peek()
        if t and t[0] == _PLUS:
            required = True; self.next()
        elif t and t[0] == _MINUS:
            excluded = True; self.next()
        primary = self.parse_primary()
        if isinstance(primary, Term):
            if primary.exact or excluded:
                for kw in primary.keywords:
                    self.special.add(kw.lower())
                keywords = primary.keywords
            else:
                keywords = []
                for kw in primary.keywords:
                    # Keyword expansion uses the dynamic special terms
                    # registered so far (left-to-right parse order), matching
                    # the reference's global-set mutation timing.
                    keywords.extend(
                        s for s in doc_tokenize(kw, frozenset(self.special)) if s
                    )
            return Term(
                keywords=keywords,
                field=primary.field,
                required=required,
                excluded=excluded,
                exact=primary.exact,
            )
        return primary

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input")
        kind, val = t
        if kind == "QUOTED":
            self.next()
            return Term(keywords=[val], exact=True)
        if kind == "IDENT":
            self.next()
            nxt = self.peek()
            if nxt and nxt[0] == _COLON:
                self.next()
                nxt2 = self.peek()
                if nxt2 and nxt2[0] == "IDENT":
                    self.next()
                    return Term(keywords=[nxt2[1]], field=val)
                if nxt2 and nxt2[0] == "QUOTED":
                    self.next()
                    return Term(keywords=[nxt2[1]], field=val, exact=True)
                return Term(keywords=[], field=val)
            return Term(keywords=[val])
        raise ParseError(f"unexpected token {t!r}")


def parse_query(text: str, exact: bool = False) -> ParseResult:
    """Parse a query; on lex/parse failure fall back like the reference."""
    if exact:
        return ParseResult(
            Term(keywords=[text], exact=True),
            frozenset({text.lower()}),
        )
    try:
        tokens = _lex(text)
    except ParseError:
        cleaned = "".join(
            c for c in text if c.isalnum() or c.isspace() or c in "_."
        )
        if not cleaned.strip():
            raise ParseError("no valid tokens found")
        keywords = [w.lower() for w in cleaned.split()]
        return ParseResult(Term(keywords=keywords), frozenset())
    parser = _Parser(tokens)
    try:
        ast = parser.parse_expr()
    except ParseError:
        idents = [v for k, v in tokens if k == "IDENT"]
        if not idents:
            raise ParseError("no valid identifiers found")
        return ParseResult(Term(keywords=idents), frozenset())
    return ParseResult(ast, frozenset(parser.special))


# --- AST utilities ---------------------------------------------------------


def walk_terms(expr: Expr):
    if isinstance(expr, Term):
        yield expr
    else:
        yield from walk_terms(expr.left)
        yield from walk_terms(expr.right)


def extract_query_terms(expr: Expr) -> set[str]:
    out: set[str] = set()
    for t in walk_terms(expr):
        out.update(t.keywords)
    return out


def has_required_term(expr: Expr) -> bool:
    return any(t.required for t in walk_terms(expr))


def is_only_excluded_terms(expr: Expr) -> bool:
    return all(t.excluded for t in walk_terms(expr))


def necessary_keywords(expr: Expr) -> set[str]:
    """Keywords every matching document MUST contain under eval_mask's
    no-required-terms semantics (Term matches iff ALL its keywords are
    present; And intersects; Or unions the match sets, so only keywords
    necessary on BOTH branches stay necessary). Valid only when the query
    has no required (+) terms — callers on the required path already have
    the stronger required_kws set. Excluded terms contribute nothing.

    Used by the searcher's conjunctive-anchor candidate generation: the
    min-df necessary keyword's postings are a complete candidate
    superset, so other hot terms need only targeted-block tf decodes."""
    if isinstance(expr, Term):
        return set() if expr.excluded else set(expr.keywords)
    if isinstance(expr, And):
        return necessary_keywords(expr.left) | necessary_keywords(expr.right)
    return necessary_keywords(expr.left) & necessary_keywords(expr.right)


def _all_required_present(
    expr: Expr, matched: set[int], term_indices: dict[str, int]
) -> bool:
    for t in walk_terms(expr):
        if t.required and not t.excluded:
            for kw in t.keywords:
                idx = term_indices.get(kw)
                if idx is None or idx not in matched:
                    return False
    return True


def evaluate(
    expr: Expr,
    matched: set[int],
    term_indices: dict[str, int],
    ignore_negatives: bool = False,
) -> bool:
    """evaluate() parity (elastic_query.rs:365-443)."""
    if not matched and not is_only_excluded_terms(expr):
        return False
    if ignore_negatives:
        for t in walk_terms(expr):
            if t.required and not t.excluded:
                for kw in t.keywords:
                    idx = term_indices.get(kw)
                    if idx is None or idx not in matched:
                        return False
    has_req = has_required_term(expr)
    if has_req and not ignore_negatives:
        if not _all_required_present(expr, matched, term_indices):
            return False
    return _eval(expr, matched, term_indices, ignore_negatives, has_req)


def _eval(
    expr: Expr,
    matched: set[int],
    term_indices: dict[str, int],
    ignore_negatives: bool,
    has_req: bool,
) -> bool:
    if isinstance(expr, Term):
        if not expr.keywords:
            return expr.excluded
        present = [
            (idx := term_indices.get(kw)) is not None and idx in matched
            for kw in expr.keywords
        ]
        if expr.excluded:
            return True if ignore_negatives else not any(present)
        if expr.required and ignore_negatives:
            return True
        if expr.required:
            return all(present)
        if has_req:
            return True
        if not any(present):
            return False
        return all(present)
    if isinstance(expr, And):
        return _eval(
            expr.left, matched, term_indices, ignore_negatives, has_req
        ) and _eval(expr.right, matched, term_indices, ignore_negatives, has_req)
    return _eval(
        expr.left, matched, term_indices, ignore_negatives, has_req
    ) or _eval(expr.right, matched, term_indices, ignore_negatives, has_req)
