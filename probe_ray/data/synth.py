"""Deterministic synthetic source-code corpus (FIXTURES.md SS1).

Generates the Parquet table of shape (repo:string, path:string,
commit:string, lang:string, content:string) required by BASELINE.json's
input_hint, at arbitrary scale, fully deterministically (seeded per row, so
any shard of rows is reproducible independently — the generator itself is
parallelizable through Ray without coordination).

Content mixes:
  - identifiers that exercise the tokenizer (camelCase, acronyms, special
    cases, compounds),
  - programming stop words as syntax (must NOT become index terms),
  - Zipfian common-word distribution so hot terms appear in ~every row
    (exercises the salted posting-skew path),
  - rare marker terms unique to few docs (IDF spread),
  - a per-row unique salt token (distinct sha256 per row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = [
    "rust", "javascript", "typescript", "python", "go", "c", "cpp",
    "java", "ruby", "php", "swift", "csharp",
]
EXT = {
    "rust": "rs", "javascript": "js", "typescript": "ts", "python": "py",
    "go": "go", "c": "c", "cpp": "cpp", "java": "java", "ruby": "rb",
    "php": "php", "swift": "swift", "csharp": "cs",
}

IDENTIFIERS = [
    "camelCase", "PascalCase", "parseJSONToHTML5", "APIDefinition",
    "OAuth2Provider", "RPCStorageHandler", "migrateEndpointMetaByType",
    "enableFirewallWhitelist", "httpHandler", "blackmail", "whitelist",
    "firewall", "hashmap", "database", "keyword", "ip_whitelist",
    "snake_case_value", "sha256", "base64", "html5", "JWTMiddleware",
    "setTools", "errorHandler", "loginService", "authenticationToken",
    "processData", "loadConfig", "apiClient", "jsonParser", "yamlLoader",
    "workflowEngine", "multiAgentRunner", "userInputValidator", "sqliteDriver",
]

COMMON_WORDS = [
    "error", "handling", "login", "authentication", "auth", "exception",
    "handle", "process", "api", "load", "data", "config", "ip", "port",
    "server", "client", "request", "response", "cache", "queue", "token",
    "user", "input", "yaml", "workflow", "agent", "multi", "search",
    "index", "query", "result", "stream", "batch", "write", "read",
]

SYNTAX = [
    "fn", "return", "struct", "impl", "let", "const", "if", "else", "for",
    "while", "func", "var", "class", "public", "static", "async", "await",
]

RARE = [
    "fibonacci", "quaternion", "levenshtein", "mandelbrot", "voronoi",
    "bresenham", "karatsuba", "hilbert", "chebyshev", "lagrange",
    "sqlite", "kafka", "zookeeper", "raft", "paxos", "gossip",
]

NUM_REPOS = 8
# bump when generated content changes — consumers key caches on this
CORPUS_VERSION = 2
_ZIPF_W = 1.0 / np.arange(1, len(COMMON_WORDS) + 1) ** 0.9
_ZIPF_P = _ZIPF_W / _ZIPF_W.sum()


def _commit(repo: str) -> str:
    return hashlib.sha1(f"{repo}@snapshot".encode()).hexdigest()


# ---- Zipfian large-vocabulary mode (zipf_vocab > 0) ------------------------
# The default 35-word COMMON_WORDS pool makes every common word df ~= N,
# which neutralizes block-max pruning (the round-3 10M-doc rehearsal's
# bottleneck #2 — a corpus property, not an index property). zipf_vocab
# switches the common-word draws to a ``zipf_vocab``-word vocabulary with
# P(rank k) ~ 1/k^s, so query terms span the real df spectrum (rank 1 ~= N,
# rank 10k ~= thousands) and the rare-anchored WAND path engages.

_CONS = "bcdfghjklmnpqrstvwxz"  # vowel-free => inert under the stemmer
_zipf_cache: dict[tuple[int, float], tuple[np.ndarray, list[str]]] = {}


def zipf_word(rank: int) -> str:
    """Deterministic vocabulary word for 0-based ``rank``: 'qz' + base-20
    consonant encoding. All-lowercase, all-alpha, length >= 3 — survives
    the tokenizer whole, never stems, never collides with COMMON_WORDS."""
    s = []
    r = rank
    while True:
        s.append(_CONS[r % 20])
        r //= 20
        if r == 0:
            break
    return "qz" + "".join(s)


def _zipf_tables(vocab: int, s: float) -> tuple[np.ndarray, list[str]]:
    key = (vocab, s)
    hit = _zipf_cache.get(key)
    if hit is None:
        w = 1.0 / np.arange(1, vocab + 1, dtype=np.float64) ** s
        cdf = np.cumsum(w / w.sum())
        words = [zipf_word(r) for r in range(vocab)]
        hit = _zipf_cache[key] = (cdf, words)
    return hit


def make_rows(
    start: int,
    count: int,
    seed: int = 42,
    stmt_scale: int = 1,
    zipf_vocab: int = 0,
    zipf_s: float = 1.07,
) -> pa.Table:
    """Rows [start, start+count) of the corpus — position-deterministic.
    ``stmt_scale`` multiplies statements per file (~1 KB × stmt_scale docs)
    for compute-dominated benchmarking. ``zipf_vocab`` > 0 draws the
    common words from a Zipf(s)-distributed synthetic vocabulary of that
    size instead of the 35-word COMMON_WORDS pool (see zipf_word)."""
    ztables = _zipf_tables(zipf_vocab, zipf_s) if zipf_vocab > 0 else None
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(start, start + count):
        rng = np.random.default_rng((seed << 32) ^ i)
        repo = f"org{i % NUM_REPOS // 4}/repo{i % NUM_REPOS}"
        lang = LANGS[int(rng.integers(len(LANGS)))]
        depth = int(rng.integers(1, 4))
        dirs = "/".join(
            rng.choice(["src", "lib", "core", "internal", "pkg", "api", "util"])
            for _ in range(depth)
        )
        fname = (
            f"{rng.choice(['main','handler','service','parser','config','auth','index','worker'])}"
            f"_{i}.{EXT[lang]}"
        )
        path = f"{dirs}/{fname}"
        n_stmts = int(rng.integers(5, 40)) * stmt_scale
        # vectorized draws (one rng call per distribution per doc — a
        # per-statement rng.choice loop is ~100x slower at stmt_scale>1)
        syn_idx = rng.integers(len(SYNTAX), size=n_stmts)
        ident_idx = rng.integers(len(IDENTIFIERS), size=n_stmts)
        ncom = rng.integers(1, 5, size=n_stmts)
        if ztables is not None:
            cdf, zwords = ztables
            # inverse-CDF sampling: one uniform draw + searchsorted per
            # word (rng.choice rebuilds its sampler per call at 100k+
            # categories)
            com_idx = np.searchsorted(cdf, rng.random(int(ncom.sum())))
            com_pool: list[str] = zwords
        else:
            com_idx = rng.choice(
                len(COMMON_WORDS), size=int(ncom.sum()), p=_ZIPF_P
            )
            com_pool = COMMON_WORDS
        # one statement per LINE: block extraction (search/blocks.py)
        # operates on line-heuristic context windows, so the corpus needs
        # real line structure (a single joined line would also trip the
        # reference's 500-char line cap and blank the whole doc)
        stmts: list[str] = []
        ci = 0
        for k in range(n_stmts):
            words = [SYNTAX[syn_idx[k]], IDENTIFIERS[ident_idx[k]]]
            for j in range(ncom[k]):
                words.append(com_pool[com_idx[ci + j]])
            ci += int(ncom[k])
            stmts.append(" ".join(words))
        if rng.random() < 0.08:
            stmts.append(RARE[int(rng.integers(len(RARE)))])
        stmts.append(f"salt_{seed}_{i}_{rng.integers(2**31)}")
        content = "\n".join(stmts)
        repos.append(repo)
        paths.append(path)
        commits.append(_commit(repo))
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    num_rows: int,
    num_files: int = 8,
    seed: int = 42,
    stmt_scale: int = 1,
) -> list[str]:
    """Write the corpus as ``num_files`` parquet files; returns file paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (num_rows + num_files - 1) // num_files
    start = 0
    for f in range(num_files):
        count = min(per, num_rows - start)
        if count <= 0:
            break
        p = os.path.join(out_dir, f"part-{f:05d}.parquet")
        # row-group-splittable files (see bench._corpus)
        pq.write_table(
            make_rows(start, count, seed, stmt_scale), p, row_group_size=2048
        )
        paths.append(p)
        start += count
    return paths


# -- documents-shaped corpus (training-data curation rehearsals) -------------
# Same five columns as the driver's documents.parquet (doc_id, text, lang,
# source, n_chars), generated position-deterministically so any file
# partitioning yields identical docs. Content is built for the curation
# ops: per-language stopword signal for lang_id, unique/alpha-ratio spread
# for quality_score, exact duplicates every ``dup_every`` docs for dedup,
# and a planted benchmark 8-gram so decontaminate has real hits.

DOC_LANGS = ["en", "fr", "es", "de", "zh"]
_DOC_LANG_CDF = np.cumsum([0.40, 0.16, 0.16, 0.14, 0.14])
_DOC_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "en", "que"],
    "zh": ["de", "shi", "bu", "le", "ren", "wo", "you", "ta", "zhe"],
}
# the planted benchmark phrase: appears in every doc_id < 32 (the
# curated_pack benchmark prefix) and in every ``contam_every``-th doc,
# so decontamination removes a measurable, deterministic fraction
DOC_BENCH_PHRASE = (
    "omega sigma lattice quorum vector raft ledger beacon".split()
)
_zipf_obj_cache: dict[tuple[int, float], np.ndarray] = {}


def _doc_words(
    i: int, seed: int, ztables, dup_every: int, contam_every: int
) -> tuple[str, list[str]]:
    rng = np.random.default_rng((seed << 32) ^ (0x5EED0000 + i))
    lang = DOC_LANGS[int(np.searchsorted(_DOC_LANG_CDF, rng.random()))]
    n = int(np.clip(np.exp(rng.normal(4.1, 0.8)), 8, 1200))
    kind = rng.random(n)
    stop_pool = np.array(_DOC_STOPWORDS[lang], dtype=object)
    stop_arr = stop_pool[rng.integers(len(stop_pool), size=n)]
    top_arr = np.array(COMMON_WORDS, dtype=object)[
        rng.integers(len(COMMON_WORDS), size=n)
    ]
    if ztables is not None:
        cdf, zwords = ztables
        key = (len(zwords), 0.0)
        zobj = _zipf_obj_cache.get(key)
        if zobj is None:
            zobj = _zipf_obj_cache[key] = np.array(zwords, dtype=object)
        z_arr = zobj[np.searchsorted(cdf, rng.random(n))]
    else:
        z_arr = top_arr
    words = np.where(
        kind < 0.30, stop_arr, np.where(kind < 0.55, top_arr, z_arr)
    ).tolist()
    if rng.random() < 0.22:  # repetitive docs: low unique-token ratio,
        words = (words[:12] * (n // 12 + 1))[:n]  # fails quality >= 600
    if rng.random() < 0.15:  # digit tokens: alpha-ratio spread
        words.append(str(int(rng.integers(10**6))))
    if i < 32 or (contam_every and i % contam_every == 0 and i >= 32):
        words.extend(DOC_BENCH_PHRASE)
    return lang, words


def make_documents(
    start: int,
    count: int,
    seed: int = 7,
    zipf_vocab: int = 50_000,
    zipf_s: float = 1.07,
    dup_every: int = 97,
    contam_every: int = 211,
) -> pa.Table:
    """Rows [start, start+count) of the documents corpus —
    position-deterministic (same doc for the same doc_id under any file
    split). Every ``dup_every``-th doc repeats the TEXT of the doc
    ``dup_every//2`` earlier (exact-dedup fodder; its own lang/source)."""
    ztables = _zipf_tables(zipf_vocab, zipf_s) if zipf_vocab > 0 else None
    ids, texts, langs, sources = [], [], [], []
    for i in range(start, start + count):
        lang, words = _doc_words(i, seed, ztables, dup_every, contam_every)
        if dup_every and i % dup_every == 0 and i >= dup_every:
            _, words = _doc_words(
                i - dup_every // 2, seed, ztables, dup_every, contam_every
            )
        ids.append(i)
        texts.append(" ".join(words))
        langs.append(lang)
        sources.append(f"src{i % 20}")
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    import pyarrow.compute as pc

    return t.append_column(
        "n_chars", pc.utf8_length(t.column("text")).cast(pa.int64())
    )
