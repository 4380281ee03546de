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


def make_rows(
    start: int, count: int, seed: int = 42, stmt_scale: int = 1
) -> pa.Table:
    """Rows [start, start+count) of the corpus — position-deterministic.
    ``stmt_scale`` multiplies statements per file (~1 KB × stmt_scale docs)
    for compute-dominated benchmarking."""
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
        com_idx = rng.choice(len(COMMON_WORDS), size=int(ncom.sum()), p=_ZIPF_P)
        # one statement per LINE: block extraction (search/blocks.py)
        # operates on line-heuristic context windows, so the corpus needs
        # real line structure (a single joined line would also trip the
        # reference's 500-char line cap and blank the whole doc)
        stmts: list[str] = []
        ci = 0
        for k in range(n_stmts):
            words = [SYNTAX[syn_idx[k]], IDENTIFIERS[ident_idx[k]]]
            for j in range(ncom[k]):
                words.append(COMMON_WORDS[com_idx[ci + j]])
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
