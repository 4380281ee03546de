"""The round-3 vectorization of the per-row text ops (token counts,
stats, quality, lang-ID x2, fingerprint, curation filter) must be
output-identical to the scalar loops it replaced. Each test recomputes
the original scalar semantics in-line and compares on sf0.001 plus an
adversarial corpus (mixed case, unicode, empty/whitespace docs, exact
.5 rounding)."""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from probe_ray.ops import text as T

_WS = re.compile(r"\s+")
_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")

EDGE_DOCS = [
    (0, "", "en"),
    (1, "   \t\n ", "en"),
    (2, "The the THE der die und la le et", "de"),
    (3, "los de la ión que ent es el — y 123 f(x)*2", "es"),
    (4, "naïve café über straße 日本語テキスト", "fr"),
    (5, "a b c " * 120, "en"),  # >200 words: only the first 200 vote
    (6, "der ein ich sch die und " * 4, "de"),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vec_parity")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in EDGE_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in EDGE_DOCS]),
            "lang": pa.array([r[2] for r in EDGE_DOCS]),
            "source": pa.array(["web"] * len(EDGE_DOCS)),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return str(d)


def _texts(sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


DIRS = ["/root/testdata/sf0.001"]


@pytest.fixture(scope="module", params=["edge", "sf0.001"])
def corpus(request, edge_dir):
    return edge_dir if request.param == "edge" else DIRS[0]


def test_token_count(ray_session, corpus):
    texts = _texts(corpus)
    got = {r["doc_id"]: r["n_tokens"] for r in T.token_count(corpus).take_all()}
    for did, t in texts.items():
        want = len(_WS.split(t.strip())) if t.strip() else 0
        assert got[did] == want, (did, t[:40])


def test_token_count_bpeish(ray_session, corpus):
    texts = _texts(corpus)
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    got = {
        r["doc_id"]: r["n_pieces"]
        for r in T.token_count_bpeish(corpus).take_all()
    }
    for did, t in texts.items():
        assert got[did] == len(pat.findall(t)), (did, t[:40])


def test_text_stats(ray_session, corpus):
    texts = _texts(corpus)
    got = {r["doc_id"]: r for r in T.text_stats(corpus).take_all()}
    for did, t in texts.items():
        toks = _WS.split(t.strip()) if t.strip() else []
        r = got[did]
        assert r["n_chars_actual"] == len(t)
        assert r["alpha_chars"] == len(_ALPHA.findall(t))
        assert r["digit_chars"] == len(_DIGIT.findall(t))
        assert r["n_tokens"] == len(toks)
        assert r["uniq_tokens"] == len(set(toks))


def test_quality_score(ray_session, corpus):
    texts = _texts(corpus)
    got = {
        r["doc_id"]: r["quality_milli"]
        for r in T.quality_score(corpus).take_all()
    }
    for did, t in texts.items():
        toks = _WS.split(t.strip()) if t.strip() else []
        n, uniq, alpha = len(toks), len(set(toks)), len(_ALPHA.findall(t))
        ratio_u = uniq / n if n else 0.0
        ratio_a = alpha / len(t) if t else 0.0
        length_ok = 1.0 if n >= 20 else n / 20.0
        score = 1000 * (0.4 * ratio_u + 0.4 * ratio_a + 0.2 * length_ok)
        assert got[did] == int(np.floor(score + 0.5)), (did, t[:40])


def test_lang_id(ray_session, corpus):
    texts = _texts(corpus)
    got = {
        r["doc_id"]: r["lang_guess"] for r in T.lang_id(corpus).take_all()
    }
    for did, t in texts.items():
        toks = set(w.lower() for w in _WS.split(t.strip())[:200])
        best, best_n = "unknown", 0
        for lang, prof in T._LANG_PROFILES.items():
            hits = len(toks & prof)
            if hits > best_n:
                best, best_n = lang, hits
        assert got[did] == best, (did, t[:40])


def test_lang_id_ngram(ray_session, corpus):
    texts = _texts(corpus)
    profiles = [
        (lang, {g: len(grams) - i for i, g in enumerate(grams)})
        for lang, grams in T._NGRAM_PROFILES.items()
    ]
    got = {
        r["doc_id"]: r["lang_guess"]
        for r in T.lang_id_ngram(corpus).take_all()
    }
    for did, t in texts.items():
        t_low = t.lower()[:2000]
        grams = {t_low[i : i + 3] for i in range(max(0, len(t_low) - 2))}
        best, best_score = "unknown", 0
        for lang, prof in profiles:
            score = sum(w for g, w in prof.items() if g in grams)
            if score > best_score:
                best, best_score = lang, score
        assert got[did] == best, (did, t[:40])


def test_fingerprint(ray_session, corpus):
    texts = _texts(corpus)
    got = {r["doc_id"]: r["fp"] for r in T.fingerprint(corpus).take_all()}
    for did, t in texts.items():
        h = np.uint64(1469598103934665603)
        prime = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            for b in t.encode()[:4096]:
                h = (h ^ np.uint64(b)) * prime
        assert got[did] == int(h & np.uint64(0x7FFFFFFFFFFFFFFF)), did


def test_curation_pipeline(ray_session, corpus):
    texts_tbl = pq.read_table(os.path.join(corpus, "documents.parquet"))
    rows = texts_tbl.to_pylist()
    seen: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        if r["lang"] != "en":
            continue
        t = r["text"]
        toks = _WS.split(t.strip()) if t.strip() else []
        n, uniq, alpha = len(toks), len(set(toks)), len(_ALPHA.findall(t))
        ratio_u = uniq / n if n else 0.0
        ratio_a = alpha / len(t) if t else 0.0
        length_ok = 1.0 if n >= 20 else n / 20.0
        q = int(
            np.floor(
                1000 * (0.4 * ratio_u + 0.4 * ratio_a + 0.2 * length_ok) + 0.5
            )
        )
        if q < 600:
            continue
        sha = hashlib.sha256(t.encode()).hexdigest()
        seen.setdefault(sha, r["doc_id"])
    want = sorted(seen.values())
    got = [r["doc_id"] for r in T.curation_pipeline(corpus).take_all()]
    assert got == want
