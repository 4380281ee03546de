"""Distributed inverted-index build over Ray Data.

Architecture (SURVEY.md SS4.2, re-thought Ray-Data-first rather than a port
of the reference's per-query rayon scan, search_runner.rs:215-1560):

  input parquet fragments
    -> split deterministically into WAVES (the checkpoint/lineage unit)
    -> per wave:
       read_parquet(fragments)
         -> map_batches(TokenizeEmit, batch_format="pyarrow")   # stateless
              emits posting rows (subshard, term, salt, doc_hash, tf)
              and doc rows    (subshard, doc_hash, repo, path, commit,
                               lang, sha256, doc_len)
         -> written to an intermediate parquet (tokenize runs ONCE; the
            intermediate is also the wave's resume artifact)
       doc rows -> groupby(subshard) -> docstats files
              (docs sorted by doc_hash; row position = dense local id)
       posting rows -> groupby([subshard, term, salt])   # THE wide shuffle
              -> encode sorted partial runs (local ids via docmap lookup)
         -> groupby([subshard, term]) -> ordered merge of salted runs
              -> delta+varint payload + tf bitmap + block-max metadata
         -> postings parquet per (wave, subshard), sorted by term
       wave manifest {fragments, n_docs, n_tokens, per-subshard metrics,
                      status} written atomically -> re-runs skip done waves.

Skew: hot terms ("return", "fn", ... appear in ~every doc) are salted at
emit time when their batch-local document frequency exceeds
``hot_batch_frac`` of the batch, bounding any single shuffle group to
~1/salt_buckets of a subshard; the second, cheap groupby merges the sorted
runs (ordered merge, codec.merge_runs).

Doc ids: doc_hash = first 8 bytes of sha256(repo NUL path) masked to 63
bits; dense local id = rank of doc_hash within its (wave, subshard). Final
result ordering uses (score desc, repo asc, path asc), the distributed
equivalent of the reference's (score desc, doc index asc) over its sorted
file walk (ranking.rs:406-418, search_runner.rs:1697-1741).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from probe_ray.tokenize.tokenizer import preprocess_text_with_filename
from .codec import block_meta, encode_varint_deltas, merge_runs, pack_tf

DOC_ROW_TERM = ""  # tokenize() never emits an empty-string term


@dataclass
class IndexConfig:
    num_waves: int = 2
    subshards: int = 4  # per wave
    salt_buckets: int = 8
    hot_batch_frac: float = 0.25
    tokenize_batch_size: int = 256
    # Mirrors the reference's 1 MB file cap (search_runner.rs:1774) when set.
    max_content_bytes: int | None = None


def doc_hash64(repo: str, path: str) -> int:
    h = hashlib.sha256(f"{repo}\x00{path}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


class TokenizeEmit:
    """Stateless-per-batch tokenizer stage (actor pool for warm caches)."""

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        commits = batch.column("commit").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()
        n = len(repos)

        doc_hashes = np.empty(n, dtype=np.int64)
        doc_lens = np.empty(n, dtype=np.int32)
        shas: list[str] = []
        per_doc_tf: list[dict[str, int]] = []
        batch_df: dict[str, int] = {}
        for i in range(n):
            content = contents[i]
            if cfg.max_content_bytes is not None and len(content) > cfg.max_content_bytes:
                content = ""
            toks = preprocess_text_with_filename(content, paths[i])
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            per_doc_tf.append(tf)
            doc_lens[i] = len(toks)
            doc_hashes[i] = doc_hash64(repos[i], paths[i])
            shas.append(hashlib.sha256(contents[i].encode()).hexdigest())
            for t in tf:
                batch_df[t] = batch_df.get(t, 0) + 1

        hot_cut = max(2.0, cfg.hot_batch_frac * n)
        hot = {t for t, c in batch_df.items() if c >= hot_cut}

        sub = ((doc_hashes >> 32) % cfg.subshards).astype(np.int32)
        out_sub: list[int] = []
        out_term: list[str] = []
        out_salt: list[int] = []
        out_hash: list[int] = []
        out_tf: list[int] = []
        for i in range(n):
            dh = int(doc_hashes[i])
            s = int(sub[i])
            salt_of_doc = dh % cfg.salt_buckets
            for t, f in per_doc_tf[i].items():
                out_sub.append(s)
                out_term.append(t)
                out_salt.append(salt_of_doc if t in hot else 0)
                out_hash.append(dh)
                out_tf.append(f)

        n_post = len(out_term)
        nulls_str = pa.nulls(n_post, pa.string())
        nulls_i32 = pa.nulls(n_post, pa.int32())
        posting = pa.table(
            {
                "subshard": pa.array(out_sub, pa.int32()),
                "term": pa.array(out_term, pa.string()),
                "salt": pa.array(out_salt, pa.int32()),
                "doc_hash": pa.array(out_hash, pa.int64()),
                "tf": pa.array(out_tf, pa.int32()),
                "is_doc": pa.array(np.zeros(n_post, dtype=bool)),
                "repo": nulls_str,
                "path": nulls_str,
                "commit": nulls_str,
                "lang": nulls_str,
                "sha256": nulls_str,
                "doc_len": nulls_i32,
            }
        )
        docs = pa.table(
            {
                "subshard": pa.array(sub),
                "term": pa.array([DOC_ROW_TERM] * n, pa.string()),
                "salt": pa.array(np.zeros(n, dtype=np.int32)),
                "doc_hash": pa.array(doc_hashes),
                "tf": pa.array(np.zeros(n, dtype=np.int32)),
                "is_doc": pa.array(np.ones(n, dtype=bool)),
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(paths, pa.string()),
                "commit": pa.array(commits, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "sha256": pa.array(shas, pa.string()),
                "doc_len": pa.array(doc_lens),
            }
        )
        return pa.concat_tables([posting, docs])


# --- docmap cache (worker-process global; Ray reuses worker processes) -----

_DOCMAP_CACHE: dict[tuple[str, int, int], np.ndarray] = {}


def _docstats_path(out_dir: str, wave: int, subshard: int) -> str:
    return os.path.join(
        out_dir, "waves", f"w{wave:04d}", "docstats", f"sub-{subshard:04d}.parquet"
    )


def _load_docmap(out_dir: str, wave: int, subshard: int) -> np.ndarray:
    key = (out_dir, wave, subshard)
    hit = _DOCMAP_CACHE.get(key)
    if hit is None:
        t = pq.read_table(_docstats_path(out_dir, wave, subshard), columns=["doc_hash"])
        hit = t.column("doc_hash").to_numpy()
        if len(_DOCMAP_CACHE) > 64:
            _DOCMAP_CACHE.clear()
        _DOCMAP_CACHE[key] = hit
    return hit


def build_docstats_group(group: pa.Table, *, out_dir: str, wave: int) -> pa.Table:
    """One group = all docs of one (wave, subshard). Sort by doc_hash,
    write the docstats file atomically, return a metrics row."""
    sub = int(group.column("subshard")[0].as_py())
    order = pc.sort_indices(group, sort_keys=[("doc_hash", "ascending")])
    g = group.take(order)
    hashes = g.column("doc_hash").to_numpy()
    if len(np.unique(hashes)) != len(hashes):
        raise RuntimeError(
            f"doc_hash collision in wave {wave} subshard {sub}; "
            "widen the hash before indexing at this scale"
        )
    out = pa.table(
        {
            "doc_hash": g.column("doc_hash"),
            "repo": g.column("repo"),
            "path": g.column("path"),
            "commit": g.column("commit"),
            "lang": g.column("lang"),
            "sha256": g.column("sha256"),
            "doc_len": g.column("doc_len"),
        }
    )
    path = _docstats_path(out_dir, wave, sub)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    dl = g.column("doc_len").to_numpy()
    return pa.table(
        {
            "subshard": pa.array([sub], pa.int32()),
            "n_docs": pa.array([len(g)], pa.int64()),
            "n_tokens": pa.array([int(dl.sum())], pa.int64()),
            "min_dlen": pa.array([int(dl.min()) if len(dl) else 0], pa.int64()),
        }
    )


def encode_run_group(group: pa.Table, *, out_dir: str, wave: int) -> pa.Table:
    """One group = (subshard, term, salt): map doc_hash -> dense local id,
    sort, emit a raw sorted run (merged and compressed in the next stage)."""
    sub = int(group.column("subshard")[0].as_py())
    term = group.column("term")[0].as_py()
    salt = int(group.column("salt")[0].as_py())
    docmap = _load_docmap(out_dir, wave, sub)
    hashes = group.column("doc_hash").to_numpy()
    tfs = group.column("tf").to_numpy()
    local = np.searchsorted(docmap, hashes).astype(np.uint64)
    order = np.argsort(local, kind="stable")
    local = local[order]
    tfs = tfs[order]
    return pa.table(
        {
            "subshard": pa.array([sub], pa.int32()),
            "term": pa.array([term], pa.string()),
            "salt": pa.array([salt], pa.int32()),
            "n": pa.array([len(local)], pa.int64()),
            "ids": pa.array([local.tobytes()], pa.binary()),
            "tfs": pa.array([tfs.astype(np.uint8).tobytes()], pa.binary()),
        }
    )


def merge_posting_group(group: pa.Table, *, wave: int) -> pa.Table:
    """One group = (subshard, term): ordered merge of salted runs ->
    final compressed posting row with block-max metadata."""
    sub = int(group.column("subshard")[0].as_py())
    term = group.column("term")[0].as_py()
    runs = []
    ids_col = group.column("ids").to_pylist()
    tfs_col = group.column("tfs").to_pylist()
    for ids_b, tfs_b in zip(ids_col, tfs_col):
        runs.append(
            (
                np.frombuffer(ids_b, dtype=np.uint64),
                np.frombuffer(tfs_b, dtype=np.uint8),
            )
        )
    ids, tfs = merge_runs(runs)
    blk_last, blk_maxtf = block_meta(ids, tfs)
    return pa.table(
        {
            "wave": pa.array([wave], pa.int32()),
            "subshard": pa.array([sub], pa.int32()),
            "term": pa.array([term], pa.string()),
            "df": pa.array([len(ids)], pa.int64()),
            "max_tf": pa.array([int(tfs.max()) if len(tfs) else 0], pa.int32()),
            "payload": pa.array([encode_varint_deltas(ids)], pa.binary()),
            "tf_bits": pa.array([pack_tf(tfs)], pa.binary()),
            "blk_last": pa.array([blk_last], pa.binary()),
            "blk_maxtf": pa.array([blk_maxtf], pa.binary()),
        }
    )


# --- driver ----------------------------------------------------------------


def _wave_dir(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, "waves", f"w{wave:04d}")


def _read_json(path: str):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def _write_json_atomic(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def list_fragments(input_paths: list[str]) -> list[str]:
    files: list[str] = []
    for p in input_paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(p)
                for f in fs
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    return sorted(files)


def build_index(
    input_paths: list[str],
    out_dir: str,
    cfg: IndexConfig | None = None,
    fail_after_wave: int | None = None,
) -> dict:
    """Build (or resume) the index. ``fail_after_wave`` injects a failure
    after N completed waves (resume tests, FIXTURES.md SS6)."""
    import ray.data

    cfg = cfg or IndexConfig()
    files = list_fragments(input_paths)
    if not files:
        raise ValueError(f"no parquet fragments under {input_paths}")
    waves = [files[w :: cfg.num_waves] for w in range(cfg.num_waves)]
    waves = [w for w in waves if w]

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    done = 0
    for w, wave_files in enumerate(waves):
        wm_path = os.path.join(_wave_dir(out_dir, w), "wave_manifest.json")
        wm = _read_json(wm_path)
        if wm and wm.get("status") == "done" and wm.get("fragments") == wave_files:
            continue
        _build_wave(wave_files, out_dir, w, cfg)
        done += 1
        if fail_after_wave is not None and done >= fail_after_wave:
            raise RuntimeError(f"injected failure after {done} waves")

    # Global manifest from wave manifests.
    n_docs = n_tokens = 0
    min_dlen = None
    wave_entries = []
    for w in range(len(waves)):
        wm = _read_json(os.path.join(_wave_dir(out_dir, w), "wave_manifest.json"))
        assert wm and wm["status"] == "done"
        n_docs += wm["n_docs"]
        n_tokens += wm["n_tokens"]
        wmin = wm.get("min_dlen")
        if wmin is not None:
            min_dlen = wmin if min_dlen is None else min(min_dlen, wmin)
        wave_entries.append(wm)
    manifest = {
        "version": 1,
        "input_files": files,
        "config": asdict(cfg),
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
        "min_dlen": min_dlen or 0,
        "num_waves": len(waves),
        "waves": wave_entries,
        "build_seconds": time.time() - t0,
    }
    _write_json_atomic(os.path.join(out_dir, "manifest.json"), manifest)
    return manifest


def _build_wave(wave_files: list[str], out_dir: str, wave: int, cfg: IndexConfig):
    import ray.data

    wdir = _wave_dir(out_dir, wave)
    wm_path = os.path.join(wdir, "wave_manifest.json")
    wm = _read_json(wm_path) or {
        "wave": wave,
        "fragments": wave_files,
        "status": "building",
        "steps": {},
    }
    if wm.get("fragments") != wave_files:
        wm = {"wave": wave, "fragments": wave_files, "status": "building", "steps": {}}
    steps = wm["steps"]

    tok_dir = os.path.join(wdir, "tokenized")
    if steps.get("tokenized") != "done":
        ds = ray.data.read_parquet(
            wave_files, columns=["repo", "path", "commit", "lang", "content"]
        )
        out = ds.map_batches(
            TokenizeEmit(cfg),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.tokenize_batch_size,
            concurrency=None,
        )
        import shutil

        shutil.rmtree(tok_dir, ignore_errors=True)
        out.write_parquet(tok_dir)
        steps["tokenized"] = "done"
        _write_json_atomic(wm_path, wm)

    if steps.get("docstats") != "done":
        docs = ray.data.read_parquet(
            tok_dir,
            columns=[
                "subshard", "doc_hash", "repo", "path", "commit", "lang",
                "sha256", "doc_len",
            ],
            filter=pc.field("is_doc") == True,  # noqa: E712
        )
        import functools

        metrics = docs.groupby("subshard").map_groups(
            functools.partial(build_docstats_group, out_dir=out_dir, wave=wave),
            batch_format="pyarrow",
        )
        rows = metrics.take_all()
        wm["n_docs"] = int(sum(r["n_docs"] for r in rows))
        wm["n_tokens"] = int(sum(r["n_tokens"] for r in rows))
        wm["min_dlen"] = int(min((r["min_dlen"] for r in rows), default=0))
        wm["subshards"] = sorted(
            (
                {
                    "subshard": int(r["subshard"]),
                    "n_docs": int(r["n_docs"]),
                    "n_tokens": int(r["n_tokens"]),
                }
                for r in rows
            ),
            key=lambda x: x["subshard"],
        )
        steps["docstats"] = "done"
        _write_json_atomic(wm_path, wm)

    post_dir = os.path.join(wdir, "postings")
    if steps.get("postings") != "done":
        import functools
        import shutil

        posts = ray.data.read_parquet(
            tok_dir,
            columns=["subshard", "term", "salt", "doc_hash", "tf"],
            filter=pc.field("is_doc") == False,  # noqa: E712
        )
        runs = posts.groupby(["subshard", "term", "salt"]).map_groups(
            functools.partial(encode_run_group, out_dir=out_dir, wave=wave),
            batch_format="pyarrow",
        )
        merged = runs.groupby(["subshard", "term"]).map_groups(
            functools.partial(merge_posting_group, wave=wave),
            batch_format="pyarrow",
        )
        shutil.rmtree(post_dir, ignore_errors=True)
        merged.write_parquet(post_dir)
        steps["postings"] = "done"
        _write_json_atomic(wm_path, wm)

    wm["status"] = "done"
    _write_json_atomic(wm_path, wm)
