"""Sequence packing + deterministic shuffle-export (ops/export.py).

Oracle parity for the two queries() entries lives in test_ops_oracle.py;
here: invariants the oracle can't see (conservation, determinism, the
shard-partitioned writer layout, range-boundary behavior)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _table(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables([pa.table(b) for b in batches])


def test_pack_sequences_conservation(ray_session):
    """Every doc's tokens land exactly once; every sequence except the
    last is exactly full; slices within a doc are contiguous."""
    from probe_ray.ops import export
    from probe_ray.ops.text import token_count

    t = _table(export.pack_sequences(SF_DIR))
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in _table(token_count(SF_DIR)).to_pylist()
    }
    got = {}
    for r in t.to_pylist():
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["n_toks"]
        assert 0 < r["n_toks"] <= export.PACK_BUDGET
        assert 0 <= r["seq_off"] < export.PACK_BUDGET
    assert got == {d: n for d, n in counts.items() if n > 0}

    seq_fill = {}
    for r in t.to_pylist():
        seq_fill[r["seq_id"]] = seq_fill.get(r["seq_id"], 0) + r["n_toks"]
    last = max(seq_fill)
    assert all(
        n == export.PACK_BUDGET for s, n in seq_fill.items() if s != last
    )
    assert set(seq_fill) == set(range(last + 1))


def test_pack_sequences_range_size_invariance(ray_session):
    """The packing is a pure function of (corpus, budget) — the
    distributed range decomposition must not leak into the result."""
    from probe_ray.ops import export

    a = _table(export.pack_sequences(SF_DIR, range_size=128)).to_pylist()
    b = _table(export.pack_sequences(SF_DIR, range_size=37)).to_pylist()
    assert a == b


def test_shuffle_export_is_permutation(ray_session):
    from probe_ray.ops import export

    t = _table(export.shuffle_export(SF_DIR)).to_pylist()
    assert sorted(r["doc_id"] for r in t) == list(range(len(t)))
    by_shard: dict[int, list[int]] = {}
    for r in t:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # seeded: a different seed produces a different order, same coverage
    t2 = _table(export.shuffle_export(SF_DIR, seed=991)).to_pylist()
    assert sorted(r["doc_id"] for r in t2) == sorted(r["doc_id"] for r in t)
    assert t2 != t


def test_write_shuffle_shards_layout(ray_session, tmp_path):
    """Writer produces one Hive directory per shard whose (doc_id, pos)
    rows equal shuffle_export's mapping, carrying the text payload."""
    from probe_ray.ops import export

    out = str(tmp_path / "shards")
    result = export.write_shuffle_shards(SF_DIR, out, n_shards=4)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == 4
    assert sum(result.values()) == 500

    expect = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in _table(export.shuffle_export(SF_DIR, n_shards=4)).to_pylist()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pylist()
    }
    n = 0
    for d in dirs:
        shard = int(os.path.basename(d).split("=")[1])
        rows = pq.read_table(d).to_pylist()
        for r in rows:
            assert expect[(shard, r["pos"])] == r["doc_id"]
            assert texts[r["doc_id"]] == r["text"]
            n += 1
    assert n == 500


def test_budget_select_all_ties(ray_session, tmp_path):
    """Every doc in a source has the same n_chars, so the whole budget
    decision happens on the tie path: k = ceil(budget / v) smallest
    doc_ids win. Brute-force greedy is the oracle."""
    from probe_ray.ops import export

    rows = []
    for s, v, n in (("a", 100, 60), ("b", 250, 40), ("c", 7000, 3)):
        for i in range(n):
            rows.append((len(rows), s, v))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array(["x" * r[2] for r in rows], pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    def brute(budget):
        out = set()
        for s in ("a", "b", "c"):
            docs = sorted(
                (r for r in rows if r[1] == s),
                key=lambda r: (-r[2], r[0]),
            )
            cum = 0
            for did, _s, v in docs:
                if cum < budget:
                    out.add(did)
                cum += v
        return out

    for budget in (4000, 100, 10**9):
        got = {
            r["doc_id"]
            for r in _table(
                export.budget_select(str(tmp_path), budget=budget)
            ).to_pylist()
        }
        assert got == brute(budget), budget


def test_budget_select_bucket_width_invariance(ray_session):
    """The selection is a pure function of (corpus, budget); the coarse
    histogram width must not leak into the result."""
    from probe_ray.ops import export

    a = _table(export.budget_select(SF_DIR, coarse_width=64)).to_pylist()
    b = _table(export.budget_select(SF_DIR, coarse_width=7)).to_pylist()
    assert a == b and len(a) > 0


def test_mix_hash_matches_python_ints():
    """The numpy uint64 path must equal arbitrary-precision integer math
    even for doc_ids near 2^63 (no silent wrap in the products)."""
    from probe_ray.ops.export import MIX_A, MIX_B, MIX_P, _mix_hash

    ids = np.array(
        [0, 1, 499, 2**31, 2**32 - 1, 2**32, 2**62, 2**63 - 1],
        dtype=np.int64,
    )
    got = _mix_hash(ids, 177)
    for x, h in zip(ids.tolist(), got.tolist()):
        lo, hi = x & 0xFFFFFFFF, x >> 32
        assert h == ((MIX_A * lo) % MIX_P + (MIX_B * hi) % MIX_P + 177) % MIX_P


def test_seq_stats_budget_invariant(ray_session):
    """Every interior packed sequence holds exactly PACK_BUDGET tokens;
    only the final sequence may be partial."""
    from probe_ray.ops.export import PACK_BUDGET, seq_stats

    t = _table(seq_stats("/root/testdata/sf0.001"))
    toks = t.column("n_toks").to_pylist()
    assert len(toks) > 1
    assert all(v == PACK_BUDGET for v in toks[:-1])
    assert 0 < toks[-1] <= PACK_BUDGET


def test_write_packed_shards_layout(ray_session, tmp_path):
    """Packed-shard writer: one Hive directory per seq_id % n_shards,
    rows exactly equal to curated_pack's output."""
    from probe_ray.ops import export

    out = str(tmp_path / "packed")
    result = export.write_packed_shards(SF_DIR, out, n_shards=4)
    expect = _table(export.curated_pack(SF_DIR)).to_pylist()
    assert sum(result.values()) == len(expect)
    want = {(r["doc_id"], r["seq_id"]): (r["seq_off"], r["n_toks"]) for r in expect}
    got = {}
    for d in sorted(glob.glob(os.path.join(out, "shard=*"))):
        shard = int(os.path.basename(d).split("=")[1])
        for r in pq.read_table(d).to_pylist():
            assert r["seq_id"] % 4 == shard
            got[(r["doc_id"], r["seq_id"])] = (r["seq_off"], r["n_toks"])
    assert got == want


def test_pack_by_lang_sparse_doc_ids(ray_session, tmp_path):
    """Sparse/offset doc_ids must not collide across languages: the
    composite key's range bound comes from max(doc_id), not the row
    count (round-3 advisory — a doc_id >= n_docs + 2*range_size used to
    spill its range index into the next language's key space and merge
    token streams). Packing is a pure function of per-language doc ORDER
    and token counts, so the sparse corpus must pack identically to the
    same corpus with dense ids."""
    from probe_ray.ops import export

    texts = ["a b c", "d e f g", "h i", "j k l m n"]
    langs = ["en", "de", "en", "de"]
    sparse_ids = [0, 5, 100_000, 100_001]
    dense_ids = [0, 1, 2, 3]
    for name, ids in [("sparse", sparse_ids), ("dense", dense_ids)]:
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "lang": pa.array(langs, pa.string()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
    remap = dict(zip(sparse_ids, dense_ids))
    sp = [
        {**r, "doc_id": remap[r["doc_id"]]}
        for r in _table(
            export.pack_sequences_by_lang(str(tmp_path / "sparse"), budget=4)
        ).to_pylist()
    ]
    de = _table(
        export.pack_sequences_by_lang(str(tmp_path / "dense"), budget=4)
    ).to_pylist()
    key = lambda r: (r["lang"], r["seq_id"], r["doc_id"])
    assert sorted(sp, key=key) == sorted(de, key=key)
    assert len(de) > 0


def test_tar_shards_resume_and_byte_determinism(ray_session, tmp_path):
    """write_tar_shards: per-shard resume (a committed shard's tar is
    not rewritten; a deleted shard is rebuilt byte-identically) and
    byte-determinism (mtime=0, doc_id member order => stable sha256)."""
    import glob
    import os

    from probe_ray.ops.export import write_tar_shards

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "tars")
    m1 = write_tar_shards(sf, out_dir=out, n_shards=4)
    tars = sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    assert len(tars) == 4 and m1.num_rows == 4
    shas = {p: open(p + ".done").read() for p in tars}
    mtimes = {p: os.stat(p).st_mtime_ns for p in tars}

    # delete one shard; rerun rebuilds ONLY it, byte-identical
    victim = tars[1]
    os.remove(victim)
    os.remove(victim + ".done")
    m2 = write_tar_shards(sf, out_dir=out, n_shards=4)
    assert m2.equals(m1)
    for p in tars:
        if p == victim:
            assert open(p + ".done").read() == shas[p]  # same bytes
        else:
            assert os.stat(p).st_mtime_ns == mtimes[p]  # untouched

    # tar members pair .txt/.json per doc, in doc_id order
    import tarfile

    with tarfile.open(tars[0]) as tf:
        names = tf.getnames()
    # per doc: .txt then .json, docs in ascending doc_id order
    keys = [n.rsplit(".", 1)[0] for n in names]
    assert keys[0::2] == keys[1::2] == sorted(set(keys))
    assert all(n.endswith(".txt") for n in names[0::2])
    assert all(n.endswith(".json") for n in names[1::2])


def test_tar_shards_stale_sidecar_rebuilds(ray_session, tmp_path):
    """Resume must validate the .done fingerprint against the CURRENT
    group: rerunning into the same out_dir with different params (or a
    pre-fingerprint/corrupt sidecar) rebuilds the shard instead of
    keeping stale tar bytes under a fresh manifest (ADVICE r4)."""
    import json as _json
    import os
    import tarfile

    from probe_ray.ops.export import write_tar_shards

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "tars")
    write_tar_shards(sf, out_dir=out, n_shards=4)
    s0 = os.path.join(out, "shard-00000.tar")
    old_mtime = os.stat(s0).st_mtime_ns
    side = _json.loads(open(s0 + ".done").read())
    assert {"sha256", "fingerprint"} <= set(side)

    # params changed: shard 0 now holds doc_id % 2 == 0 docs — the old
    # tar must be replaced, and the manifest must match the new bytes
    m2 = write_tar_shards(sf, out_dir=out, n_shards=2)
    assert os.stat(s0).st_mtime_ns != old_mtime
    with tarfile.open(s0) as tf:
        n_txt = sum(1 for n in tf.getnames() if n.endswith(".txt"))
    got = {int(r["shard"]): int(r["n_docs"]) for r in m2.to_pylist()}
    assert n_txt == got[0]

    # legacy bare-hex sidecar (pre-fingerprint) is treated as stale
    with open(s0 + ".done", "w") as fh:
        fh.write(side["sha256"] if isinstance(side, dict) else "deadbeef")
    m3 = write_tar_shards(sf, out_dir=out, n_shards=2)
    assert m3.equals(m2)
    assert _json.loads(open(s0 + ".done").read())["fingerprint"]
