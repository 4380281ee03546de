"""MCP-analog stdio server (probe_ray/server.py) — the engine's answer
to the reference MCP surface (mcp/src/index.ts:153-330).

Handler-level tests exercise the full JSON-RPC dict -> dict path with a
real corpus + pre-built index; one subprocess test pins the stdio
framing (initialize / tools list need no Ray, so it stays fast)."""

import json
import subprocess
import sys

import pytest

from probe_ray.server import McpServer, serve_stdio  # noqa: F401


def rpc(method, params=None, req_id=1):
    req = {"jsonrpc": "2.0", "id": req_id, "method": method}
    if params is not None:
        req["params"] = params
    return req


def call(server, name, arguments, req_id=7):
    return server.handle(
        rpc("tools/call", {"name": name, "arguments": arguments}, req_id)
    )


def text_of(resp):
    assert "error" not in resp, resp
    assert not resp["result"].get("isError"), resp
    return resp["result"]["content"][0]["text"]


@pytest.fixture(scope="module")
def server(ray_session, small_corpus, built_index, tmp_path_factory):
    s = McpServer(cache_dir=str(tmp_path_factory.mktemp("mcp_cache")))
    s.handle(rpc("initialize", {"protocolVersion": "2024-11-05"}))
    # pre-register the built index for the corpus so most tests skip
    # the on-demand build (the build path gets its own test below)
    index_dir, _ = built_index
    s._built[small_corpus] = index_dir
    return s


def test_initialize_and_tools_list():
    s = McpServer()
    resp = s.handle(rpc("initialize", {"protocolVersion": "2024-11-05"}))
    assert resp["result"]["serverInfo"]["name"] == "probe-ray-mcp"
    assert s.initialized
    # notifications produce no response
    assert s.handle(rpc("notifications/initialized")) is None
    tools = s.handle(rpc("tools/list"))["result"]["tools"]
    assert [t["name"] for t in tools] == [
        "search_code", "query_code", "extract_code",
    ]
    for t in tools:
        assert t["inputSchema"]["type"] == "object"
        assert "path" in t["inputSchema"]["required"]


def test_unknown_method_and_tool_and_bad_request():
    s = McpServer()
    assert s.handle(rpc("nope"))["error"]["code"] == -32601
    bad = s.handle(
        rpc("tools/call", {"name": "nope", "arguments": {}})
    )
    assert bad["error"]["code"] == -32601
    assert s.handle({"id": 1, "method": "x"})["error"]["code"] == -32600
    assert s.handle(rpc("ping"))["result"] == {}


def test_search_code_markdown_and_json(server, small_corpus):
    out = text_of(
        call(server, "search_code",
             {"path": small_corpus, "query": "binary search"})
    )
    assert out.startswith("# binary search")
    assert "File:" in out

    js = json.loads(
        text_of(
            call(server, "search_code",
                 {"path": small_corpus, "query": "binary search",
                  "format": "json", "maxResults": 3})
        )
    )
    assert 0 < len(js["results"]) <= 3
    # search results carry code attached from the corpus
    assert all(r["code"] for r in js["results"])


def test_search_code_matches_index_reader(server, small_corpus, built_index):
    """The server path returns the same ranking as a direct
    IndexReader.search_many over the same index."""
    from probe_ray.search.searcher import IndexReader

    js = json.loads(
        text_of(
            call(server, "search_code",
                 {"path": small_corpus, "query": "merge AND sort",
                  "format": "json"})
        )
    )
    rd = IndexReader(built_index[0])
    want = rd.search_many({"q": "merge AND sort"}, k=10)["q"]
    got = [r["file"] for r in js["results"]]
    ref = [f"{r['repo']}/{r['path']}" for r in want.to_pylist()]
    assert got == ref
    rd.close()


def test_search_code_files_only_and_filters(server, small_corpus):
    out = text_of(
        call(server, "search_code",
             {"path": small_corpus, "query": "binary search",
              "filesOnly": True})
    )
    lines = out.splitlines()
    assert lines and len(set(lines)) == len(lines)
    bad = call(server, "search_code",
               {"path": small_corpus, "query": "x",
                "filters": {"nope": "y"}})
    assert bad["error"]["code"] == -32602


def test_search_code_query_list_is_anded(server, small_corpus):
    one = text_of(
        call(server, "search_code",
             {"path": small_corpus, "query": "merge AND sort",
              "format": "json"})
    )
    lst = text_of(
        call(server, "search_code",
             {"path": small_corpus, "query": ["merge", "sort"],
              "format": "json"})
    )
    assert json.loads(one)["results"] == json.loads(lst)["results"]


def test_query_code(server, small_corpus):
    js = json.loads(
        text_of(
            call(server, "query_code",
                 {"path": small_corpus, "pattern": "fn $NAME",
                  "maxResults": 5})
        )
    )
    assert 0 < len(js) <= 5
    assert all("captures" in m and "matched_text" in m for m in js)


def test_extract_code(server, small_corpus, corpus_rows):
    path0 = corpus_rows.column("path").to_pylist()[0]
    js = json.loads(
        text_of(
            call(server, "extract_code",
                 {"path": small_corpus, "files": [f"{path0}:1-3"],
                  "format": "json"})
        )
    )
    assert js and all(r["path"] == path0 for r in js)
    md = text_of(
        call(server, "extract_code",
             {"path": small_corpus, "files": [f"{path0}:1-3"]})
    )
    assert md.startswith("## ") and "```" in md


def test_tool_error_is_mcp_error_result(server):
    resp = call(server, "search_code",
                {"path": "/nonexistent/corpus", "query": "x"})
    assert resp["error"]["code"] == -32602  # ValueError -> invalid params


def test_on_demand_index_build_and_reuse(
    ray_session, small_corpus, tmp_path_factory
):
    """A server with an empty cache builds the index on first call and
    reuses it (same index_dir object) on the second."""
    s = McpServer(cache_dir=str(tmp_path_factory.mktemp("mcp_cache2")))
    a = text_of(
        call(s, "search_code",
             {"path": small_corpus, "query": "binary search",
              "format": "json"})
    )
    assert len(s._readers) == 1
    first_reader = next(iter(s._readers.values()))
    b = text_of(
        call(s, "search_code",
             {"path": small_corpus, "query": "binary search",
              "format": "json"})
    )
    assert a == b
    assert next(iter(s._readers.values())) is first_reader


def test_stdio_roundtrip():
    """Framing smoke test over a real subprocess: initialize +
    tools/list (no Ray, no index)."""
    reqs = "\n".join(
        json.dumps(r)
        for r in [
            rpc("initialize", {"protocolVersion": "2024-11-05"}, 1),
            rpc("notifications/initialized"),
            rpc("tools/list", None, 2),
            {"garbage": True},
        ]
    )
    p = subprocess.run(
        [sys.executable, "-m", "probe_ray", "serve"],
        input=reqs + "\n",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert p.returncode == 0, p.stderr
    resps = [json.loads(l) for l in p.stdout.splitlines() if l.strip()]
    assert len(resps) == 3  # notification produced no response
    by_id = {r.get("id"): r for r in resps}
    assert by_id[1]["result"]["serverInfo"]["name"] == "probe-ray-mcp"
    assert len(by_id[2]["result"]["tools"]) == 3
    assert by_id[None]["error"]["code"] == -32600
