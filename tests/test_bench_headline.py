"""The driver records bench.py's stdout tail; rounds 3 and 4 lost the
bench artifact because the single giant JSON summary line got truncated
(BENCH_r04 parsed:null). bench.py now prints a short headline line LAST
— these tests pin that the line parses and stays small no matter how
many op rows the full map grows to."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import headline_line, HEADLINE_MAX_QUERIES  # noqa: E402


def _fake_full(n_ops: int) -> dict:
    return {
        "metric": "index build + reference query set + doc ops wall time",
        "value": 123.456,
        "unit": "sec",
        "queries": {
            f"some_long_operator_name_{i:04d}": round(0.001 * i, 4)
            for i in range(n_ops)
        },
        "sf": 0.1,
        "num_cpus": 32,
        "build_seconds": 2.041,
        "build_docs_per_sec": 9790.3,
        "build_mb_per_sec": 19.02,
        "query_p50": 0.0261,
        "corpus_rows": 20000,
        "effective_parallelism": 17.89,
    }


def test_headline_parses_and_is_small():
    for n_ops in (0, 8, 83, 500):
        line = json.dumps(headline_line(_fake_full(n_ops)))
        assert len(line) < 1024, (n_ops, len(line))
        back = json.loads(line)
        assert back["value"] == 123.456
        assert back["num_cpus"] == 32
        assert back["n_ops"] == n_ops
        assert len(back["queries"]) <= HEADLINE_MAX_QUERIES


def test_headline_keeps_slowest_ops():
    full = _fake_full(100)
    h = headline_line(full)
    # the slowest rows are the interesting ones for a truncated view
    kept = set(h["queries"])
    slowest = {
        k for k, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[
            :HEADLINE_MAX_QUERIES
        ]
    }
    assert kept == slowest


def test_headline_is_final_stdout_statement():
    """Source-level guard: the last print in main() must be the
    headline, so tail truncation can never eat it."""
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")
    ).read()
    main_body = src.split("def main(", 1)[1].split("\ndef ", 1)[0]
    last_print = main_body.rfind("print(")
    assert "headline_line" in main_body[last_print:last_print + 80]
