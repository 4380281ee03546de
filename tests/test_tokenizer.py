"""Tokenizer conformance fixtures (FIXTURES.md SS2; pinned from the
reference's own tests, tokenization.rs:2770-2953 and tests/)."""

from probe_ray.tokenize.stemmer import stem
from probe_ray.tokenize.tokenizer import (
    is_stop_word,
    split_camel_case,
    split_compound_word_for_filtering as scw,
    tokenize,
)


def test_split_camel_case():
    assert split_camel_case("camelCase") == ["camel", "case"]
    assert split_camel_case("PascalCase") == ["pascal", "case"]
    assert split_camel_case("parseJSONToHTML5") == ["parse", "json", "to", "html", "5"]
    assert split_camel_case("APIDefinition") == ["api", "definition"]
    assert split_camel_case("OAuth2Provider") == ["oauth2", "provider"]
    assert split_camel_case("typeIgnore") == ["type", "ignore"]
    assert split_camel_case("migrateEndpointMetaByType") == [
        "migrate", "endpoint", "meta", "by", "type",
    ]


def test_special_case_words_whole():
    assert split_camel_case("GraphQL") == ["graphql"]
    assert split_camel_case("PostgreSQL") == ["postgresql"]
    assert split_camel_case("whitelist") == ["whitelist"]


def test_lowercase_exception_split():
    # all-lowercase identifiers split around embedded exception terms
    assert split_camel_case("enablefirewallwhitelist")[0:2] == ["enable", "firewall"]


def test_stop_words():
    for w in ("func", "type", "struct", "fn", "impl", "mod", "return"):
        assert is_stop_word(w)
    for w in ("migrate", "endpoint"):
        assert not is_stop_word(w)
    for w in ("0", "5", "10", "the", "ing"):
        assert is_stop_word(w)
    assert not is_stop_word("11")


def test_tokenize_api_definition():
    t = tokenize("func (a *APIDefinition) MigrateEndpointMeta()")
    assert "api" in t and "definit" in t and "migrat" in t and "meta" in t
    assert "endpoint" in t or ("end" in t and "point" in t)
    assert "func" not in t


def test_tokenize_numbers_dropped():
    t = tokenize("func ParseJSONToHTML5()")
    assert "pars" in t and "json" in t and "html" in t and "5" not in t


def test_tokenize_compounds():
    t = tokenize("whitelist blackmail firewall")
    assert "whitelist" in t and "black" in t and "mail" in t and "firewall" in t


def test_tokenize_camel_compound():
    t = tokenize("enableFirewallWhitelist")
    assert "enabl" in t and "firewall" in t and "whitelist" in t


def test_compound_splits():
    assert scw("blackmail") == ["black", "mail"]
    assert scw("whitelist") == ["whitelist"]
    assert scw("computer") == ["computer"]
    assert scw("hashmap") == ["hash", "map"]
    assert scw("database") == ["data", "base"]
    assert scw("keyword") == ["key", "word"]


def test_exception_terms_keep_unstemmed_and_stemmed():
    t = tokenize("RPCStorageHandler")
    assert {"rpc", "storage", "storag", "handler"} <= set(t)


def test_dedup_first_appearance_order():
    t = tokenize("error error handling error")
    assert t == ["error", "handl"]
    # exception terms push both forms, still deduplicated
    t = tokenize("storage storage StorageStorage")
    assert t == ["storage", "storag"]


def test_negated_terms_excluded():
    t = tokenize("keep -dropme keep2")
    assert "dropme" not in t


def test_dynamic_special_terms():
    default = tokenize("JWTMiddleware")
    assert default == ["jwt", "middleware", "middlewar"]
    # dynamic special terms keep the token whole (no camel/compound split)
    # but it is still stemmed, matching the reference tokenize()
    # (tokenization.rs:2742-2758: only exception terms keep the raw form)
    special = tokenize("JWTMiddleware", frozenset({"jwtmiddleware"}))
    assert special == ["jwtmiddlewar"]
    special = tokenize("keywordAlpha", frozenset({"keywordalpha"}))
    assert special == ["keywordalpha"]


def test_stemmer_reference_pairs():
    pairs = [
        ("running", "run"), ("coding", "code"), ("searching", "search"),
        ("functions", "function"), ("calculation", "calcul"),
        ("definition", "definit"), ("migrate", "migrat"), ("parse", "pars"),
        ("ignore", "ignor"), ("enable", "enabl"), ("storage", "storag"),
        ("middleware", "middlewar"),
    ]
    for w, s in pairs:
        assert stem(w) == s, (w, stem(w), s)
    # pairs that must stem identically
    for a, b in [("run", "running"), ("code", "coding"), ("search", "searching"),
                 ("function", "functions"), ("calculate", "calculation")]:
        assert stem(a) == stem(b)


def test_tokenize_totality_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=80))
    def run(s):
        out = tokenize(s)
        assert isinstance(out, list)
        assert len(set(out)) == len(out)  # deduplicated

    run()


def test_reference_test_tokenize_rs_expectations():
    """Pinned from /root/reference/tests/test_tokenize.rs and
    tokenization_tests.rs (query preprocessing + multi-word query)."""
    from probe_ray.query.bm25 import create_query_plan

    terms = set(create_query_plan("RPCStorageHandler").term_indices)
    # camel split rpc/storage/handler; 'storage' is an exception term =>
    # both unstemmed and stemmed forms are indexed
    assert {"rpc", "storag", "handler"} <= terms

    t2 = set(create_query_plan("ip whitelist").term_indices)
    assert "ip" in t2
    assert ("whitelist" in t2) or ({"white", "list"} <= t2)

    assert tokenize("fruitlessly") == ["fruitless"]  # Snowball English
    assert tokenize(
        "class UserController extends BaseController implements UserInterface"
    ) == ["user", "controller", "control", "base"]
