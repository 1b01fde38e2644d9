"""Golden tests for F15 suffix split (/root/reference/format/format_test.go:13-31
and format.go:99-118 semantics) and the deterministic alpha-key functions."""

from __future__ import annotations

import pyarrow as pa

from elasticsearch_data_loader_ray.functions.alphakey import (
    alpha_keys_bulk,
    ordered_alpha_key,
    same_as_alpha_key,
)
from elasticsearch_data_loader_ray.functions.suffix import (
    split_company_name_endings,
    split_company_name_endings_batch,
)


def test_reference_golden_case():
    # format/format_test.go:13-31
    assert split_company_name_endings("TEST LIMITED") == ("TEST", " LIMITED")


def test_trailing_punct_stripped_before_match():
    # format.go:104-105: trailing [^A-Za-z0-9_]+ removed before suffix scan
    assert split_company_name_endings("ACME LTD.") == ("ACME", " LTD.")
    assert split_company_name_endings("ACME LIMITED...") == ("ACME", " LIMITED...")


def test_no_match_returns_name_and_empty():
    assert split_company_name_endings("ACME HOLDINGS") == ("ACME HOLDINGS", "")


def test_declaration_order_first_match_wins():
    # "CBC" precedes "CBCN" in the table: "X CBCN" first matches "CBCN"?
    # Scan order is declaration order, so "CBC" is tested first but
    # "X CBCN".endswith("CBC") is False — "CBCN" matches.
    assert split_company_name_endings("X CBCN") == ("X", " CBCN")
    # "LIMITED THE" precedes "LIMITED": longest declared first wins
    assert split_company_name_endings("ACME LIMITED THE") == ("ACME", " LIMITED THE")


def test_suffix_equal_to_whole_name():
    # TrimSuffix(stripped, " "+cne) is a no-op when stripped == cne
    assert split_company_name_endings("LIMITED") == ("LIMITED", "")
    assert split_company_name_endings("LIMITED!!") == ("LIMITED", "!!")


def test_suffix_without_space_not_trimmed():
    assert split_company_name_endings("ACMELIMITED") == ("ACMELIMITED", "")


def test_batch_matches_scalar():
    names = ["TEST LIMITED", "ACME HOLDINGS", "X PLC", None, "LIMITED"]
    t = split_company_name_endings_batch(pa.array(names, pa.string()))
    for i, n in enumerate(names):
        if n is None:
            assert t["name_start"][i].as_py() is None
        else:
            s, e = split_company_name_endings(n)
            assert t["name_start"][i].as_py() == s
            assert t["name_ending"][i].as_py() == e


def test_alpha_keys():
    assert same_as_alpha_key("A & B LIMITED") == "AANDBLIMITED"
    assert ordered_alpha_key("A & B LIMITED") == "AANDB"
    assert alpha_keys_bulk(["", "TEST LIMITED"]) == [
        ("", ""),
        ("TESTLIMITED", "TEST"),
    ]
