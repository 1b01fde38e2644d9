"""C4-style line-level cleaning (stages/c4.py): each published rule
exercised against hand-checked pages."""

from __future__ import annotations

import pyarrow as pa

from elasticsearch_data_loader_ray.stages.c4 import (
    MIN_KEPT_LINES,
    MIN_WORDS_PER_LINE,
    c4_clean,
)


def test_c4_line_and_page_rules():
    texts = pa.array([
        # 3 good lines + 1 short + 1 no-terminal -> page kept
        "Good first line here today.\nshort one.\n"
        "Another good line is here!\nA third fine line right there?\n"
        "no terminal punct line at all",
        # lorem ipsum anywhere -> page dropped even with 3 good lines
        "this page has lorem ipsum somewhere.\n"
        "But otherwise fine line number one.\n"
        "And fine line number two here.\nAnd fine line number three here.",
        # javascript line dropped, 3 survivors -> kept
        "Contains javascript so drop this line.\n"
        "A perfectly good line stays here.\n"
        "Another good survivor line here.\n"
        "Yet another good line survives here.",
        # only 2 surviving lines -> dropped
        "Only two good lines are here.\nSecond good line is right here.",
        None,
        # end-quote counts as terminal punctuation (C4's rule)
        'He said "stop right there now friend"',
    ], pa.string())
    out = c4_clean(texts)
    assert out["n_lines"].to_pylist() == [5, 4, 4, 2, 1, 1]
    assert out["n_kept"].to_pylist() == [3, 4, 3, 2, 0, 1]
    assert out["keep"].to_pylist() == [True, False, True, False, False,
                                       False]
    cleaned = out["cleaned"].to_pylist()
    assert cleaned[0] == ("Good first line here today.\n"
                          "Another good line is here!\n"
                          "A third fine line right there?")
    assert "javascript" not in cleaned[2]
    assert cleaned[1] == cleaned[3] == cleaned[4] == cleaned[5] == ""


def test_c4_curly_brace_drops_page():
    texts = pa.array([
        "A good line number one here.\nA good line number two here.\n"
        "A good line with a { brace.\nA good line number three here.",
    ])
    out = c4_clean(texts)
    assert out["n_kept"].to_pylist() == [4]  # line rules all pass
    assert out["keep"].to_pylist() == [False]  # page rule kills it


def test_c4_word_count_boundary():
    ok = " ".join(["word"] * MIN_WORDS_PER_LINE) + "."
    short = " ".join(["word"] * (MIN_WORDS_PER_LINE - 1)) + "."
    texts = pa.array(["\n".join([ok] * MIN_KEPT_LINES),
                      "\n".join([short] * (MIN_KEPT_LINES + 2))])
    out = c4_clean(texts)
    assert out["keep"].to_pylist() == [True, False]
    assert out["n_kept"].to_pylist() == [MIN_KEPT_LINES, 0]
