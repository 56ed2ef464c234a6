import numpy as np
import pandas as pd

from sparktext.tokenizer import (
    TokenizerPipeline,
    tokenize_flat,
    tokenize_series,
    tokenize_text,
)


def test_basic_split_and_lower():
    assert tokenize_text("Hello, World!") == ["hello", "world"]


def test_underscore_splits():
    # Rust char::is_alphanumeric excludes '_' (unlike regex \w).
    assert tokenize_text("foo_bar baz") == ["foo", "bar", "baz"]


def test_digits_kept():
    assert tokenize_text("abc123 4x5") == ["abc123", "4x5"]


def test_long_tokens_dropped():
    tok39 = "a" * 39
    tok40 = "a" * 40
    assert tokenize_text(f"{tok39} {tok40} ok") == [tok39, "ok"]


def test_long_limit_is_bytes_not_chars():
    # 20 chars of 'é' = 40 utf-8 bytes -> dropped; 19 -> kept.
    assert tokenize_text("é" * 20) == []
    assert tokenize_text("é" * 19) == ["é" * 19]


def test_unicode_alnum():
    assert tokenize_text("naïve café ΣΙΓΜΑ") == ["naïve", "café", "σιγμα"]


def test_empty_and_null():
    assert tokenize_text("") == []
    assert tokenize_text("...!!!") == []
    s = tokenize_series(pd.Series([None, "a b", ""]))
    assert list(s) == [[], ["a", "b"], []]


def test_flat_matches_series():
    texts = pd.Series(["Apple pie!", "", "x_y z " + "q" * 50, None, "One two ONE"])
    rows, toks = tokenize_flat(texts)
    expected = tokenize_series(texts)
    flat_expected = [(i, t) for i, ts in enumerate(expected) for t in ts]
    assert list(zip(rows.tolist(), toks.tolist())) == flat_expected


def test_pipeline_stopwords():
    pipe = TokenizerPipeline(stopwords=frozenset({"the", "a"}))
    out = pipe.tokenize(pd.Series(["The quick a fox"]))
    assert list(out) == [["quick", "fox"]]


def test_tokenize_flat_matches_per_row_on_mixed_batches():
    """The ASCII fast path + unicode slow path + row-order stitching must
    be indistinguishable from per-row tokenize_text, including rows that
    mix scripts, empty rows, long tokens and None."""
    import numpy as np
    import pandas as pd

    from sparktext.tokenizer import tokenize_flat, tokenize_text

    rows = [
        "Plain ASCII text with Numbers 123",
        "Füße im Gras über Köln",          # umlauts (non-ascii)
        "",                                 # empty
        None,                               # null
        "İstanbul DENEME kapıcı",           # dotted capital I (lower changes class)
        "mixed ascii_and-под_скрипт text",  # cyrillic + underscores split
        "x" * 45 + " short " + "y" * 39,    # 45-char dropped, 39 kept
        "汉字 分词 测试 alpha",                 # CJK + ascii in one row
        "ÆØÅ æøå",                          # latin-1 letters
    ]
    ser = pd.Series(rows)
    row_idx, toks = tokenize_flat(ser)
    got = {i: [] for i in range(len(rows))}
    for i, t in zip(row_idx, toks):
        got[int(i)].append(t)
    for i, text in enumerate(rows):
        assert got[i] == tokenize_text(text or ""), (i, text, got[i])


def test_tokenize_flat_all_unicode_batch():
    import pandas as pd

    from sparktext.tokenizer import tokenize_flat, tokenize_text

    rows = ["тест привет", "日本語 のテスト", "ありがとう"]
    row_idx, toks = tokenize_flat(pd.Series(rows))
    got = {i: [] for i in range(len(rows))}
    for i, t in zip(row_idx, toks):
        got[int(i)].append(t)
    for i, text in enumerate(rows):
        assert got[i] == tokenize_text(text)


def test_ngram_tokenizer_golden():
    """Mirrors tantivy's documented NgramTokenizer example: 'hello' with
    (2, 3) -> he, hel, el, ell, ll, llo, lo (position-major order)."""
    from sparktext.tokenizer import ngram_tokens

    assert ngram_tokens("hello", 2, 3) == ["he", "hel", "el", "ell", "ll", "llo", "lo"]
    assert ngram_tokens("hello", 2, 3, prefix_only=True) == ["he", "hel"]
    assert ngram_tokens("ab", 3, 4) == []
    assert ngram_tokens("", 1, 2) == []
    assert ngram_tokens(None, 1, 1) == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ngram_tokens("x", 0, 2)
    with _pytest.raises(ValueError):
        ngram_tokens("x", 3, 2)


def test_ngram_pipeline():
    import pandas as pd

    from sparktext.tokenizer import TokenizerPipeline

    pipe = TokenizerPipeline(ngram=(2, 2), lowercase=True)
    out = pipe.tokenize(pd.Series(["AbC"]))
    assert list(out.iloc[0]) == ["ab", "bc"]
    edge = TokenizerPipeline(ngram=(1, 3), ngram_prefix_only=True, lowercase=False)
    assert list(edge.tokenize(pd.Series(["Rust"])).iloc[0]) == ["R", "Ru", "Rus"]


def test_facet_tokenizer_golden():
    from sparktext.tokenizer import facet_tokens

    assert facet_tokens("/lang/rust") == ["/lang", "/lang/rust"]
    assert facet_tokens("lang/rust/") == ["/lang", "/lang/rust"]
    assert facet_tokens("/") == []
    assert facet_tokens("") == []
    assert facet_tokens(None) == []


def test_tokenize_flat_arrow_matches_flat():
    """The Arrow-native path must be token-for-token identical to
    tokenize_flat on ASCII, unicode, and mixed batches (incl. empties,
    over-long tokens, and the split-edge empty fields)."""
    import numpy as np
    import pandas as pd

    from sparktext.tokenizer import tokenize_flat, tokenize_flat_arrow

    batches = [
        pd.Series(["apple banana", "", None, "  x  ", "A_B-c42"]),
        pd.Series(["Füße im Gras", "plain ascii", "тест gras", "ＡＢ12"]),
        pd.Series(["x" * 45 + " ok", "tab\tsep\nline", "123 456"]),
        pd.Series([""] * 3),
    ]
    for s in batches:
        ri_a, tok_a = tokenize_flat_arrow(s)
        ri_f, tok_f = tokenize_flat(s)
        assert list(ri_a) == list(ri_f)
        assert tok_a.to_pylist() == list(tok_f)


def test_tokenize_flat_arrow_property_parity():
    """Property-based parity: arbitrary unicode batches produce identical
    (row_idx, tokens) through the Arrow path and the object path."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparktext.tokenizer import tokenize_flat, tokenize_flat_arrow

    texts = st.lists(
        st.one_of(
            st.none(),
            st.text(max_size=60),
            st.text(alphabet="abc019 _-.", max_size=40),
            st.text(alphabet="Füße гραςτ漢字 x", max_size=30),
        ),
        max_size=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(texts)
    def check(batch):
        s = pd.Series(batch, dtype="object")
        ri_a, tok_a = tokenize_flat_arrow(s)
        ri_f, tok_f = tokenize_flat(s)
        assert list(ri_a) == list(ri_f)
        assert tok_a.to_pylist() == list(tok_f)

    check()
