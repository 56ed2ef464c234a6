"""SURVEY.md §4.8 vectorization lint: the engine must never use
row-at-a-time Python UDFs or the RDD API in the hot path
(BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python) throughout")."""

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sparktext")

# F.udf( / @udf — row-at-a-time Python UDFs. pandas_udf is allowed.
FORBIDDEN = [
    (re.compile(r"\bF\.udf\s*\("), "row-at-a-time F.udf"),
    (re.compile(r"^\s*@udf\b"), "row-at-a-time @udf"),
    (re.compile(r"\.collect\(\)\s*\n?.*for .* in "), None),  # informational only
]

# .rdd is banned except pure-metadata getNumPartitions probes
RDD_RE = re.compile(r"\.rdd\b")
RDD_OK = re.compile(r"\.rdd\.getNumPartitions\(\)")


def test_no_row_udfs_or_rdd():
    violations = []
    for fname in sorted(os.listdir(PKG)):
        if not fname.endswith(".py"):
            continue
        path = os.path.join(PKG, fname)
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                if line.lstrip().startswith("#"):
                    continue
                pat, label = FORBIDDEN[0]
                if pat.search(line):
                    violations.append(f"{fname}:{lineno} {label}: {line.strip()}")
                if FORBIDDEN[1][0].search(line):
                    violations.append(f"{fname}:{lineno} @udf: {line.strip()}")
                if RDD_RE.search(line) and not RDD_OK.search(line):
                    violations.append(f"{fname}:{lineno} .rdd: {line.strip()}")
    assert not violations, "\n".join(violations)
