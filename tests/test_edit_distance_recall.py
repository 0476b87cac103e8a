"""Quantified recall for edit_distance_pairs' prefix blocking (VERDICT
r3 item 5 / r4 item 6): on a seeded uniform-position typo corpus, the
ONLY missed true pairs are those whose edit falls inside the normalized
blocking prefix — so recall = 1 - prefix_len/E[len] by construction,
and this test measures it exactly against brute force."""

from __future__ import annotations

import random
import string

import pytest


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _typo_corpus(n: int = 120, doc_len: int = 200, seed: int = 20260814):
    """n base docs + 1 single-substitution typo each, edit position
    uniform over the doc. Lowercase/no-runs-of-space text so the
    normalized form equals the raw form and positions are exact."""
    rng = random.Random(seed)
    alphabet = string.ascii_lowercase + "     "
    rows, truth, positions = [], [], {}
    for i in range(n):
        while True:
            base = "".join(rng.choice(alphabet) for _ in range(doc_len))
            base = " ".join(base.split())  # collapse runs; normalize-stable
            if len(base) >= doc_len - 20 and not base.startswith(" "):
                break
        pos = rng.randrange(len(base))
        old = base[pos]
        new = rng.choice([c for c in string.ascii_lowercase if c != old])
        typo = base[:pos] + new + base[pos + 1:]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, typo))
        truth.append((2 * i, 2 * i + 1))
        positions[(2 * i, 2 * i + 1)] = pos
    return rows, truth, positions


def test_recall_equals_out_of_prefix_fraction(spark):
    from openpolicedata_spark.operators.dedup import edit_distance_pairs

    PREFIX = 24
    rows, truth, positions = _typo_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"])
           for r in edit_distance_pairs(df, prefix_len=PREFIX,
                                        max_dist=5).collect()}
    found = [p for p in truth if p in got or (p[1], p[0]) in got]
    missed = [p for p in truth if p not in got and (p[1], p[0]) not in got]
    # every miss is an in-prefix edit; every out-of-prefix edit is found
    assert all(positions[p] < PREFIX for p in missed), missed
    assert all(p in got or (p[1], p[0]) in got
               for p in truth if positions[p] >= PREFIX)
    # measured recall matches the closed form 1 - prefix/len
    n_in_prefix = sum(1 for p in truth if positions[p] < PREFIX)
    recall = len(found) / len(truth)
    assert recall == pytest.approx(1 - n_in_prefix / len(truth))
    # and on THIS seed that is ~0.88 (prefix 24 / len ~200) — the number
    # documented in edit_distance_pairs' docstring and SCALE.md
    assert 0.80 <= recall <= 0.95, recall
    # no false positives beyond genuine near-pairs: verify a sample
    texts = dict(rows)
    extra = [p for p in got
             if p not in set(truth) and (p[1], p[0]) not in set(truth)]
    for a, b in extra[:10]:
        assert _levenshtein(texts[a], texts[b]) <= 5


def test_front_edits_recoverable_with_reversed_second_pass(spark):
    """The documented mitigation for in-prefix edits: run a second pass
    blocking on the SUFFIX (reverse the text); an edit can't be in both
    the first 24 and last 24 characters of a 100+ char doc, so the union
    of the two passes reaches recall 1.0 on single-edit pairs."""
    from pyspark.sql import functions as F

    from openpolicedata_spark.operators.dedup import edit_distance_pairs

    rows, truth, _ = _typo_corpus(n=60, seed=7)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fwd = {(r["id_a"], r["id_b"])
           for r in edit_distance_pairs(df, max_dist=5).collect()}
    rev_df = df.select("doc_id", F.reverse("text").alias("text"))
    rev = {(r["id_a"], r["id_b"])
           for r in edit_distance_pairs(rev_df, max_dist=5).collect()}
    both = fwd | rev
    assert all(p in both or (p[1], p[0]) in both for p in truth)
