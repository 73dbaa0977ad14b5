"""q467 RAKE keyword extraction: sequential-reference agreement on the
fixture corpus (stop-flag islands, deg/freq fixed-point scores, top-3
tie-broken ranking)."""

from __future__ import annotations

import re
from collections import defaultdict

from luxo_rs_spark.plans.queries import QUERIES
from luxo_rs_spark.sources.registry import load_table
from tests.conftest import SF_DIR

STOPS = {"the", "a", "of", "and", "to", "in", "is", "it"}
FP = 1_000_000


def _ref_rake(text: str) -> list[tuple[str, int, int]]:
    """Top-3 (phrase, n_words, score_fp) for one document."""
    toks = [
        re.sub(r"[^a-z0-9]", "", t) for t in text.strip().lower().split()
    ]
    phrases, cur = [], []
    for t in toks:
        if t in STOPS or t == "":
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        phrases.append(cur)
    deg: dict = defaultdict(int)
    freq: dict = defaultdict(int)
    for p in phrases:
        for w in p:
            deg[w] += len(p)
            freq[w] += 1
    wscore = {w: (deg[w] * FP) // freq[w] for w in deg}
    uniq = {}
    for p in phrases:
        uniq[" ".join(p)] = (len(p), sum(wscore[w] for w in p))
    ranked = sorted(
        ((ph, n, s) for ph, (n, s) in uniq.items()),
        key=lambda x: (-x[2], x[0]),
    )
    return ranked[:3]


def test_rake_matches_sequential_reference(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
        if r["text"] is not None and r["text"].strip()
    }
    got = defaultdict(list)
    for r in QUERIES["q467_rake_keywords"](spark, SF_DIR).collect():
        got[r["doc_id"]].append((r["phrase"], r["n_words"], r["score_fp"]))
    assert set(got) <= set(docs)
    checked = 0
    for did, text in docs.items():
        want = _ref_rake(text)
        if not want:
            assert did not in got
            continue
        assert got[did] == want, did
        checked += 1
    assert checked > 100
