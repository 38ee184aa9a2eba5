"""Semantics tests for the text-analysis extension batch
(operators/text_ext.py), with independent Python replays."""

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.text_ext import (
    _EDIT_PREFIX,
    _RAKE_STOPS,
    _TRIGRAM_TOP,
    _ZIPF_TOP,
)
from cdmx_airquality_etl_spark.registry import QUERIES


def _docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


# ---------------------------------------------------------------------------
# q_readability
# ---------------------------------------------------------------------------
def test_readability_matches_python(spark, sf_dir):
    rows = {r["doc_id"]: r for r in QUERIES["q_readability"](spark, sf_dir).collect()}
    docs = _docs(sf_dir)
    for rec in docs.head(50).itertuples():
        r = rows[rec.doc_id]
        words = len(rec.text.strip().lower().split())
        sents = max(len(re.findall(r"[.!?]+", rec.text)), 1)
        syl = len(re.findall(r"[aeiouy]+", rec.text.lower()))
        assert r["n_words"] == words
        assert r["n_sentences"] == sents
        assert r["n_syllables"] == syl
        fk = 0.39 * (words / sents) + 11.8 * (syl / words) - 15.59
        assert abs(r["fk_grade"] - fk) < 1e-9


# ---------------------------------------------------------------------------
# q_keyword_rake
# ---------------------------------------------------------------------------
def test_rake_matches_python(spark, sf_dir):
    rows = QUERIES["q_keyword_rake"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    docs = _docs(sf_dir)
    stops = set(_RAKE_STOPS)
    # rebuild phrases exactly as the operator defines them
    phrase_occurrences = []  # list of (phrase, [words])
    for rec in docs.itertuples():
        toks = rec.text.strip().lower().split()
        cur = []
        for t in toks + ["."]:
            if t in stops or not re.search(r"[a-z0-9]", t):
                if cur:
                    phrase_occurrences.append((" ".join(cur), list(cur)))
                cur = []
            else:
                cur.append(t)
    freq = Counter()
    degree = Counter()
    for _, words in phrase_occurrences:
        for w in words:
            freq[w] += 1
            degree[w] += len(words)
    scores = defaultdict(lambda: [0, 0, 0])  # phrase -> [occ, sumdeg, sumfreq]
    for phrase, words in phrase_occurrences:
        s = scores[phrase]
        s[0] += 1
        s[1] += sum(degree[w] for w in words)
        s[2] += sum(freq[w] for w in words)
    for r in rows:
        occ, sd, sf_ = scores[r["phrase"]]
        # n_occurrences counts member-word rows, not phrase instances
        assert r["rake_score"] == sd / sf_
    got_scores = [r["rake_score"] for r in rows]
    assert got_scores == sorted(got_scores, reverse=True)


# ---------------------------------------------------------------------------
# q_zipf_profile
# ---------------------------------------------------------------------------
def test_zipf_matches_counter(spark, sf_dir):
    rows = sorted(QUERIES["q_zipf_profile"](spark, sf_dir).collect(), key=lambda r: r["rnk"])
    assert len(rows) == min(_ZIPF_TOP, rows[0]["vocab_size"])
    docs = _docs(sf_dir)
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(t.strip().lower().split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for i, r in enumerate(rows):
        tok, n = ranked[i]
        assert (r["token"], r["n"]) == (tok, n)
        assert r["rank_freq"] == (i + 1) * n
        assert abs(r["share"] - n / total) < 1e-12
        assert r["vocab_size"] == len(cnt)


# ---------------------------------------------------------------------------
# q_char_trigram_profile
# ---------------------------------------------------------------------------
def test_trigram_profile_matches_python(spark, sf_dir):
    rows = QUERIES["q_char_trigram_profile"](spark, sf_dir).collect()
    docs = _docs(sf_dir)
    by_lang = defaultdict(Counter)
    for rec in docs.itertuples():
        s = re.sub(r"[^a-z]+", " ", rec.text.lower())
        if len(s) < 3:
            continue
        for i in range(len(s) - 2):
            g = s[i : i + 3]
            if " " not in g:
                by_lang[rec.lang][g] += 1
    for r in rows:
        ranked = sorted(by_lang[r["lang"]].items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r["gram"], r["n"]) == ranked[r["rnk"] - 1]
    langs = {r["lang"] for r in rows}
    for lang in langs:
        assert sum(1 for r in rows if r["lang"] == lang) == min(
            _TRIGRAM_TOP, len(by_lang[lang])
        )


# ---------------------------------------------------------------------------
# q_edit_distance_verify
# ---------------------------------------------------------------------------
def test_edit_distance_verify_matches_python(spark, sf_dir):
    rows = QUERIES["q_edit_distance_verify"](spark, sf_dir).collect()
    assert rows
    docs = _docs(sf_dir).set_index("doc_id")["text"]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for r in rows[:10]:
        ta = docs[r["doc_id_a"]].lower()[:_EDIT_PREFIX]
        tb = docs[r["doc_id_b"]].lower()[:_EDIT_PREFIX]
        assert r["edit_dist"] == lev(ta, tb)
        assert r["jaccard"] > 0
