"""corpus_profile: exact mode vs a numpy reference (linear-interpolation
quantiles — the quantile_cont definition the oracle relies on), approx
mode closeness, and group completeness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators.profile import corpus_profile

QS = (0.25, 0.5, 0.9, 0.99)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    rng = np.random.RandomState(7)
    for i in range(300):
        lang = ["en", "de", "fr"][i % 3]
        n = int(rng.randint(1, 120))
        rows.append((i, " ".join(f"w{j}" for j in range(n)), lang))
    rows.append((300, "", "zz"))  # empty doc, singleton group
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _reference(rows):
    by_lang = {}
    for _, text, lang in rows:
        by_lang.setdefault(lang, []).append((len(text.split()), len(text)))
    out = {}
    for lang, vals in by_lang.items():
        nws = np.array([v[0] for v in vals], dtype=float)
        ncs = np.array([v[1] for v in vals], dtype=float)
        out[lang] = {
            "n_docs": len(vals),
            "total_words": int(nws.sum()),
            "avg_words": round(float(nws.mean()), 6),
            **{
                f"p{str(q)[2:].ljust(2, '0')}_words": round(
                    float(np.quantile(nws, q, method="linear")), 6
                )
                for q in QS
            },
            "avg_chars": round(float(ncs.mean()), 6),
        }
    return out


def test_exact_matches_numpy_linear_quantiles(corpus):
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in corpus.collect()]
    expect = _reference(rows)
    got = {r["lang"]: r.asDict() for r in corpus_profile(corpus, exact=True).collect()}
    assert set(got) == set(expect)
    for lang, e in expect.items():
        for k, v in e.items():
            assert got[lang][k] == pytest.approx(v, abs=1e-6), (lang, k)


def test_approx_mode_is_close_and_cheap_shape(corpus):
    exact = {r["lang"]: r for r in corpus_profile(corpus, exact=True).collect()}
    approx = {r["lang"]: r for r in corpus_profile(corpus, exact=False).collect()}
    assert set(exact) == set(approx)
    for lang in exact:
        # counts/sums identical; quantiles within a loose sketch bound
        assert approx[lang]["n_docs"] == exact[lang]["n_docs"]
        assert approx[lang]["total_words"] == exact[lang]["total_words"]
        for q in QS:
            k = f"p{str(q)[2:].ljust(2, '0')}_words"
            assert abs(approx[lang][k] - exact[lang][k]) <= max(
                5.0, 0.1 * exact[lang][k]
            ), (lang, k)
    # the approx plan must be pure hash aggregate — no sort on the rows
    plan = corpus_profile(corpus, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan.split("Exchange")[0]


def test_custom_group_and_quantiles(corpus):
    out = corpus_profile(
        corpus.withColumn("src", F.lit("all")), group_col="src", qs=(0.5,), exact=True
    ).collect()
    assert len(out) == 1 and out[0]["src"] == "all" and "p50_words" in out[0].asDict()
