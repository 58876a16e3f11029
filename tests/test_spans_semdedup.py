"""Round-12 session-4 additions: span-level exact-substring dedup,
SemDeDup semantic dedup, and the LATERAL SQL surface — each pinned
against an INDEPENDENT recomputation (pure-Python brute force / a
different Spark plan), not just the DuckDB oracle replay that
tests/test_oracle_parity.py already runs."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_competition_dxc_spark import plans
from big_data_competition_dxc_spark.dedup.spans import HOTSPOT_TOP_K, SPAN_TOKENS
from big_data_competition_dxc_spark.similarity.semdedup import SEM_BITS, SEM_TAU

from conftest import SF_TEST_DIR

plans.load_all()


def _df(name, spark):
    return plans.QUERIES[name].fn(spark, SF_TEST_DIR)


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _brute_spans(duck):
    """Pure-Python span table: doc_id -> list of md5 k-gram fps."""
    rows = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in rows:
        # strip(" ") not strip(): both engines' trim() removes SPACES
        # only, and the spec must mirror that exactly
        words = re.sub(r"\s+", " ", text.strip(" ")).split(" ")
        fps = [
            hashlib.md5(
                " ".join(words[i : i + SPAN_TOKENS]).encode()
            ).hexdigest()
            for i in range(len(words) - SPAN_TOKENS + 1)
        ]
        per_doc[doc_id] = fps
    return per_doc


def test_substring_span_dedup_matches_bruteforce(spark, duck):
    per_doc = _brute_spans(duck)
    fp_docs: dict[str, set[int]] = defaultdict(set)
    for doc_id, fps in per_doc.items():
        for fp in fps:
            fp_docs[fp].add(doc_id)
    dup_fps = {fp for fp, docs in fp_docs.items() if len(docs) >= 2}
    expected = {}
    for doc_id, fps in per_doc.items():
        if not fps:  # sub-SPAN_TOKENS docs contribute no rows
            continue
        dup_occ = sum(1 for fp in fps if fp in dup_fps)
        dup_distinct = len({fp for fp in fps if fp in dup_fps})
        expected[doc_id] = (
            len(fps),
            dup_occ,
            dup_distinct,
            _round4(dup_occ / len(fps)),
        )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_occ"], r["n_dup_fps"], r["dup_frac"])
        for r in _df("substring_span_dedup", spark).collect()
    }
    assert got == expected
    # the fixture must actually exercise the duplicated branch
    assert any(v[1] > 0 for v in expected.values())


def test_span_hotspots_match_bruteforce(spark, duck):
    per_doc = _brute_spans(duck)
    n_docs: Counter = Counter()
    n_occ: Counter = Counter()
    seen_doc: dict[str, set[int]] = defaultdict(set)
    for doc_id, fps in per_doc.items():
        for fp in fps:
            n_occ[fp] += 1
            seen_doc[fp].add(doc_id)
    for fp, docs in seen_doc.items():
        n_docs[fp] = len(docs)
    dup = [(fp, n_docs[fp], n_occ[fp]) for fp in n_occ if n_docs[fp] >= 2]
    dup.sort(key=lambda t: (-t[1], -t[2], t[0]))
    expected = [
        (fp, nd, no, i + 1) for i, (fp, nd, no) in enumerate(dup[:HOTSPOT_TOP_K])
    ]
    got = [
        (r["fp"], r["n_docs"], r["n_occ"], r["rn"])
        for r in _df("substring_span_hotspots", spark).orderBy("rn").collect()
    ]
    assert got == expected


def test_semantic_dedup_matches_bruteforce(spark, duck):
    vecs = dict(duck.sql("SELECT vec_id, embedding FROM embeddings").fetchall())
    # sign-bit buckets and min-id keepers, recomputed from scratch
    bucket = {
        vid: "".join("1" if float(v[i]) >= 0 else "0" for i in range(SEM_BITS))
        for vid, v in vecs.items()
    }
    keeper: dict[str, int] = {}
    for vid, b in bucket.items():
        keeper[b] = min(keeper.get(b, vid), vid)

    def cos(a, b):
        a = [float(x) for x in a]
        b = [float(x) for x in b]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    rows = _df("semantic_dedup_keep", spark).collect()
    assert sorted(r["vec_id"] for r in rows) == sorted(vecs)  # each vec once
    for r in rows:
        assert r["bucket"] == bucket[r["vec_id"]]
        assert r["keeper_vec_id"] == keeper[r["bucket"]]
        expect_cos = _round4(cos(vecs[r["vec_id"]], vecs[r["keeper_vec_id"]]))
        # Python's left-to-right float sum IS the engines' index-order
        # fold, so agreement is exact after shared rounding
        assert r["cos_to_keeper"] == expect_cos
        expect_pruned = int(
            r["vec_id"] != r["keeper_vec_id"] and expect_cos >= SEM_TAU
        )
        assert r["pruned"] == expect_pruned
        if r["vec_id"] == r["keeper_vec_id"]:
            assert r["cos_to_keeper"] == 1.0 and r["pruned"] == 0
    # the threshold must exercise both branches on the fixture
    flags = {r["pruned"] for r in rows}
    assert flags == {0, 1}


def test_dsir_weights_match_bruteforce(spark, duck):
    """Recompute the DSIR log-ratio from scratch in Python: md5-hash
    bucketing, add-one smoothing, per-bucket 1e-4 unit rounding, exact
    integer per-doc sums — the full fixed-point contract."""
    from big_data_competition_dxc_spark.textops.dsir import (
        N_BUCKETS,
        TARGET_LANG,
        _UNIT,
    )

    rows = duck.sql("SELECT doc_id, lang, text FROM documents").fetchall()
    src_cnt: Counter = Counter()
    tgt_cnt: Counter = Counter()
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, lang, text in rows:
        bs = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % N_BUCKETS
            for t in text.strip(" ").lower().split(" ")  # trim() = spaces only
        ]
        doc_buckets[doc_id] = bs
        for b in bs:
            src_cnt[b] += 1
            if lang == TARGET_LANG:
                tgt_cnt[b] += 1
    src_tot = sum(src_cnt.values())
    tgt_tot = sum(tgt_cnt.values())
    units = {
        b: math.floor(
            (
                math.log((tgt_cnt[b] + 1.0) / (tgt_tot + float(N_BUCKETS)))
                - math.log((src_cnt[b] + 1.0) / (src_tot + float(N_BUCKETS)))
            )
            * _UNIT
            + 0.5
        )
        for b in src_cnt
    }
    expected = {
        doc_id: (
            len(bs),
            math.floor(sum(units[b] for b in bs) / float(_UNIT) * 10000.0 + 0.5)
            / 10000.0,
        )
        for doc_id, bs in doc_buckets.items()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in _df("dsir_importance_weights", spark).collect()
    }
    assert got == expected
    # the target slice must score higher on average than the rest —
    # the method's defining property on any non-degenerate fixture
    lang_of = {doc_id: lang for doc_id, lang, _ in rows}
    tgt_scores = [v[1] for k, v in got.items() if lang_of[k] == TARGET_LANG]
    other = [v[1] for k, v in got.items() if lang_of[k] != TARGET_LANG]
    assert sum(tgt_scores) / len(tgt_scores) > sum(other) / len(other)


def _brute_scrub(per_doc_words: dict[int, list[str]]):
    """From-scratch span scrub spec: dup fps over all docs, covered
    1-based positions per doc, kept tokens rejoined with single
    spaces."""
    fp_docs: dict[str, set[int]] = defaultdict(set)
    starts: dict[int, list[tuple[int, str]]] = {}
    for doc_id, ws in per_doc_words.items():
        sp = [
            (
                i + 1,
                hashlib.md5(
                    " ".join(ws[i : i + SPAN_TOKENS]).encode()
                ).hexdigest(),
            )
            for i in range(len(ws) - SPAN_TOKENS + 1)
        ]
        starts[doc_id] = sp
        for _, fp in sp:
            fp_docs[fp].add(doc_id)
    dup = {fp for fp, ds in fp_docs.items() if len(ds) >= 2}
    expected = {}
    for doc_id, ws in per_doc_words.items():
        covered: set[int] = set()
        for i, fp in starts[doc_id]:
            if fp in dup:
                covered.update(range(i, i + SPAN_TOKENS))
        kept = [w for j, w in enumerate(ws, 1) if j not in covered]
        expected[doc_id] = (len(ws), len(covered), " ".join(kept))
    return expected


def test_span_scrub_matches_bruteforce(spark, duck):
    rows = duck.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    per_doc = {
        doc_id: re.sub(r"\s+", " ", text.strip(" ")).split(" ")
        for doc_id, text in rows
    }
    expected = _brute_scrub(per_doc)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_scrubbed"])
        for r in _df("substring_span_scrub", spark).collect()
    }
    assert got == expected
    # the fixture must exercise both the scrubbed and untouched branches
    removed = [v[1] for v in expected.values()]
    assert any(n > 0 for n in removed) and any(n == 0 for n in removed)
    # scrubbing is consistent with the coverage report: n_removed > 0
    # exactly where substring_span_dedup reports dup_frac > 0
    dup_occ = {
        r["doc_id"]: r["n_dup_occ"]
        for r in _df("substring_span_dedup", spark).collect()
    }
    for doc_id, (_, n_removed, _) in expected.items():
        assert (n_removed > 0) == (dup_occ.get(doc_id, 0) > 0)


def _brute_islands(per_doc_words: dict[int, list[str]]):
    """From-scratch islands spec: covered positions per doc, runs of
    consecutive positions."""
    fp_docs: dict[str, set[int]] = defaultdict(set)
    starts: dict[int, list[tuple[int, str]]] = {}
    for doc_id, ws in per_doc_words.items():
        sp = [
            (
                i + 1,
                hashlib.md5(
                    " ".join(ws[i : i + SPAN_TOKENS]).encode()
                ).hexdigest(),
            )
            for i in range(len(ws) - SPAN_TOKENS + 1)
        ]
        starts[doc_id] = sp
        for _, fp in sp:
            fp_docs[fp].add(doc_id)
    dup = {fp for fp, ds in fp_docs.items() if len(ds) >= 2}
    expected = {}
    for doc_id in per_doc_words:
        covered: set[int] = set()
        for i, fp in starts[doc_id]:
            if fp in dup:
                covered.update(range(i, i + SPAN_TOKENS))
        runs, prev = [], None
        for j in sorted(covered):
            if prev is not None and j == prev + 1:
                runs[-1] += 1
            else:
                runs.append(1)
            prev = j
        expected[doc_id] = (
            len(covered),
            len(runs),
            max(runs) if runs else 0,
        )
    return expected


def test_span_islands_match_bruteforce(spark, duck):
    rows = duck.sql(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    per_doc = {
        doc_id: re.sub(r"\s+", " ", text.strip(" ")).split(" ")
        for doc_id, text in rows
    }
    expected = _brute_islands(per_doc)
    got = {
        r["doc_id"]: (r["n_covered"], r["n_islands"], r["max_run"])
        for r in _df("substring_span_islands", spark).collect()
    }
    assert got == expected
    # any duplicated span must surface a run of at least SPAN_TOKENS
    for n_cov, n_isl, mx in expected.values():
        assert (n_cov == 0) == (n_isl == 0)
        if n_isl:
            assert mx >= SPAN_TOKENS
    assert any(v[1] > 0 for v in expected.values())


def test_dsir_resample_matches_bruteforce(spark, duck):
    """The keep decision recomputed from scratch: floor(units/n_tokens)
    in IEEE double, the [500, 10000] clamp around 5000, and the
    md5-basis-point uniform — plus the monotonicity property that makes
    it DSIR (higher weight never keeps less)."""
    from big_data_competition_dxc_spark.textops.dsir import (
        KEEP_BASE_BPS,
        KEEP_MAX_BPS,
        KEEP_MIN_BPS,
    )

    weights = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in _df("dsir_importance_weights", spark).collect()
    }
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dsir_logratio"],
            r["keep_bps"],
            r["kept"],
        )
        for r in _df("dsir_resample_keep", spark).collect()
    }
    assert set(got) == set(weights)
    for doc_id, (n_tokens, logratio, keep_bps, kept) in got.items():
        assert (n_tokens, logratio) == weights[doc_id]
        units = math.floor(logratio * 10000.0 + 0.5)  # exact 1e-4 grid
        expect_bps = min(
            KEEP_MAX_BPS,
            max(KEEP_MIN_BPS, KEEP_BASE_BPS + math.floor(units / n_tokens)),
        )
        assert keep_bps == expect_bps
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 10000
        assert kept == int(u < expect_bps)
    # both branches exercised, and the fixture's spread is real
    assert {v[3] for v in got.values()} == {0, 1}
    assert len({v[2] for v in got.values()}) > 1
    # monotone: a higher per-token weight never yields a lower keep rate
    by_avg = sorted(
        (math.floor(math.floor(v[1] * 10000.0 + 0.5) / v[0]), v[2])
        for v in got.values()
    )
    assert all(a[1] <= b[1] for a, b in zip(by_avg, by_avg[1:]))


def test_lateral_topk_matches_window_plan(spark):
    """The LATERAL decorrelation and an explicit ranked-window plan are
    two routes to the same rows."""
    from pyspark.sql import Window

    from big_data_competition_dxc_spark.operators.lateral import LATERAL_TOP_K
    from big_data_competition_dxc_spark.sources import load

    lat = _df("lateral_topk_per_nation", spark)
    cust = load(spark, SF_TEST_DIR, "customer")
    nation = load(spark, SF_TEST_DIR, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ref = (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LATERAL_TOP_K)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal")
    )
    assert sorted(map(tuple, lat.collect())) == sorted(map(tuple, ref.collect()))


# ---------------------------------------------------------------------------
# Randomized property net (session-3 style): the same specs on ARBITRARY
# corpora, reaching the degenerate regimes the fixture can't — docs at
# or below the span width, single-bucket vector sets, corpora with zero
# or all target-language docs.
# ---------------------------------------------------------------------------

_word = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_word, min_size=1, max_size=12)


def _write_docs(tmp_path_factory, docs, langs=None):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop")
    texts = [" ".join(ws) for ws in docs]
    pd.DataFrame(
        {
            "doc_id": list(range(len(docs))),
            "text": texts,
            "lang": langs if langs is not None else ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=1, max_size=12))
def test_span_dedup_spec_on_random_corpora(spark, tmp_path_factory, docs):
    """Over a 3-word vocabulary almost every 8-gram duplicates, and
    doc lengths straddle SPAN_TOKENS — so both the everything-dup and
    the no-spans-at-all regimes occur. The Spark result must equal the
    from-scratch spec exactly (including docs with len == SPAN_TOKENS
    yielding one span, and shorter docs absent)."""
    sf = _write_docs(tmp_path_factory, docs)
    fp_docs = defaultdict(set)
    per_doc = {}
    for doc_id, ws in enumerate(docs):
        fps = [
            hashlib.md5(" ".join(ws[i : i + SPAN_TOKENS]).encode()).hexdigest()
            for i in range(len(ws) - SPAN_TOKENS + 1)
        ]
        per_doc[doc_id] = fps
        for fp in fps:
            fp_docs[fp].add(doc_id)
    dup = {fp for fp, ds in fp_docs.items() if len(ds) >= 2}
    expected = {}
    for doc_id, fps in per_doc.items():
        if not fps:
            continue
        occ = sum(1 for fp in fps if fp in dup)
        expected[doc_id] = (
            len(fps),
            occ,
            len({fp for fp in fps if fp in dup}),
            _round4(occ / len(fps)),
        )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_occ"], r["n_dup_fps"], r["dup_frac"])
        for r in plans.QUERIES["substring_span_dedup"].fn(spark, sf).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=1, max_size=12))
def test_span_scrub_spec_on_random_corpora(spark, tmp_path_factory, docs):
    """Same adversarial regime as the dedup property test — a 3-word
    vocabulary where overlapping dup spans cover most positions — plus
    the reconstruction invariants: scrubbing is idempotent-shaped
    (kept text length == n_tokens - n_removed) and an all-unique corpus
    passes through byte-identical."""
    sf = _write_docs(tmp_path_factory, docs)
    expected = _brute_scrub({i: ws for i, ws in enumerate(docs)})
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_scrubbed"])
        for r in plans.QUERIES["substring_span_scrub"].fn(spark, sf).collect()
    }
    assert got == expected
    for n_tokens, n_removed, text in got.values():
        kept = text.split(" ") if text else []
        assert len(kept) == n_tokens - n_removed


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0).map(
                lambda x: x if abs(x) > 1e-3 else 0.25
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_semantic_dedup_spec_on_random_vectors(spark, tmp_path_factory, vecs):
    """Random 8-dim vector sets (every component non-tiny, so norms are
    never zero and sign boundaries are stable): buckets, keepers, the
    index-order-fold cosine, and prune flags must match the from-scratch
    spec — including singleton buckets and the all-in-one-bucket case."""
    import pandas as pd

    from big_data_competition_dxc_spark.similarity.semdedup import (
        semantic_dedup_keep,
    )

    d = tmp_path_factory.mktemp("sem_prop")
    pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": vecs,
            "label": [0] * len(vecs),
        }
    ).to_parquet(d / "embeddings.parquet")

    bucket = {
        i: "".join("1" if v[j] >= 0 else "0" for j in range(SEM_BITS))
        for i, v in enumerate(vecs)
    }
    keeper = {}
    for i, b in bucket.items():
        keeper[b] = min(keeper.get(b, i), i)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    rows = semantic_dedup_keep(spark, str(d)).collect()
    assert sorted(r["vec_id"] for r in rows) == list(range(len(vecs)))
    for r in rows:
        assert r["bucket"] == bucket[r["vec_id"]]
        assert r["keeper_vec_id"] == keeper[r["bucket"]]
        expect = _round4(cos(vecs[r["vec_id"]], vecs[r["keeper_vec_id"]]))
        assert r["cos_to_keeper"] == expect
        assert r["pruned"] == int(
            r["vec_id"] != r["keeper_vec_id"] and expect >= SEM_TAU
        )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(_doc, st.sampled_from(["en", "xx"])),
        min_size=1,
        max_size=12,
    )
)
def test_dsir_spec_on_random_corpora(spark, tmp_path_factory, corpus):
    """Random corpora including ZERO-target and ALL-target language
    mixes (the fixture always has both): the hashed-model likelihood
    ratio with add-one smoothing must match the from-scratch spec in
    every regime — with no target docs, every bucket's target model is
    the uniform prior and weights are still finite."""
    from big_data_competition_dxc_spark.textops.dsir import (
        N_BUCKETS,
        TARGET_LANG,
        _UNIT,
        dsir_importance_weights,
    )

    docs = [ws for ws, _ in corpus]
    langs = [lang for _, lang in corpus]
    sf = _write_docs(tmp_path_factory, docs, langs)

    src_cnt: Counter = Counter()
    tgt_cnt: Counter = Counter()
    doc_buckets = {}
    for doc_id, (ws, lang) in enumerate(corpus):
        bs = [
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % N_BUCKETS
            for w in ws
        ]
        doc_buckets[doc_id] = bs
        for b in bs:
            src_cnt[b] += 1
            if lang == TARGET_LANG:
                tgt_cnt[b] += 1
    src_tot = sum(src_cnt.values())
    tgt_tot = sum(tgt_cnt.values())
    units = {
        b: math.floor(
            (
                math.log((tgt_cnt[b] + 1.0) / (tgt_tot + float(N_BUCKETS)))
                - math.log((src_cnt[b] + 1.0) / (src_tot + float(N_BUCKETS)))
            )
            * _UNIT
            + 0.5
        )
        for b in src_cnt
    }
    expected = {
        doc_id: (
            len(bs),
            _round4(sum(units[b] for b in bs) / float(_UNIT)),
        )
        for doc_id, bs in doc_buckets.items()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in dsir_importance_weights(spark, sf).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=1, max_size=12))
def test_span_islands_spec_on_random_corpora(spark, tmp_path_factory, docs):
    """Random 3-word corpora: overlapping dup spans merge into single
    islands, disjoint ones stay separate — the fold over the sorted
    covered array must agree with the from-scratch run detection in
    every regime (no coverage, full coverage, interior gaps)."""
    sf = _write_docs(tmp_path_factory, docs)
    expected = _brute_islands({i: ws for i, ws in enumerate(docs)})
    got = {
        r["doc_id"]: (r["n_covered"], r["n_islands"], r["max_run"])
        for r in plans.QUERIES["substring_span_islands"]
        .fn(spark, sf)
        .collect()
    }
    assert got == expected


def test_corpus_release_stage_invariants(spark, duck):
    """The r14 composition proof, recomputed from scratch in Python:
    every document lands in exactly one ledger tier, the tiers apply in
    the documented order (empty -> exact_dup -> scrub -> quality ->
    lang -> dsir), the quality gate runs on the SCRUBBED text, the
    span dup-set is scoped to the post-exact-dedup keeper corpus, and
    kept is a subset of the standalone DSIR resample keep-set."""
    docs = dict(duck.sql("SELECT doc_id, text FROM documents").fetchall())
    got = {
        r["doc_id"]: (r["kept"], r["drop_reason"], r["text_final"])
        for r in _df("corpus_release_pipeline", spark).collect()
    }
    assert set(got) == set(docs)  # exactly one ledger row per source doc

    empty = {d for d, t in docs.items() if t is None or t.strip(" ") == ""}
    by_md5 = defaultdict(list)
    for d, t in docs.items():
        if d not in empty:
            by_md5[hashlib.md5(t.encode()).hexdigest()].append(d)
    keepers = {min(v) for v in by_md5.values()}
    dups = set(docs) - empty - keepers

    # span scrub over the KEEPER corpus only
    words_of = {
        d: re.sub(r"\s+", " ", docs[d].strip(" ")).split(" ") for d in keepers
    }
    fp_docs: dict[str, set[int]] = defaultdict(set)
    fp_pos: dict[int, list[tuple[int, str]]] = defaultdict(list)
    for d, words in words_of.items():
        for i in range(len(words) - SPAN_TOKENS + 1):
            fp = hashlib.md5(
                " ".join(words[i : i + SPAN_TOKENS]).encode()
            ).hexdigest()
            fp_docs[fp].add(d)
            fp_pos[d].append((i, fp))
    dupset = {fp for fp, ds in fp_docs.items() if len(ds) >= 2}
    scrubbed = {}
    for d, words in words_of.items():
        cov: set[int] = set()
        for i, fp in fp_pos[d]:
            if fp in dupset:
                cov.update(range(i, i + SPAN_TOKENS))
        scrubbed[d] = [w for j, w in enumerate(words) if j not in cov]

    from big_data_competition_dxc_spark.textops.langid import LANG_STOPWORDS
    from big_data_competition_dxc_spark.textops.release import (
        QUALITY_MAX_AVG_LEN,
        QUALITY_MAX_TOKENS,
        QUALITY_MIN_AVG_LEN,
        QUALITY_MIN_TOKENS,
    )

    stops = set().union(*LANG_STOPWORDS.values())
    dsir_kept = {
        r["doc_id"]: r["kept"]
        for r in _df("dsir_resample_keep", spark).collect()
    }
    expected = {}
    for d in docs:
        if d in empty:
            expected[d] = (0, "empty", None)
        elif d in dups:
            expected[d] = (0, "exact_dup", None)
        else:
            kw = scrubbed[d]
            n, chars = len(kw), sum(len(w) for w in kw)
            if not (
                QUALITY_MIN_TOKENS <= n <= QUALITY_MAX_TOKENS
                and QUALITY_MIN_AVG_LEN * n <= chars <= QUALITY_MAX_AVG_LEN * n
            ):
                expected[d] = (0, "quality", None)
            elif not any(w.lower() in stops for w in kw):
                expected[d] = (0, "lang", None)
            elif dsir_kept[d] == 0:
                expected[d] = (0, "dsir", None)
            else:
                expected[d] = (1, None, " ".join(kw))
    assert got == expected

    kept_ids = {d for d, v in got.items() if v[0] == 1}
    assert kept_ids  # the release is non-degenerate on the fixture
    # kept rows and ONLY kept rows carry text; reasons are the 5 tiers
    for d, (kept, reason, text) in got.items():
        assert (kept == 1) == (reason is None) == (text is not None)
        assert reason in (None, "empty", "exact_dup", "quality", "lang", "dsir")
    # kept is a subset of the standalone DSIR keep-set
    assert all(dsir_kept[d] == 1 for d in kept_ids)
    # scrub-before-gate: the quality bounds hold on the SHIPPED text
    for d in kept_ids:
        toks = got[d][2].split(" ")
        n, chars = len(toks), sum(map(len, toks))
        assert QUALITY_MIN_TOKENS <= n <= QUALITY_MAX_TOKENS
        assert QUALITY_MIN_AVG_LEN * n <= chars <= QUALITY_MAX_AVG_LEN * n
    # the resampling stage really ran (both branches exercised); the
    # exact-dup and empty tiers are pinned on a synthetic corpus below
    # (the small-SF documents fixtures carry no exact dups)
    assert any(v[1] == "dsir" for v in got.values())


def test_corpus_release_dedup_and_empty_tiers(spark, tmp_path_factory):
    """The two ledger tiers the main fixture can't exercise: an exact
    copy must drop as 'exact_dup' (its lowest-doc_id twin survives the
    tier), and NULL/blank text must drop as 'empty' before any stage
    touches it."""
    import pandas as pd

    good = " ".join(["the cat sat on a mat and looked to that sky"] * 3)
    salad = " ".join(["zxqv wfpt krjm nbhd"] * 6)
    d = tmp_path_factory.mktemp("release_tiers")
    texts = [good, good, "   ", None, salad]
    pd.DataFrame(
        {
            "doc_id": [7, 3, 11, 12, 20],
            "text": texts,
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    ).to_parquet(d / "documents.parquet")
    got = {
        r["doc_id"]: (r["kept"], r["drop_reason"])
        for r in plans.QUERIES["corpus_release_pipeline"]
        .fn(spark, str(d))
        .collect()
    }
    assert got[7] == (0, "exact_dup")  # higher id of the identical pair
    assert got[11] == (0, "empty")
    assert got[12] == (0, "empty")
    assert got[20] == (0, "lang")  # no stopword hit in any language
    # the keeper cleared dedup AND the scrub/gate stages
    assert got[3][1] in (None, "dsir")
