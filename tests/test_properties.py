"""Hypothesis property tests: operator laws checked against independent
Python models on randomized inputs (bounded example counts — every example
round-trips through Spark).

These complement the fixture-based suites: the model is written from the
operator's CONTRACT, not its implementation, so a refactor that silently
changes semantics (e.g. the round-3 shingle restructure) trips a property
even where curated fixtures happen to agree.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_ecommerce_data_spark.functions.text import shingle_fingerprint
from etl_ecommerce_data_spark.operators.dedup import exact_dedup
from etl_ecommerce_data_spark.operators.joins import salted_join
from etl_ecommerce_data_spark.sources.incremental import merge_dataframes

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abcde", min_size=1, max_size=4)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@_SETTINGS
@given(
    current=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9), st.integers(0, 99)),
        max_size=20,
    ),
    updates=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9), st.integers(0, 99)),
        max_size=20,
    ),
)
def test_merge_latest_wins_matches_model(spark, current, updates):
    """merge_dataframes == per-key replay: greatest version wins, updates
    beat current on version ties; ties WITHIN a relation must not occur for
    the contract to be deterministic, so duplicate (key, version) rows are
    collapsed to their max payload first (deterministic input)."""
    cur = {}
    for k, v, p in current:
        cur[(k, v)] = max(cur.get((k, v), p), p)
    upd = {}
    for k, v, p in updates:
        upd[(k, v)] = max(upd.get((k, v), p), p)
    schema = "k long, ver long, payload long"
    cur_df = spark.createDataFrame(
        [(k, v, p) for (k, v), p in cur.items()], schema
    )
    upd_df = spark.createDataFrame(
        [(k, v, p) for (k, v), p in upd.items()], schema
    )
    got = {
        r["k"]: (r["ver"], r["payload"])
        for r in merge_dataframes(cur_df, upd_df, ["k"], "ver").collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for (k, v), p in cur.items():  # current first; updates overwrite ties
        if k not in want or v > want[k][0]:
            want[k] = (v, p)
    for (k, v), p in upd.items():
        if k not in want or v >= want[k][0]:
            want[k] = (v, p)
    assert got == want


@_SETTINGS
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)), max_size=25),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)), max_size=10),
    buckets=st.integers(1, 5),
    spread=st.booleans(),
)
def test_salted_join_equals_plain_join(spark, left, right, buckets, spread):
    """Salting is a physical rewrite only: row multiset of salted_join must
    equal the plain inner join for any bucket count, including salt
    collisions on identical rows and the spread_identical mode."""
    l_df = spark.createDataFrame(left or [(0, 0)], "k long, lv long")
    r_df = spark.createDataFrame(right or [(0, 0)], "k long, rv long")
    plain = sorted(
        tuple(r) for r in l_df.join(r_df, "k", "inner").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(
            l_df, r_df, "k", salt_buckets=buckets, spread_identical=spread
        ).collect()
    )
    assert salted == plain


@_SETTINGS
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_shingle_fingerprint_matches_python_model(spark, texts):
    """Min-md5 over rolling 3-token shingles, modeled independently in
    Python — pins the zip_with/shifted-slice formulation to the contract."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", shingle_fingerprint(F.col("t"), k=3).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) >= 3:
            want = min(
                hashlib.md5(" ".join(toks[j : j + 3]).encode()).hexdigest()
                for j in range(len(toks) - 2)
            )
        else:
            want = hashlib.md5(t.encode()).hexdigest()
        assert got[i] == want, (i, t)


@_SETTINGS
@given(
    rows=st.lists(st.tuples(st.integers(0, 50), _text), min_size=1, max_size=30)
)
def test_exact_dedup_matches_model(spark, rows):
    """One survivor per distinct text: min id, correct multiplicity."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["content_hash"]: (r["doc_id"], r["dup_count"])
        for r in exact_dedup(df).collect()
    }
    want: dict[str, tuple[int, int]] = {}
    for i, t in rows:
        h = hashlib.md5(t.encode()).hexdigest()
        prev = want.get(h)
        want[h] = (i if prev is None else min(prev[0], i), 1 if prev is None else prev[1] + 1)
    assert got == want


@_SETTINGS
@given(texts=st.lists(_text, min_size=1, max_size=8), k=st.integers(2, 6))
def test_shingle_set_matches_python_model(spark, texts, k):
    """shingle_set == the distinct md5 k-gram set computed in plain Python;
    docs shorter than k tokens contribute exactly [md5(text)]."""
    from etl_ecommerce_data_spark.functions.text import shingle_set

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: sorted(r.s)
        for r in df.select("i", shingle_set(F.col("t"), k).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) >= k:
            want = sorted(
                {
                    hashlib.md5(" ".join(toks[j : j + k]).encode()).hexdigest()
                    for j in range(len(toks) - k + 1)
                }
            )
        else:
            want = [hashlib.md5(t.encode()).hexdigest()]
        assert got[i] == want, (i, t)


@_SETTINGS
@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=15),
    cap=st.sampled_from([8, 16, 512]),
)
def test_pack_offsets_match_python_model(spark, toks, cap):
    """The concat-and-chunk packing arithmetic == a sequential Python fold:
    running offsets, start/end chunk ids, span counts."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tokens long"
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = df.withColumn("cum", F.sum("n_tokens").over(w))
    out = {
        r.doc_id: (r.start, r.sc, r.ec)
        for r in c.select(
            "doc_id",
            (F.col("cum") - F.col("n_tokens")).alias("start"),
            F.floor((F.col("cum") - F.col("n_tokens")) / cap).alias("sc"),
            F.floor((F.col("cum") - 1) / cap).alias("ec"),
        ).collect()
    }
    off = 0
    for i, n in enumerate(toks):
        assert out[i] == (off, off // cap, (off + n - 1) // cap)
        off += n


@_SETTINGS
@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=12
    )
)
def test_quantize_checksum_matches_python_model(spark, vals):
    """The embedding-quantization checksum == the same IEEE arithmetic done
    in Python: floor((x-min)*255/(max-min)) weighted by 1-based position."""
    import math

    df = spark.createDataFrame([(0, vals)], "vec_id long, embedding array<float>")
    vmin = F.array_min("embedding").cast("double")
    vmax = F.array_max("embedding").cast("double")
    base = df.select("vec_id", vmin.alias("vmin"), vmax.alias("vmax"), "embedding")
    qv = lambda x: F.when(  # noqa: E731
        F.col("vmax") == F.col("vmin"), F.lit(0).cast("long")
    ).otherwise(
        F.floor((x.cast("double") - F.col("vmin")) * 255.0 / (F.col("vmax") - F.col("vmin")))
    )
    checksum = F.aggregate(
        F.transform("embedding", lambda x, i: qv(x) * (i + F.lit(1)).cast("long")),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    got = base.select(checksum.alias("c")).collect()[0].c
    fvals = [float(__import__("numpy").float32(v)) for v in vals]
    lo, hi = min(fvals), max(fvals)
    want = sum(
        (0 if hi == lo else int(math.floor((x - lo) * 255.0 / (hi - lo)))) * (i + 1)
        for i, x in enumerate(fvals)
    )
    assert got == want


@given(
    st.lists(
        st.tuples(st.sets(st.integers(0, 50), min_size=1, max_size=30),
                  st.sets(st.integers(0, 50), min_size=1, max_size=30)),
        min_size=1, max_size=20,
    ),
    st.sampled_from([0.3, 0.5, 0.6, 0.8]),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_size_ratio_prefilter_is_lossless(spark, pairs, threshold):
    """_size_ratio_ok must NEVER reject a pair whose exact Jaccard >= t
    (the lossless-prefilter contract minhash_lsh_pairs relies on)."""
    from etl_ecommerce_data_spark.operators.dedup import _size_ratio_ok

    rows = [
        (len(a), len(b), len(a & b) / len(a | b)) for a, b in pairs
    ]
    df = spark.createDataFrame(rows, "n_a long, n_b long, jaccard double")
    violated = df.filter(
        (F.col("jaccard") >= threshold)
        & ~_size_ratio_ok(F.col("n_a"), F.col("n_b"), threshold)
    ).count()
    assert violated == 0


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=4, max_size=4),
       st.lists(st.integers(-(2**63), 2**63 - 1), min_size=4, max_size=4))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hamming_words_matches_python_popcount(spark, wa, wb):
    from etl_ecommerce_data_spark.operators.similarity import _hamming_words

    expect = sum(bin((a ^ b) & (2**64 - 1)).count("1") for a, b in zip(wa, wb))
    df = spark.createDataFrame([(wa, wb)], "a array<long>, b array<long>")
    got = df.select(_hamming_words(F.col("a"), F.col("b"), 4).alias("h")).first()["h"]
    assert got == expect


def test_prefilter_max_ham_monotone_and_sane():
    """Higher cosine thresholds must give tighter (smaller) Hamming cuts, and
    the cut must sit between the true-pair mean and the random-pair mean so
    it can separate at all."""
    from etl_ecommerce_data_spark.operators.similarity import _prefilter_max_ham

    cuts = [_prefilter_max_ham(t, 256) for t in (0.2, 0.4, 0.6, 0.8, 0.95)]
    assert cuts == sorted(cuts, reverse=True)
    import math
    for t in (0.2, 0.4, 0.6, 0.8):
        q = math.acos(t) / math.pi
        # the cut always accepts the true-pair mean; from threshold 0.4 up
        # it also sits below the random-pair mean (128) so it separates —
        # at looser thresholds the gate degrades to weak, never to lossy
        assert 256 * q <= _prefilter_max_ham(t, 256)
        if t >= 0.4:
            assert _prefilter_max_ham(t, 256) < 128


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False, allow_infinity=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bucket_blas_near_dup_matches_numpy_model(spark, vecs):
    """The banded group-and-verify path == a fully independent numpy model
    of the SAME contract (deterministic SRP planes → packed signature →
    band buckets → exact in-bucket cosine ≥ t): identical pair sets, and
    cosines equal to the model's within float tolerance. Zero vectors make
    nan cosines, which the contract excludes on both sides."""
    import numpy as np

    from etl_ecommerce_data_spark.operators.similarity import (
        _planes_matrix,
        embedding_near_dup_pairs,
    )

    from hypothesis import assume

    threshold, num_bits, bands, dim = 0.5, 8, 2, 4
    width = num_bits // bands
    mat = np.array(vecs, dtype=np.float64)
    dots = mat @ _planes_matrix(num_bits, dim).T
    # sign bits are well-defined only away from exact cancellation: BLAS
    # accumulation order differs between processes (found by this very
    # test — a ±1e-38 residue of (1-1) rounds to 0 or survives depending
    # on the K-loop order), so examples whose banding depends on a
    # float64-epsilon tie are out of the contract. All-zero vectors are
    # safe (every product is a signed zero in any order).
    zero_rows = (mat == 0).all(axis=1)
    assume(bool((zero_rows[:, None] | (np.abs(dots) > 1e-9)).all()))
    bits = dots >= 0
    words = np.zeros(len(vecs), dtype=np.uint64)
    for j in range(num_bits):
        words |= bits[:, j].astype(np.uint64) << np.uint64(j)
    nrm = np.linalg.norm(mat, axis=1)
    expect = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            collides = any(
                (int(words[i]) >> (b * width)) & ((1 << width) - 1)
                == (int(words[j]) >> (b * width)) & ((1 << width) - 1)
                for b in range(bands)
            )
            if not collides or nrm[i] == 0 or nrm[j] == 0:
                continue
            cos = float(mat[i] @ mat[j]) / (nrm[i] * nrm[j])
            assume(abs(cos - threshold) > 1e-9)  # same tie rule at the cut
            if cos >= threshold:
                expect[(i, j)] = cos

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in embedding_near_dup_pairs(
            df, threshold=threshold, exact=False,
            num_bits=num_bits, bands=bands, dim=dim,
        ).collect()
    }
    assert set(got) == set(expect), (set(got) ^ set(expect))
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False, allow_infinity=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=20,
    ),
    chunk_cells=st.integers(1, 50),
)
@settings(max_examples=25, deadline=None)
@example(
    vecs=[[1.0, 5.960464477539063e-08, 1.0],
     [0.5, -9.999999747378752e-06, 0.5]],
    chunk_cells=1,
).via('discovered failure')
def test_bucket_blas_verify_chunking_invariant(vecs, chunk_cells):
    """_bucket_blas_verify must emit the same pairs for ANY chunk size —
    chunking is a memory bound, never a semantics knob (each pair must be
    seen exactly once per direction regardless of which chunk row i lands
    in)."""
    import numpy as np
    import pandas as pd

    from etl_ecommerce_data_spark.operators.similarity import _bucket_blas_verify

    pdf = pd.DataFrame(
        {
            "vec_a": np.arange(len(vecs), dtype=np.int64),
            "__va": [np.array(v, dtype=np.float64) for v in vecs],
        }
    )
    tiny = _bucket_blas_verify(0.3, chunk_cells=chunk_cells)(pdf)
    big = _bucket_blas_verify(0.3, chunk_cells=10**9)(pdf)
    key = lambda d: sorted(map(tuple, d[["vec_a", "vec_b"]].values.tolist()))
    assert key(tiny) == key(big)
    merged = tiny.merge(big, on=["vec_a", "vec_b"], suffixes=("_t", "_b"))
    assert (merged["cosine_sim_t"] == merged["cosine_sim_b"]).all()


def test_sweep_window_is_exactly_driver_sized_and_unique():
    """The driver checks ~50 correctness rows per round; _SWEEP_FIRST is the
    rotation window. It must be exactly 50 (a 51st entry silently drops the
    tail query's fresh evidence), duplicate-free (a dupe wastes a slot), and
    every name must resolve — and the registry reordering must actually put
    the window first, or the rotation is a no-op."""
    from etl_ecommerce_data_spark.plans.queries import QUERIES, _SWEEP_FIRST

    assert len(_SWEEP_FIRST) == 50
    assert len(set(_SWEEP_FIRST)) == 50
    assert list(QUERIES)[:50] == _SWEEP_FIRST


def test_bench_headline_queries_all_registered():
    """bench.py must never KeyError at driver bench time: every HEADLINE and
    _SETUP_ONCE name must exist in the registry."""
    import bench

    from etl_ecommerce_data_spark.plans.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
    assert set(bench._SETUP_ONCE) <= set(QUERIES)


# --- corpus boilerplate removal ---------------------------------------------
# Model: split each text into fixed-size token chunks (last ragged); a chunk
# kept by >= min_docs distinct docs is dropped everywhere; order preserved.

def _model_boilerplate(texts, chunk_tokens, min_docs):
    def chunks_of(t):
        toks = t.split(" ")
        return [" ".join(toks[i : i + chunk_tokens]) for i in range(0, max(len(toks), 1), chunk_tokens)]

    per_doc = {i: chunks_of(t) for i, t in enumerate(texts)}
    from collections import Counter

    df = Counter()
    for cs in per_doc.values():
        for c in set(cs):
            df[c] += 1
    out = {}
    for i, cs in per_doc.items():
        # '' (empty/whitespace-only text) is never boilerplate: emptiness
        # shared by many docs is absence of content, not shared content
        kept = [c for c in cs if c == "" or df[c] < min_docs]
        out[i] = (" ".join(kept), len(cs), len(cs) - len(kept))
    return out


@_SETTINGS
@given(texts=st.lists(_text, min_size=1, max_size=10))
def test_boilerplate_removal_matches_model(spark, texts):
    from etl_ecommerce_data_spark.operators.dedup import boilerplate_removal

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_chunks"], r["n_removed"])
        for r in boilerplate_removal(df, chunk_tokens=3, min_docs=2).collect()
    }
    assert got == _model_boilerplate(texts, chunk_tokens=3, min_docs=2)


def test_boilerplate_removal_identity_on_unique_corpus(spark):
    # No chunk repeats across docs -> every doc survives verbatim.
    texts = [f"u{i} v{i} w{i} x{i} y{i}" for i in range(6)]
    from etl_ecommerce_data_spark.operators.dedup import boilerplate_removal

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r["doc_id"]: r for r in boilerplate_removal(df, chunk_tokens=2, min_docs=2).collect()}
    for i, t in enumerate(texts):
        assert rows[i]["clean_text"] == t
        assert rows[i]["n_removed"] == 0


def test_boilerplate_removal_keeps_null_text_docs(spark):
    # The one-row-per-doc contract must include null-text rows: posexplode
    # of chunk_texts(NULL) would silently drop the doc (ADVICE r5); the
    # operator coalesces to '' so the doc survives with empty clean_text.
    from etl_ecommerce_data_spark.operators.dedup import boilerplate_removal

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, None), (2, "a b c d"), (3, "a b c d")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in boilerplate_removal(df, chunk_tokens=4, min_docs=3).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[1]["clean_text"] == "" and rows[1]["n_removed"] == 0
    for i in (0, 2, 3):  # the repeated chunk is boilerplate and removed
        assert rows[i]["clean_text"] == "" and rows[i]["n_removed"] == 1


def test_boilerplate_removal_empty_chunk_never_boilerplate(spark):
    # >= min_docs text-less docs share the '' chunk; it must NOT classify
    # as boilerplate — empty docs report zero removals, and the doc with
    # real repeated content still gets its removal counted.
    from etl_ecommerce_data_spark.operators.dedup import boilerplate_removal

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, ""), (3, "x y"), (4, "x y"), (5, "x y")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in boilerplate_removal(df, chunk_tokens=2, min_docs=3).collect()}
    assert set(rows) == set(range(6))
    for i in (0, 1, 2):  # empty docs: one '' chunk, zero phantom removals
        assert rows[i]["clean_text"] == "" and rows[i]["n_removed"] == 0
    for i in (3, 4, 5):  # the real shared chunk is still removed
        assert rows[i]["clean_text"] == "" and rows[i]["n_removed"] == 1


# --- PII redaction vs Python re ---------------------------------------------
# Independent model: Python's re module applies the same patterns. Pins the
# Java-regex semantics (greediness, \b, class ranges) against a third engine
# beyond the DuckDB oracle.

_pii_piece = st.one_of(
    st.text(alphabet="abc ", min_size=1, max_size=8),
    st.builds(lambda n: f"user{n}@example.com", st.integers(0, 99)),
    st.builds(lambda a, b: f"10.{a}.{b}.7", st.integers(0, 255), st.integers(0, 255)),
    st.builds(lambda n: f"555-{n:04d}", st.integers(0, 9999)),
    st.builds(lambda n: f"{n}.{n}", st.integers(0, 99)),  # decimal non-match
)
_pii_text = st.lists(_pii_piece, min_size=0, max_size=6).map(" ".join)


@_SETTINGS
@given(text=_pii_text)
def test_pii_redact_matches_python_re(spark, text):
    import re

    from etl_ecommerce_data_spark.functions.text import (
        PII_ORDER,
        PII_PATTERNS,
        pii_counts,
        pii_redact,
    )

    want = text
    for k in PII_ORDER:
        pat, repl = PII_PATTERNS[k]
        want = re.sub(pat, repl, want)
    want_counts = {k: len(re.findall(PII_PATTERNS[k][0], text)) for k in PII_ORDER}

    df = spark.createDataFrame([(text,)], "text string")
    counts = pii_counts(F.col("text"))
    row = df.select(
        pii_redact(F.col("text")).alias("red"),
        *[counts[k].alias(k) for k in PII_ORDER],
    ).first()
    assert row["red"] == want
    assert {k: row[k] for k in PII_ORDER} == want_counts


# --- doc rarity score vs Python model ---------------------------------------

@_SETTINGS
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_doc_rarity_score_matches_model(spark, texts):
    from collections import Counter

    # model: distinct tokens per doc, document frequency, corpus-mean DF
    per_doc = {i: sorted(set(t.split(" "))) for i, t in enumerate(texts)}
    dfreq = Counter()
    for toks in per_doc.values():
        for t in toks:
            dfreq[t] += 1
    mean_df = sum(dfreq.values()) / len(dfreq)

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    tok = df.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token")
    )
    dfr = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scal = dfr.agg((F.sum("n_docs").cast("double") / F.count(F.lit(1))).alias("mean_df"))
    j = tok.join(dfr, "token").crossJoin(F.broadcast(scal))
    is_rare = (F.col("n_docs").cast("double") < F.col("mean_df")).cast("long")
    got = {
        r["doc_id"]: (r["nd"], r["nr"])
        for r in j.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum(is_rare).alias("nr"))
        .collect()
    }
    for i, toks in per_doc.items():
        want_rare = sum(1 for t in toks if dfreq[t] < mean_df)
        assert got[i] == (len(toks), want_rare), i


# --- event-type drift vs Python model ---------------------------------------

@_SETTINGS
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 10_000)),
        min_size=2,
        max_size=40,
    )
)
def test_event_type_drift_matches_model(spark, events):
    # model: pivot = (min+max)//2 over micros; per-type counts per half
    us = [u for _, u in events]
    pv = (min(us) + max(us)) // 2
    from collections import Counter

    first = Counter(t for t, u in events if u < pv)
    second = Counter(t for t, u in events if u >= pv)

    df = spark.createDataFrame(events, "event_type string, us long")
    pivot = df.agg(F.expr("div(min(us) + max(us), 2)").cast("long").alias("pv"))
    got = {
        r["event_type"]: (r["n_first"], r["n_second"])
        for r in df.crossJoin(F.broadcast(pivot))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("us") < F.col("pv"), 1).otherwise(0)).cast("long").alias("n_first"),
            F.sum(F.when(F.col("us") >= F.col("pv"), 1).otherwise(0)).cast("long").alias("n_second"),
        )
        .collect()
    }
    for t in set(first) | set(second):
        assert got[t] == (first[t], second[t]), t


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False, allow_infinity=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=6,
        max_size=24,
    ),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_embedding_star_cap_contract_property(spark, vecs):
    """Operator-level star-cap contract on RANDOM corpora (round 7 — the
    floor query pins it on the shipped corpus; this pins it for any input):
    with a tiny bucket_cap forcing the star path, (a) capped pairs are a
    subset of uncapped pairs, (b) every emitted pair's cosine clears the
    threshold per an independent numpy model, and (c) every true
    (anchor, member) pair inside an oversized bucket — buckets, anchors and
    truth derived in a PURE-NUMPY replica of the SRP banding
    (_plane_sign is driver-side md5 parity, no Spark dependency) — appears
    in the capped output."""
    import numpy as np
    from hypothesis import assume

    from etl_ecommerce_data_spark.operators.similarity import (
        _plane_sign,
        embedding_near_dup_pairs,
    )

    dim, num_bits, bands, cap, threshold = 4, 8, 4, 2, 0.5
    width = num_bits // bands
    mat = np.array(vecs, dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    valid = np.nonzero(nrm > 0)[0]
    assume(len(valid) >= 4)

    # pure-python SRP model: same plane family, same packing, same bucket
    # formula (width-offset by dim) as the operator
    planes = np.array(
        [[_plane_sign(b, d) for d in range(dim)] for b in range(num_bits)]
    )
    proj = mat[valid] @ planes.T  # (n_valid, num_bits)
    # discard sign-ambiguous examples: a projection at exactly 0.0 decides
    # a bit by >= 0, and an ulp of accumulation difference between the
    # model's matmul and the kernel's per-batch matmul could flip it
    assume(np.abs(proj).min() > 1e-12)
    bits = (proj >= 0).astype(np.int64)  # bit j = plane j
    words = np.zeros(len(valid), dtype=np.int64)
    for j in range(num_bits):
        words |= bits[:, j] << j
    buckets = {}  # (band, bucket) -> [vec ids]
    for row, vid in enumerate(valid):
        for band in range(bands):
            b = ((words[row] >> (band * width)) & ((1 << width) - 1)) + dim * (
                1 << width
            )
            buckets.setdefault((band, b), []).append(int(vid))

    with np.errstate(divide="ignore", invalid="ignore"):
        cos = (mat @ mat.T) / np.outer(nrm, nrm)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).repartition(3)
    kw = dict(threshold=threshold, exact=False, num_bits=num_bits,
              bands=bands, dim=dim)
    capped = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(df, bucket_cap=cap, **kw).collect()
    }
    uncapped = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(df, bucket_cap=None, **kw).collect()
    }
    # (a) the cap only removes pairs
    assert capped <= uncapped, capped - uncapped
    # (b) no false pairs in either regime (ulp tolerance at the boundary)
    for a, b in uncapped:
        assert cos[a, b] >= threshold - 1e-9, (a, b, cos[a, b])
    # (c) anchor completeness: true star pairs must be listed (pairs
    # strictly above the boundary only — a boundary-grazing pair may
    # legitimately fall on either side of the engine's float fold)
    for (band, b), members in buckets.items():
        if len(members) <= cap:
            continue
        anchor = min(members)
        for m in members:
            if m == anchor:
                continue
            pair = (min(anchor, m), max(anchor, m))
            if cos[pair[0], pair[1]] >= threshold + 1e-9:
                assert pair in capped, (band, b, pair, cos[pair[0], pair[1]])


def test_srp_kernel_matches_plane_sign_at_production_config(spark):
    """Pin the shared SRP signature kernel at the PRODUCTION configuration
    (driver ADVICE r7): embedding_star_cap_floor's truth-side banding pass
    reuses _srp_words_udf, so its independence claim is scoped to the
    banding/plan machinery — the kernel itself is pinned HERE, at the
    floor's exact shape (num_bits=48, dim=64) on the real sf0.001 corpus,
    against a from-scratch per-bit _plane_sign derivation (no
    _planes_matrix, no packbits/int64-view — an independent packing). A
    kernel regression therefore cannot green the floor vacuously: this
    test goes red even when the floor's operator and truth sides move in
    lockstep."""
    import numpy as np

    from etl_ecommerce_data_spark.operators.similarity import (
        _plane_sign,
        _srp_words_udf,
    )
    from etl_ecommerce_data_spark.sources.registry import load_table

    from tests.conftest import SF_SMOKE

    num_bits, dim = 48, 64
    emb = load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    rows = emb.select(
        "vec_id",
        "embedding",
        _srp_words_udf(num_bits, dim)(F.col("embedding")).alias("words"),
    ).collect()
    assert len(rows) >= 50

    planes = np.array(
        [[_plane_sign(b, d) for d in range(dim)] for b in range(num_bits)]
    )
    n_ambiguous = 0
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        proj = planes @ v
        if np.abs(proj).min() <= 1e-9:
            # sign at exact cancellation depends on BLAS accumulation
            # order — outside the deterministic contract (same rule as
            # test_bucket_blas_near_dup_matches_numpy_model)
            n_ambiguous += 1
            continue
        word = 0
        for j in range(num_bits):
            if proj[j] >= 0:
                word |= 1 << j
        expect = word - (1 << 64) if word >= (1 << 63) else word
        assert list(r["words"]) == [expect], (r["vec_id"], r["words"], expect)
    # the comparison must actually bite: ambiguous rows are the exception
    assert n_ambiguous <= len(rows) // 10, n_ambiguous


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["ab", "ba", "abc", "a", "b", "cab"]),
            min_size=0,
            max_size=5,
        ).map(" ".join),
        min_size=2,
        max_size=24,
    ),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_linkage_blocked_pairs_match_python_model(spark, docs):
    """Operator-level linkage contract on RANDOM corpora (round 8 — the
    floor query pins it on the shipped corpus; this pins it for any input):
    blocked_levenshtein_pairs must equal, EXACTLY (pair set AND distance
    values), a from-scratch python model of its declared semantics — block
    on the first two space-split tokens, drop blocks outside [2, cap],
    keep within-block pairs with full-DP edit distance <= max_distance.
    The tiny vocab forces block collisions so both the kept-block and the
    dropped-block regimes are exercised; the model's classic O(len²) DP
    cross-checks the operator's banded bounded DP on arbitrary strings,
    including empty texts and empty tokens from repeated separators."""
    from etl_ecommerce_data_spark.operators.linkage import (
        blocked_levenshtein_pairs,
    )

    cap, max_d = 3, 2

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    blocks: dict[str, list[int]] = {}
    for i, text in enumerate(docs):
        # model the exact key expression: split on single spaces (repeated
        # separators yield empty tokens), first two tokens, re-joined
        blocks.setdefault(" ".join(text.split(" ")[:2]), []).append(i)
    expect = set()
    for members in blocks.values():
        if not 2 <= len(members) <= cap:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                d = lev(docs[i], docs[j])
                if d <= max_d:
                    expect.add((i, j, d))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    ).repartition(3)
    got = {
        (r["id_l"], r["id_r"], r["distance"])
        for r in blocked_levenshtein_pairs(
            df, "doc_id", "text",
            n_block_tokens=2, max_distance=max_d, max_block_size=cap,
        ).collect()
    }
    assert got == expect


@given(
    s=st.lists(st.tuples(st.sampled_from("abcd")), max_size=30),
    o=st.lists(st.tuples(st.sampled_from("abcd")), max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_diff_rows_reports_iff_multisets_differ(s, o):
    """The shared mismatch diff (testing.diff_rows): some row is reported
    IFF the two sides differ AS MULTISETS — equal multisets yield an empty
    diff, a pure set-level difference is reported directly (as the row
    tuple itself), and a multiplicity-only difference reaches the Counter
    fallback, which renders pre-formatted STRINGS (ADVICE r12: a string
    can never collide with a data-row tuple, so no shape heuristic is
    needed to tell the two apart — a plain isinstance check suffices)."""
    import re
    from collections import Counter

    from etl_ecommerce_data_spark.testing import diff_rows

    s, o = sorted(s), sorted(o)  # callers pass normalize() output (sorted)
    only_s, only_o = diff_rows(s, o)
    if Counter(s) == Counter(o):
        assert only_s == [] and only_o == []
    else:
        assert only_s or only_o
        # every reported plain row really is one-sided; every Counter
        # multiplicity entry is a rendered string whose counts agree with
        # a real count disagreement in the declared direction
        for reported, mine, theirs in ((only_s, s, o), (only_o, o, s)):
            for r in reported:
                if isinstance(r, str):
                    m = re.fullmatch(r"(.*) x(\d+) vs x(\d+)", r)
                    assert m, f"unparseable multiplicity entry: {r!r}"
                    # recover the row from its rendering — and insist the
                    # rendering is unambiguous first: two distinct rows with
                    # equal str() (e.g. 1 vs True under a future strategy)
                    # would otherwise let next() pick the WRONG row and
                    # flake the count assertions (ADVICE r13). The current
                    # strategy (tuples of single chars) renders injectively,
                    # so this fails loudly only if the strategy changes.
                    matches = [
                        row for row in Counter(mine) if f"{row}" == m.group(1)
                    ]
                    assert len(matches) == 1, (
                        f"rendered row {m.group(1)!r} maps to {len(matches)} "
                        "Counter keys — strategy generates str()-colliding "
                        "rows; make the recovery repr-unique"
                    )
                    row = matches[0]
                    assert Counter(mine)[row] == int(m.group(2))
                    assert Counter(theirs)[row] == int(m.group(3))
                    assert int(m.group(2)) > int(m.group(3))
                else:
                    assert isinstance(r, tuple)
                    assert r in mine and r not in theirs
