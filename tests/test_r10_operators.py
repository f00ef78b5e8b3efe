"""Round-10 operators: BPE apply (train + encode) and multimodal
perceptual near-dup — semantics vs an independent in-test reference
implementation, plus the plan-shape guarantees the 100 TB story rests on
(encode is shuffle-free; candidate pairing is a bucket equi-join)."""

from __future__ import annotations

import collections
import hashlib
import re

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.pipeline import multimodal as MM
from kylin_on_parquet_v2_spark.pipeline.text import bpe_encode, bpe_learn_merges


# --- BPE ---------------------------------------------------------------


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


def _ref_bpe(texts: dict[int, str], k: int):
    """Independent classic BPE (Sennrich et al. 2016): symbol tuples, count
    adjacent pairs weighted by word freq, merge all non-overlapping
    occurrences left-to-right; ties on (count desc, 'a b' string asc)."""
    vocab = collections.Counter()
    for t in texts.values():
        for w in _norm(t).split(" "):
            if len(w) >= 2:
                vocab[tuple(w)] += 1
    merges = []
    v = dict(vocab)
    for _ in range(k):
        pc = collections.Counter()
        for syms, f in v.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), _n = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )[0]
        merges.append((a, b))
        nv: dict = {}
        for syms, f in v.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        v = nv

    def encode(w: str):
        s = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    return merges, encode


TEXTS = {
    1: "low low low lower lowest",
    2: "new newer newest low  Low",
    3: "widest wide low new a",
    4: "ne ne ne nene nenene",  # consecutive-pair runs (the replace trap)
    5: "it's 100% d'accord -- punct.uation stays",
}


def test_bpe_matches_reference_implementation(spark):
    docs = spark.createDataFrame(
        list(TEXTS.items()), "doc_id long, text string"
    )
    merges = bpe_learn_merges(docs, n_merges=6)
    ref_merges, ref_encode = _ref_bpe(TEXTS, 6)
    assert merges == ref_merges
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["tok_md5"])
           for r in bpe_encode(docs, merges).collect()}
    for d, t in TEXTS.items():
        toks = []
        for w in _norm(t).split(" "):
            if w:
                toks += ref_encode(w)
        assert got[d] == (
            len(toks),
            hashlib.md5((" ".join(toks)).encode()).hexdigest(),
        ), (d, toks)


def test_bpe_encode_is_shuffle_free(spark):
    """The encode half must be a map-side expression pass over the scan —
    the property that makes a 100 TB corpus encode one pass, no exchange."""
    docs = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    enc = bpe_encode(docs, [("l", "o"), ("lo", "w")])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and no Python evaluation anywhere: pure JVM expressions
    assert "Python" not in plan, plan


# --- perceptual near-dup ------------------------------------------------


def _assets(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in rows],
        "asset_id long, media_type string, payload binary",
    )


def test_dhash_gradient_and_padding(spark):
    # strictly increasing byte%64 strip -> every difference bit set
    inc = bytes(range(33))
    flat = bytes([7] * 33)
    short = b"ab"  # bytes past the end read as 0
    out = {
        r["asset_id"]: r["dhash"]
        for r in MM.dhash_features(_assets(spark, [(1, inc), (2, flat), (3, short)])).collect()
    }
    assert out[1] == (1 << 32) - 1
    assert out[2] == 0
    # 'a'(97%64=33) -> 'b'(98%64=34): bit0 set; 'b' -> pad 0: bit1 clear
    assert out[3] == 1


def test_banded_pairs_equal_bruteforce(spark):
    """Pigeonhole completeness in practice: banded candidate generation +
    hamming verify == brute-force all-pairs, bit for bit."""
    import random

    rng = random.Random(7)
    payloads = []
    base = bytes(rng.randrange(256) for _ in range(40))
    for i in range(30):
        b = bytearray(base)
        for _ in range(rng.randrange(0, 4)):
            b[rng.randrange(40)] ^= rng.randrange(1, 255)
        payloads.append((i, bytes(b)))
    hashed = MM.dhash_features(_assets(spark, payloads))
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in MM.perceptual_neardup_pairs(hashed, max_hamming=3).collect()
    )
    h = {r["asset_id"]: r["dhash"] for r in hashed.collect()}
    want = sorted(
        (a, b, bin(h[a] ^ h[b]).count("1"))
        for a in h
        for b in h
        if a < b and bin(h[a] ^ h[b]).count("1") <= 3
    )
    assert got == want and len(want) > 0


def test_perceptual_pairing_is_bucket_equi_join(spark):
    """Candidate pairing must be a (band, val) equi-join — never a
    cartesian/nested-loop pass over all asset pairs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashed = MM.dhash_features(MM.synthesize_assets(docs))
    pairs = MM.perceptual_neardup_pairs(hashed, max_hamming=3)
    pairs.collect()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan), plan
    assert re.search(r"(?i)\bband\b", plan), plan


def test_max_hamming_must_stay_under_band_count(spark):
    """max_hamming >= n_bands voids the pigeonhole exactness guarantee —
    the operator refuses rather than silently under-reporting."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashed = MM.dhash_features(MM.synthesize_assets(docs.limit(5)))
    with pytest.raises(ValueError, match="pigeonhole"):
        MM.perceptual_neardup_pairs(hashed, max_hamming=4)


def test_bpe_merges_persist_and_reload(spark, tmp_path):
    """A reloaded merge list encodes identically — the tokenizer artifact
    survives process restarts like the IVF quantizer and the dictionary."""
    import pytest

    from kylin_on_parquet_v2_spark.pipeline.text import (
        load_bpe_merges,
        save_bpe_merges,
    )

    docs = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    merges = bpe_learn_merges(docs, n_merges=5)
    path = str(tmp_path / "tok" / "merges.json")
    save_bpe_merges(path, merges, spark, meta={"corpus": "unit"})
    reloaded = load_bpe_merges(path, spark)
    assert reloaded == merges  # order preserved exactly
    a = sorted(map(tuple, bpe_encode(docs, merges).collect()))
    b = sorted(map(tuple, bpe_encode(docs, reloaded).collect()))
    assert a == b

    # version / shape guards fail loudly
    import json

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"version": 99, "n_merges": 0, "merges": []}))
    with pytest.raises(ValueError, match="version"):
        load_bpe_merges(str(bad), spark)
    bad.write_text(
        json.dumps({"version": 1, "n_merges": 2, "merges": [["a", "b"]]})
    )
    with pytest.raises(ValueError, match="corrupt"):
        load_bpe_merges(str(bad), spark)


# --- property: BPE == reference on adversarial random corpora ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

#: two-letter alphabet maximizes merge collisions and consecutive-pair
#: runs (aaaa, abab) — exactly where left-to-right merge application and
#: tiebreaks can silently diverge
_WORD = st.text(alphabet="ab", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=1, max_size=6).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_DOC, min_size=1, max_size=6))
def test_bpe_property_matches_reference(spark, docs):
    texts = {i + 1: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    merges = bpe_learn_merges(df, n_merges=3)
    ref_merges, ref_encode = _ref_bpe(texts, 3)
    assert merges == ref_merges
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["tok_md5"])
           for r in bpe_encode(df, merges).collect()}
    for d, t in texts.items():
        toks = []
        for w in _norm(t).split(" "):
            if w:
                toks += ref_encode(w)
        assert got[d] == (
            len(toks),
            hashlib.md5((" ".join(toks)).encode()).hexdigest(),
        ), (d, t, toks, merges)
