"""Property-based (hypothesis) invariants for the round-5 Spark
operators — each example runs a real Spark job, so example counts are
small; the properties hold for ARBITRARY input, beyond the fixed unit
cases."""

import hashlib
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wikiprep_spark.operators.entitylink import link_entities
from wikiprep_spark.operators.rangejoin import interval_join
from wikiprep_spark.operators.sketches import HLL_M, hll_distinct

_spark = [None]


def _get_spark(spark):
    _spark[0] = spark
    return spark


def test_capture_spark_fixture(spark):
    """Not a property — captures the session fixture for the fuzzers."""
    assert _get_spark(spark) is not None


@settings(max_examples=12, deadline=None)
@given(
    pts=st.lists(st.integers(-50, 50), min_size=0, max_size=25),
    ivs=st.lists(st.tuples(st.integers(-50, 50), st.integers(-10, 15)),
                 min_size=0, max_size=15),
    width=st.integers(1, 40),
)
def test_interval_join_equals_brute_force(pts, ivs, width):
    spark = _spark[0]
    p = spark.createDataFrame(
        [(i, v) for i, v in enumerate(pts)] or [(0, None)],
        "pid long, p long").where(F.col("p").isNotNull())
    iv = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(ivs)] or [(0, None, None)],
        "iid long, s long, e long").where(F.col("s").isNotNull())
    got = sorted((r["pid"], r["iid"]) for r in
                 interval_join(p, iv, "p", "s", "e", width).collect())
    exp = sorted((i, j) for i, v in enumerate(pts)
                 for j, (s, d) in enumerate(ivs) if s <= v <= s + d)
    assert got == exp


def _py_hll_est(keys):
    regs = {}
    for k in keys:
        h = hashlib.md5(("hll:%s" % k).encode()).hexdigest()
        reg, tail = int(h[:3], 16), int(h[3:15], 16)
        rho = 49 if tail == 0 else 49 - tail.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    sum_int = (sum(1 << (49 - r) for r in regs.values())
               + (HLL_M - len(regs)) * (1 << 49))
    zeros = HLL_M - len(regs)
    raw = ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
           * 562949953421312.0) / sum_int
    est = (4096.0 * math.log(4096.0 / zeros)
           if raw <= 10240.0 and zeros > 0 else raw)
    return round(est, 4), len(regs)


@settings(max_examples=10, deadline=None)
@given(keys=st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=0, max_size=12),
    min_size=1, max_size=120))
def test_hll_matches_python_for_arbitrary_keys(keys):
    spark = _spark[0]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = hll_distinct(
        df.withColumn("g", F.lit(1)), "k", ["g"]).collect()
    exp_est, exp_regs = _py_hll_est(keys)
    assert got[0]["registers_used"] == exp_regs
    assert got[0]["hll_distinct"] == exp_est


_word = st.text(alphabet="abcxyz", min_size=1, max_size=3)


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(st.lists(_word, min_size=1, max_size=12),
                  min_size=1, max_size=6),
    surfaces=st.lists(st.lists(_word, min_size=1, max_size=3),
                      min_size=1, max_size=8),
)
def test_linker_longest_match_invariants(docs, surfaces):
    spark = _spark[0]
    ddf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    surf = sorted({" ".join(s) for s in surfaces})
    dic = spark.createDataFrame(
        [(s, i, 1.0) for i, s in enumerate(surf)],
        "surface string, entity_id long, prior double")
    got = {(r["doc_id"], r["pos"], r["n_tokens"]): r["surface"]
           for r in link_entities(ddf, dic, max_len=3).collect()}
    surf_set = set(surf)
    for i, toks in enumerate(docs):
        occ = {(s + 1, n) for n in (1, 2, 3)
               for s in range(len(toks) - n + 1)
               if " ".join(toks[s:s + n]) in surf_set}
        kept = {(p, n) for (d, p, n) in got if d == i}
        # soundness: every kept mention is a real dictionary occurrence
        # with the right surface text
        for p, n in kept:
            assert (p, n) in occ
            assert got[(i, p, n)] == " ".join(toks[p - 1:p - 1 + n])
        # longest-match: kept = occurrences not strictly contained in
        # another OCCURRENCE (exactly; nothing more, nothing less)
        exp = {(p, n) for (p, n) in occ
               if not any(p2 <= p and p2 + n2 >= p + n and n2 > n
                          for (p2, n2) in occ)}
        assert kept == exp
