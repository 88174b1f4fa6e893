"""Property-based tests (hypothesis) for round-3 primitives.

Pure-Python mirrors of the exact formulas the Spark/DuckDB pair
evaluates — same discipline as test_exact_properties.py: each claim
the operators rely on is a property over generated inputs, not one
example.

1. `sample_weighted_mix` monotonicity: raising a source's rate only
   ADDS documents (threshold semantics) — the property that makes
   mixing-rate ablations comparable.
2. `_swap_dirs` crash safety: under an injected failure at ANY rename
   step, every destination directory is left exactly as before; on
   success, every destination holds the staged content and no
   backups remain.
3. PQ encode/ADC consistency: the argmin code chosen by the
   simplified score (cc - 2·dot) equals the argmin of the true
   subspace L2² distance, for any integer vector/codebook.
"""

from __future__ import annotations

import hashlib
import os
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_stocks_with_sentiment_analysis_spark.llmdata.similarity import (
    _PQ_DSUB,
    _PQ_K,
)
from etl_stocks_with_sentiment_analysis_spark.operators.sinks import _swap_dirs


def _bucket(doc_id: int) -> int:
    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(hx[0], 16) * 16 + int(hx[1], 16)


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), max_size=60),
    rate_lo=st.integers(min_value=0, max_value=256),
    rate_hi=st.integers(min_value=0, max_value=256),
)
def test_weighted_mix_thresholds_are_monotone(ids, rate_lo, rate_hi):
    if rate_lo > rate_hi:
        rate_lo, rate_hi = rate_hi, rate_lo
    kept_lo = {i for i in ids if _bucket(i) < rate_lo}
    kept_hi = {i for i in ids if _bucket(i) < rate_hi}
    assert kept_lo <= kept_hi  # raising the rate never drops a doc


@settings(max_examples=30)
@given(
    n_dirs=st.integers(min_value=1, max_value=4),
    fail_at=st.integers(min_value=0, max_value=8),
    dst_exists=st.lists(st.booleans(), min_size=4, max_size=4),
)
def test_swap_dirs_all_or_nothing(tmp_path_factory, n_dirs, fail_at, dst_exists):
    base = tmp_path_factory.mktemp("swap")
    moves = []
    for i in range(n_dirs):
        src = base / f"staged{i}"
        src.mkdir()
        (src / "f").write_text(f"new{i}")
        dst = base / f"dst{i}"
        if dst_exists[i]:
            dst.mkdir()
            (dst / "f").write_text(f"old{i}")
        moves.append((str(src), str(dst)))

    real_rename = os.rename
    calls = {"n": 0}

    def flaky(a, b):
        calls["n"] += 1
        if calls["n"] == fail_at:
            raise OSError("injected")
        return real_rename(a, b)

    os.rename = flaky
    try:
        _swap_dirs(moves)
        failed = False
    except OSError:
        failed = True
    finally:
        os.rename = real_rename

    for i, (_, dst) in enumerate(moves):
        backup = dst + "__old"
        assert not os.path.exists(backup)  # backups never survive
        if failed:
            if dst_exists[i]:  # untouched or fully restored
                assert open(os.path.join(dst, "f")).read() == f"old{i}"
            else:
                assert not os.path.exists(dst)
        else:
            assert open(os.path.join(dst, "f")).read() == f"new{i}"


@given(
    v=st.lists(
        st.integers(min_value=-20000, max_value=20000),
        min_size=_PQ_DSUB,
        max_size=_PQ_DSUB,
    ),
    book=st.lists(
        st.lists(
            st.integers(min_value=-20000, max_value=20000),
            min_size=_PQ_DSUB,
            max_size=_PQ_DSUB,
        ),
        min_size=_PQ_K,
        max_size=_PQ_K,
    ),
)
def test_pq_simplified_score_matches_true_l2_argmin(v, book):
    """The operator assigns codes by cc - 2·dot (the ||v||² term
    dropped); must pick the same centroid as the true L2² distance for
    ANY integer subvector and codebook."""
    scores = [
        sum(c * c for c in book[k]) - 2 * sum(x * c for x, c in zip(v, book[k]))
        for k in range(_PQ_K)
    ]
    dists = [sum((x - c) ** 2 for x, c in zip(v, book[k])) for k in range(_PQ_K)]
    assert scores.index(min(scores)) == dists.index(min(dists))


@given(
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=64)
)
@settings(max_examples=200, deadline=None)
def test_int8_quantization_invariants(v):
    """Pure-Python mirror of embedding_quantize_int8's formula: codes
    stay inside int8, reconstruction error is bounded by one quant
    step (scale/127), and the sign-separated integer division equals
    truncation toward zero for every sign — the property that makes
    the Spark `div` and DuckDB `//` expressions agree."""
    scale = max(1, max(abs(x) for x in v))
    codes = [
        (1 if x > 0 else -1 if x < 0 else 0) * ((abs(x) * 127) // scale) for x in v
    ]
    assert all(-127 <= c <= 127 for c in codes)
    for x, c in zip(v, codes):
        # exact truncation-toward-zero identity, in rational arithmetic
        # so float rounding can't mask a flooring-vs-truncation bug
        assert c == int(Fraction(x * 127, scale)), (x, c, scale)
        # one-step reconstruction bound
        assert abs(x - c * scale / 127) <= scale / 127 + 1e-9
