"""Property-based tests (hypothesis) for the scalar kernels: the vector
expressions vs NumPy on arbitrary inputs, the compat rounding function
vs its Java definition, and argmin tie-break invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmeanwithmapreduce_spark.kmeans.core import _movement, _round5_float32

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite, min_size=1, max_size=16), st.data())
@settings(max_examples=200, deadline=None)
def test_movement_matches_numpy(a, data):
    b = data.draw(
        st.lists(finite, min_size=len(a), max_size=len(a))
    )
    got = _movement(a, b)
    want = float(np.sqrt(((np.asarray(a) - np.asarray(b)) ** 2).sum()))
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12)


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=500, deadline=None)
def test_round5_is_java_math_round(x):
    """Java: Math.round(x*100000)/100000.0f with Math.round = floor(x+0.5)."""
    got = _round5_float32(x)
    want = float(np.float32(math.floor(x * 100000.0 + 0.5) / 100000.0))
    assert got == want
    # idempotent on its own output (within float32 re-representation)
    assert _round5_float32(got) == pytest.approx(got, abs=1e-9)


@given(st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_minhash_permutation_bounds(h):
    """Affine permutation stays in [0, P) with no 64-bit overflow."""
    from kmeanwithmapreduce_spark.operators.dedup import (
        _MINHASH_COEFFS,
        _MINHASH_P,
    )

    for a, b in _MINHASH_COEFFS:
        v = a * h + b
        assert v < 2**63  # no BIGINT overflow in either engine
        assert 0 <= v % _MINHASH_P < _MINHASH_P


def _np_argmin_first(x, cents):
    d2 = ((np.asarray(x)[None, :] - np.asarray(cents)) ** 2).sum(1)
    return int(np.argmin(d2))


@given(
    st.lists(finite, min_size=2, max_size=6),
    st.integers(min_value=2, max_value=5),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_numpy_argmin_first_match_invariant(x, k, data):
    """np.argmin (used by the pandas assign path) picks the FIRST minimum
    on ties — the property the engine's tie-break relies on."""
    cents = [
        data.draw(st.lists(finite, min_size=len(x), max_size=len(x)))
        for _ in range(k)
    ]
    cents[k - 1] = list(cents[0])  # force a tie between first and last
    i = _np_argmin_first(x, cents)
    d2 = ((np.asarray(x)[None, :] - np.asarray(cents)) ** 2).sum(1)
    assert d2[i] == d2.min()
    assert i == int(np.flatnonzero(d2 == d2.min())[0])
