"""Index-exact split tests (vendored iterstrat / skmultilearn algorithms).

The upstream packages are not installable here, so exactness is protected
two ways: (1) pinned golden index sets for a fixed label matrix — any edit
that changes RNG consumption or tie-break order fails loudly; (2) the
structural invariants the upstream implementations guarantee (ceil-based
fold sizing, partition property, per-label stratification, determinism).
"""

import numpy as np
import pytest

from fairmultimodal_tpu.data.iterstrat_exact import (
    iterative_train_test_split,
    multilabel_stratified_shuffle_split,
)
from fairmultimodal_tpu.data.split import multilabel_stratified_split


def _labels(n=60, seed=7, p=(0.12, 0.4, 0.85)):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3) < np.array(p)).astype(int)


# Golden index sets pinned from the vendored implementations (see module
# docstring of data/iterstrat_exact.py for the derivation provenance).
MSSS_TEST_GOLDEN = [7, 10, 18, 20, 21, 35, 37, 38, 42, 44, 47, 51]
MSSS_VAL_ABS_GOLDEN = [16, 23, 33]
SKML_TEST_GOLDEN = [0, 1, 2, 5, 7, 9, 11, 13, 14, 17, 20, 55]


def test_msss_pinned_seed42_indices():
    Y = _labels()
    train, test = multilabel_stratified_shuffle_split(Y, 0.2, 42)
    assert test.tolist() == MSSS_TEST_GOLDEN
    # Two-stage reference protocol (10_FAME.py:733-742): second MSSS at 0.05
    # over train+val, seed 42 again; absolute val indices pinned too.
    _, rel_val = multilabel_stratified_shuffle_split(Y[train], 0.05, 42)
    assert train[rel_val].tolist() == MSSS_VAL_ABS_GOLDEN


def test_skmultilearn_pinned_indices():
    Y = _labels()
    _, test = iterative_train_test_split(Y, 0.2, 42)
    assert test.tolist() == SKML_TEST_GOLDEN


def test_msss_fold_sizing_is_sklearn_ceil():
    """n_test = ceil(test_size * n) (sklearn _validate_shuffle_split with
    train_size=None), NOT round()."""
    Y = _labels(n=53)
    train, test = multilabel_stratified_shuffle_split(Y, 0.2, 42)
    assert len(test) == 11          # ceil(10.6)
    assert len(train) == 42
    train, test = multilabel_stratified_shuffle_split(Y, 0.05, 42)
    assert len(test) == 3           # ceil(2.65)


def test_msss_partition_and_determinism():
    Y = _labels(n=200)
    t1 = multilabel_stratified_shuffle_split(Y, 0.2, 42)
    t2 = multilabel_stratified_shuffle_split(Y, 0.2, 42)
    np.testing.assert_array_equal(t1[0], t2[0])
    np.testing.assert_array_equal(t1[1], t2[1])
    train, test = t1
    assert len(np.intersect1d(train, test)) == 0
    assert len(train) + len(test) == 200
    assert (np.diff(train) > 0).all() and (np.diff(test) > 0).all()
    other = multilabel_stratified_shuffle_split(Y, 0.2, 7)
    assert other[1].tolist() != test.tolist()


def test_msss_stratification_quality():
    Y = _labels(n=1000, seed=3, p=(0.08, 0.35, 0.85))
    train, test = multilabel_stratified_shuffle_split(Y, 0.2, 42)
    p_all = Y.mean(axis=0)
    p_test = Y[test].mean(axis=0)
    # Iterative stratification holds per-label proportions within a couple
    # of samples of exact.
    np.testing.assert_allclose(p_test, p_all, atol=0.02)


def test_skmultilearn_partition_and_determinism():
    Y = _labels(n=200)
    t1 = iterative_train_test_split(Y, 0.2, 42)
    t2 = iterative_train_test_split(Y, 0.2, 42)
    np.testing.assert_array_equal(t1[1], t2[1])
    train, test = t1
    assert len(np.intersect1d(train, test)) == 0
    assert len(train) + len(test) == 200
    # Fold sizes track the sample distribution (desired counts are
    # fractional, so allow a couple of samples of slack).
    assert abs(len(test) - 40) <= 3


def test_split_default_is_iterstrat_exact():
    """data.split.multilabel_stratified_split defaults to the index-exact
    vendored algorithm (the pipelines' split path)."""
    Y = _labels()
    _, test = multilabel_stratified_split(Y, 0.2, seed=42)
    assert test.tolist() == MSSS_TEST_GOLDEN
    # The round-1 independent implementation remains available.
    rest, test_s = multilabel_stratified_split(Y, 0.2, seed=42,
                                               method="sechidis")
    assert len(test_s) + len(rest) == len(Y)


def test_msss_no_positive_labels_at_all():
    """All-zero label matrices route through the leftover branch."""
    Y = np.zeros((20, 3), int)
    train, test = multilabel_stratified_shuffle_split(Y, 0.25, 42)
    assert len(test) == 5 and len(train) == 15


def test_msss_invalid_test_size():
    Y = _labels(n=10)
    with pytest.raises(ValueError):
        multilabel_stratified_shuffle_split(Y, 0.0, 42)
