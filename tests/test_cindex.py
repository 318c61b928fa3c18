"""C-index tests against a brute-force per-pair oracle implementing the
scikit-survival semantics used by the reference (reference eval/cindex.py)."""
import numpy as np
import pytest

from advmil_tpu.eval.cindex import (concordance_index, concordance_index_censored,
                                    NoComparablePairException)


def _brute_force(event, time, est, tied_tol=1e-8):
    """Per-event enumeration following the published algorithm: for each event
    sample i, comparable = samples with strictly later time + censored at the
    same time; concordant when est_j < est_i; ties within tol count 0.5."""
    n = len(time)
    num, den = 0.0, 0.0
    con = dis = tr = tt = 0
    for i in range(n):
        if not event[i]:
            continue
        for j in range(n):
            if j == i:
                continue
            comparable = time[j] > time[i] or (time[j] == time[i] and not event[j])
            if not comparable:
                continue
            den += 1
            if abs(est[j] - est[i]) <= tied_tol:
                num += 0.5
                tr += 1
            elif est[j] < est[i]:
                num += 1
                con += 1
            else:
                dis += 1
            if time[j] == time[i]:
                tt += 1
    return num / den, con, dis, tr, tt


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("n,tie_frac", [(30, 0.0), (50, 0.3), (120, 0.5)])
def test_cindex_vs_bruteforce(n, tie_frac):
    time = RNG.uniform(1, 100, size=n)
    if tie_frac > 0:  # force time ties
        idx = RNG.choice(n, int(n * tie_frac), replace=False)
        time[idx] = np.round(time[idx] / 10) * 10
    event = RNG.uniform(size=n) < 0.6
    event[0] = True
    est = RNG.normal(size=n)
    # force some tied risks
    est[: n // 4] = np.round(est[: n // 4], 1)
    got = concordance_index_censored(event, time, est)
    want = _brute_force(event, time, est)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-12)
    assert got[1:] == want[1:]


def test_cindex_dispatch_cox():
    """One-column prediction: risk = -pred (higher pred = longer survival)."""
    y_true = np.array([[1.0, 1], [2.0, 1], [3.0, 1]])
    y_pred = np.array([[0.1], [0.2], [0.3]])  # perfectly concordant
    assert concordance_index(y_true, y_pred) == 1.0
    assert concordance_index(y_true, -y_pred) == 0.0


def test_cindex_dispatch_discrete():
    """Multi-column prediction: hazards -> survival -> risk = -sum(S)."""
    y_true = np.array([[0.0, 1], [1.0, 1], [2.0, 1]])
    hz = np.array([[0.9, 0.9], [0.5, 0.5], [0.1, 0.1]])  # earlier event = higher hazard
    assert concordance_index(y_true, hz) == 1.0


def test_cindex_errors():
    with pytest.raises(ValueError):
        concordance_index_censored(np.array([False, False]),
                                   np.array([1.0, 2.0]), np.array([0.1, 0.2]))
    with pytest.raises(ValueError):
        concordance_index_censored(np.array([True]), np.array([1.0]), np.array([0.1]))
    with pytest.raises(NoComparablePairException):
        # single event at the latest time, other censored earlier -> no pairs
        concordance_index_censored(np.array([False, True]),
                                   np.array([1.0, 2.0]), np.array([0.1, 0.2]))
    with pytest.raises(ValueError):
        concordance_index_censored(np.array([1, 0]),  # not boolean
                                   np.array([1.0, 2.0]), np.array([0.1, 0.2]))


def test_events_at_same_time_not_comparable():
    event = np.array([True, True])
    time = np.array([5.0, 5.0])
    with pytest.raises(NoComparablePairException):
        concordance_index_censored(event, time, np.array([1.0, 0.0]))
