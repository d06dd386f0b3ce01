"""Golden tests ported from the reference's unit suite.

Encodes the exact fixtures of
/root/reference/insar/tests/test_timeseries.py:64-147 — the A matrix, the B
matrix, time-diffs, and the closed-form inversion round-trip (deltas
[2,14,12,14,2] → velocities [1,2,0.5] → phases [0,2,14,16]) — as fresh
numpy oracles for insar_spark.functions.sbas_kernels.
"""

from __future__ import annotations

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal, assert_array_equal

from insar_spark.functions.sbas_kernels import (
    build_A,
    build_B,
    integrate_velocities,
    invert_sbas,
    solve_series,
    temporal_coherence,
)

# dates 2018-04-20, 04-22, 04-28, 05-02 as day numbers (any epoch works;
# only diffs matter — use days since 2018-04-20)
DATES = np.array([0.0, 2.0, 8.0, 12.0])
PAIRS = [(0, 2), (0, 8), (2, 8), (2, 12), (8, 12)]
EARLY = np.array([p[0] for p in PAIRS], dtype=float)
LATE = np.array([p[1] for p in PAIRS], dtype=float)
DELTAS = np.array([2.0, 14.0, 12.0, 14.0, 2.0])


def test_time_diffs():
    assert_array_equal(np.diff(DATES), [2, 6, 4])


def test_build_A_golden():
    expected_A = np.array(
        [
            [1, 0, 0],
            [0, 1, 0],
            [-1, 1, 0],
            [-1, 0, 1],
            [0, -1, 1],
        ],
        dtype=float,
    )
    assert_array_equal(build_A(DATES, EARLY, LATE), expected_A)


def test_build_B_golden():
    expected_B = np.array(
        [
            [2, 0, 0],
            [2, 6, 0],
            [0, 6, 0],
            [0, 6, 4],
            [0, 0, 4],
        ],
        dtype=float,
    )
    assert_array_equal(build_B(DATES, EARLY, LATE), expected_B)


def test_invert_sbas_roundtrip():
    B = build_B(DATES, EARLY, LATE)
    vel, resid = invert_sbas(DELTAS, B)
    assert_array_almost_equal(vel, [1.0, 2.0, 0.5])
    phases = integrate_velocities(vel, np.diff(DATES))
    assert_array_almost_equal(phases, [0.0, 2.0, 14.0, 16.0])


def test_invert_sbas_multicolumn_linearity():
    # column-doubling linearity check (test_timeseries.py:135-147)
    B = build_B(DATES, EARLY, LATE)
    d2 = np.column_stack([DELTAS, 2 * DELTAS])
    vel, _ = invert_sbas(d2, B)
    assert_array_almost_equal(vel[:, 1], 2 * vel[:, 0])
    phases = integrate_velocities(vel, np.diff(DATES))
    assert_array_almost_equal(phases[:, 0], [0.0, 2.0, 14.0, 16.0])
    assert_array_almost_equal(phases[:, 1], [0.0, 4.0, 28.0, 32.0])


def test_integrate_velocities_length_error():
    # mirrors test_invert_sbas_errors (test_timeseries.py:104-114)
    with pytest.raises(ValueError):
        integrate_velocities(np.arange(3.0), np.arange(4.0))
    integrate_velocities(np.arange(3.0), np.arange(3.0))  # ok


def test_a_matrix_path_equals_b_path_for_consistent_network():
    # A-matrix solve gives phases directly; must agree with B-path
    phases_a, _ = solve_series(DATES, EARLY, LATE, DELTAS, use_b_matrix=False)
    phases_b, _ = solve_series(DATES, EARLY, LATE, DELTAS, use_b_matrix=True)
    assert_array_almost_equal(phases_a, phases_b)
    assert_array_almost_equal(phases_a, [0.0, 2.0, 14.0, 16.0])


def test_temporal_coherence_perfect_fit():
    # consistent network → zero residuals → coherence exactly 1
    _, coh = solve_series(DATES, EARLY, LATE, DELTAS)
    assert coh == pytest.approx(1.0)
    # pure-noise residuals → low coherence
    rng = np.random.default_rng(0)
    assert temporal_coherence(rng.uniform(-np.pi, np.pi, 10_000)) < 0.05


def test_all_zero_short_circuit():
    phases, coh = solve_series(DATES, EARLY, LATE, np.zeros(5))
    assert_array_equal(phases, np.zeros(4))
    assert coh == 0.0


def test_weighted_solve_consistent_network_unchanged():
    # weights must not change the solution of a consistent network
    B = build_B(DATES, EARLY, LATE)
    w = np.array([1.0, 0.5, 2.0, 0.1, 1.5])
    vel, _ = invert_sbas(DELTAS, B, weights=w)
    assert_array_almost_equal(vel, [1.0, 2.0, 0.5])
