"""Synthetic-truth harness (reference: insar/sbas/synthetic.py IgramMaker).

Build known truth series, form an all-pairs network, corrupt it with noise
and missing pairs, invert through the distributed solver, and compare the
estimate against the truth — the reference's end-to-end validation pattern.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from insar_spark.operators.sbas import invert_pairs

BASE = dt.datetime(2025, 2, 1)


def _make_network(rng, n_dates=15, noise=0.0, drop_frac=0.0):
    days = np.sort(rng.choice(np.arange(0, 120), size=n_dates, replace=False))
    truth = np.cumsum(rng.normal(0, 3.0, n_dates))
    rows = []
    for i in range(n_dates):
        for j in range(i + 1, n_dates):
            if rng.random() < drop_frac:
                continue  # masked/missing pair
            delta = truth[j] - truth[i] + rng.normal(0, noise)
            rows.append(
                (
                    BASE + dt.timedelta(days=int(days[i])),
                    BASE + dt.timedelta(days=int(days[j])),
                    delta,
                )
            )
    return days, truth, rows


def test_noisy_allpairs_inversion_recovers_truth(spark):
    rng = np.random.default_rng(17)
    frames = []
    truths = {}
    for c in range(6):
        days, truth, rows = _make_network(rng, noise=0.4, drop_frac=0.3)
        truths[f"s{c}"] = truth
        frames.append(
            pd.DataFrame(rows, columns=["early_ts", "late_ts", "delta_v"]).assign(
                conv_id=f"s{c}"
            )
        )
    pairs = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    out = invert_pairs(pairs, prefilter=False).toPandas()

    for cid, truth in truths.items():
        g = out[out.conv_id == cid].sort_values("date_num")
        est = g["phase"].to_numpy()
        ref = truth - truth[0]
        # redundant network averages the noise down: rmse well under the
        # per-pair noise sigma
        rmse = np.sqrt(np.mean((est - ref) ** 2))
        assert rmse < 0.4, (cid, rmse)
        # quality metric reflects the injected noise (not a perfect fit)
        coh = g["temporal_coherence"].iloc[0]
        assert 0.5 < coh < 1.0


def test_noise_free_network_is_exact_with_high_coherence(spark):
    rng = np.random.default_rng(23)
    days, truth, rows = _make_network(rng, noise=0.0, drop_frac=0.2)
    pairs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["early_ts", "late_ts", "delta_v"]).assign(
            conv_id="clean"
        )
    )
    out = invert_pairs(pairs, prefilter=False).toPandas().sort_values("date_num")
    np.testing.assert_allclose(
        out["phase"].to_numpy(), truth - truth[0], atol=1e-8
    )
    assert out["temporal_coherence"].iloc[0] == pytest.approx(1.0, abs=1e-9)
