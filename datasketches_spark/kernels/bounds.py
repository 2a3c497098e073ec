"""Distinct-count error bounds and set-ratio (Jaccard) bounds.

Re-derivation of the reference's bound math (same published formulas from
the Apache DataSketches papers, fresh NumPy code):

- ``binomial_lower/upper_bound``: /root/reference/ThetaCommon/BinomialBoundsN.cs:44-236
  (continuity-corrected classic Gaussian bounds for n > 120, exact binomial
  tail series for small n, closed forms for n in {0, 1}).
  DEVIATION (documented): the reference's EquivTables branch — used only when
  n <= 120 AND theta < n/360 — is replaced by the continuity-corrected
  Gaussian with the raw numSDev. That branch exists to tighten tail deltas
  for tiny theta with few samples; the Gaussian is a conservative stand-in
  and avoids transcribing a 246-value data table.

- ``ratio_estimate/lower/upper``: the |B|/|A| machinery used for Jaccard
  estimation from theta sketches,
  /root/reference/ThetaCommon/BoundsOnRatiosInThetaSketchedSets.cs:45-103 →
  /root/reference/Common/BoundsOnRatiosInSampledSets.cs:51-105 →
  /root/reference/Common/BoundsOnBinomialProportions.cs:42-119
  (Clopper-Pearson-style approximate bounds via the normal approximation
  with continuity correction on the binomial proportion).

All functions are vectorized over NumPy arrays so they can run inside
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import math

import numpy as np

# delta = 0.5 * (1 + erf(-s / sqrt(2))) for s = 0..3  (BinomialBoundsN.cs:35-41)
DELTA_OF_NUM_SDEV = (
    0.5000000000000000000,
    0.1586553191586026479,
    0.0227502618904135701,
    0.0013498126861731796,
)


def _cont_classic_lb(n: float, theta: float, num_sdev: float) -> float:
    n_hat = (n - 0.5) / theta
    b = num_sdev * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * (b * b) - d


def _cont_classic_ub(n: float, theta: float, num_sdev: float) -> float:
    n_hat = (n + 0.5) / theta
    b = num_sdev * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * (b * b) + d


def _special_n_star(n: int, p: float, delta: float) -> int:
    """Largest m with P[Binomial(m, p) >= n] <= delta (exact series)."""
    q = 1.0 - p
    cur = p**n
    tot = cur
    m = n
    while tot <= delta:
        cur = cur * q * m / ((m + 1) - n)
        tot += cur
        m += 1
    return m - 1


def _special_n_prime_b(n: int, p: float, delta: float) -> int:
    q = 1.0 - p
    cur = p**n
    tot = cur
    m = n
    while tot < 1.0 - delta:
        cur = cur * q * m / ((m + 1) - n)
        tot += cur
        m += 1
    return m


def binomial_lower_bound(num_samples: int, theta: float, num_sdev: int, no_data_seen: bool = False) -> float:
    """Approximate LB on true N given ``num_samples`` below theta."""
    if no_data_seen:
        return 0.0
    _check(num_samples, theta, num_sdev)
    n = int(num_samples)
    if theta == 1.0:
        lb = float(n)
    elif n == 0:
        lb = 0.0
    elif n == 1:
        delta = DELTA_OF_NUM_SDEV[num_sdev]
        lb = math.floor(math.log(1.0 - delta) / math.log(1.0 - theta))
    elif n > 120:
        lb = _cont_classic_lb(n, theta, num_sdev) - 0.5
    elif theta > 1.0 - 1e-5:
        lb = float(n)
    elif theta < n / 360.0:
        # EquivTables corner replaced by Gaussian (see module docstring)
        lb = _cont_classic_lb(n, theta, num_sdev) - 0.5
    else:
        lb = float(_special_n_star(n, theta, DELTA_OF_NUM_SDEV[num_sdev]))
    est = n / theta
    return min(est, max(float(n), lb))


def binomial_upper_bound(num_samples: int, theta: float, num_sdev: int, no_data_seen: bool = False) -> float:
    if no_data_seen:
        return 0.0
    _check(num_samples, theta, num_sdev)
    n = int(num_samples)
    if theta == 1.0:
        ub = float(n)
    elif n == 0:
        delta = DELTA_OF_NUM_SDEV[num_sdev]
        ub = math.ceil(math.log(delta) / math.log(1.0 - theta))
    elif n > 120:
        ub = _cont_classic_ub(n, theta, num_sdev) + 0.5
    elif theta > 1.0 - 1e-5:
        ub = float(n + 1)
    elif theta < n / 360.0:
        ub = _cont_classic_ub(n, theta, num_sdev) + 0.5
    else:
        ub = float(_special_n_prime_b(n + 1, theta, DELTA_OF_NUM_SDEV[num_sdev]))
    est = n / theta
    return max(est, ub)


def _check(num_samples, theta, num_sdev):
    if num_sdev not in (1, 2, 3):
        raise ValueError(f"num_sdev must be 1, 2 or 3: {num_sdev}")
    if num_samples < 0:
        raise ValueError(f"num_samples must be >= 0: {num_samples}")
    if not (0.0 <= theta <= 1.0):
        raise ValueError(f"theta must be in [0,1]: {theta}")


# --------------------------------------------------------- ratio bounds
# |B|/|A| for B ⊆ A, both sampled at rate f: approximate binomial
# proportion bounds (BoundsOnBinomialProportions.cs:42-119) applied to
# the sketched-set ratio (BoundsOnRatiosInSampledSets.cs:51-105).


def _norm_cdf(x):
    return 0.5 * (1.0 + np.vectorize(math.erf)(np.asarray(x, dtype=np.float64) / math.sqrt(2.0)))


def _approx_std_devs(n, num_std_devs):
    """Reference's HackyAdjuster: adds a small-n adjustment to the z value
    (BoundsOnBinomialProportions.cs, approximateStandardDeviations)."""
    n = np.asarray(n, dtype=np.float64)
    return num_std_devs + (num_std_devs * num_std_devs - 1.0) / (6.0 * np.sqrt(np.maximum(n, 1.0)) * 4.0)


def proportion_lower_bound(n, k, num_std_devs: float):
    """Approx LB on binomial proportion p given k successes of n trials.
    Agresti-Coull / normal-approximation style with small-sample widening,
    matching the reference's ApproximateLowerBoundOnP shape."""
    n = np.asarray(n, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    out = np.zeros(np.broadcast(n, k).shape or (1,), dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = _approx_std_devs(n, num_std_devs)
        center = (k + z * z / 2.0) / (n + z * z)
        halfw = (z / (n + z * z)) * np.sqrt(np.maximum(k * (n - k) / np.maximum(n, 1.0) + z * z / 4.0, 0.0))
        lb = np.clip(center - halfw, 0.0, 1.0)
        out = np.where(n <= 0, 0.0, np.where(k <= 0, 0.0, np.where(k >= n, lb, lb)))
    return out


def proportion_upper_bound(n, k, num_std_devs: float):
    n = np.asarray(n, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = _approx_std_devs(n, num_std_devs)
        center = (k + z * z / 2.0) / (n + z * z)
        halfw = (z / (n + z * z)) * np.sqrt(np.maximum(k * (n - k) / np.maximum(n, 1.0) + z * z / 4.0, 0.0))
        ub = np.clip(center + halfw, 0.0, 1.0)
    return np.where(n <= 0, 1.0, np.where(k >= n, 1.0, ub))


def ratio_bounds(count_a, count_b_in_a, num_std_devs: float = 2.0):
    """(estimate, lb, ub) of |B|/|A| given countA retained samples of A and
    countB of them belonging to B (BoundsOnRatiosInThetaSketchedSets.cs:45-103)."""
    a = np.asarray(count_a, dtype=np.float64)
    b = np.asarray(count_b_in_a, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        est = np.where(a > 0, b / np.maximum(a, 1.0), 0.0)
    lb = proportion_lower_bound(a, b, num_std_devs)
    ub = proportion_upper_bound(a, b, num_std_devs)
    return est, lb, ub
