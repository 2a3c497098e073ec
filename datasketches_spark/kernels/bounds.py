"""Distinct-count error bounds and set-ratio (Jaccard) bounds.

Re-derivation of the reference's bound math (same published formulas from
the Apache DataSketches papers, fresh NumPy code):

- ``binomial_lower/upper_bound``: /root/reference/ThetaCommon/BinomialBoundsN.cs:44-236
  (continuity-corrected classic Gaussian bounds for n > 120, exact binomial
  tail series for small n, closed forms for n in {0, 1}, and the
  EquivTables branch for n <= 120 with theta < n/360: the Gaussian bound
  evaluated at a table-adjusted z value that reproduces exact binomial
  tails — constants in equiv_tables.py).

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

from datasketches_spark.kernels.equiv_tables import LB_EQUIV, UB_EQUIV

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
        # tiny-theta corner: Gaussian bound at the table-adjusted z value
        # (BinomialBoundsN.cs:141-148)
        lb = _cont_classic_lb(n, theta, LB_EQUIV[3 * n + (num_sdev - 1)]) - 0.5
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
        # tiny-theta corner (BinomialBoundsN.cs:178-185)
        ub = _cont_classic_ub(n, theta, UB_EQUIV[3 * n + (num_sdev - 1)]) + 0.5
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
# |B|/|A| for B ⊆ A sampled at rate f: approximate Clopper-Pearson bounds
# on the binomial proportion via Abramowitz & Stegun formula 26.5.22, with
# exact closed forms for the k ∈ {0, 1, n-1, n} corners — a faithful
# vectorized port of BoundsOnBinomialProportions.cs:42-200 applied through
# BoundsOnRatiosInSampledSets.cs:51-123 (incl. the HackyAdjuster(f) z-value
# widening) as the theta-set wrapper
# BoundsOnRatiosInThetaSketchedSets.cs:45-103 prescribes.

# A&S 7.1.28 erf approximation constants (BoundsOnBinomialProportions.cs
# ErfOfNonneg) — used instead of math.erf so bound values match the
# reference bit-for-bit at its ~7-digit accuracy
_ERF_A = (0.0705230784, 0.0422820123, 0.0092705272,
          0.0001520143, 0.0002765672, 0.0000430638)


def _erf(x):
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    s = 1.0 + sum(a * ax ** (i + 1) for i, a in enumerate(_ERF_A))
    s2 = s * s
    s4 = s2 * s2
    s8 = s4 * s4
    val = 1.0 - 1.0 / (s8 * s8)
    return np.where(x < 0.0, -val, val)


def _norm_cdf(x):
    return 0.5 * (1.0 + _erf(np.asarray(x, dtype=np.float64) / math.sqrt(2.0)))


def _delta_of_num_stdevs(kappa):
    return _norm_cdf(-1.0 * np.asarray(kappa, dtype=np.float64))


def _as_26_5_22(a, b, yp):
    """Abramowitz & Stegun 26.5.22: approximate inverse of the incomplete
    beta function I_x(a, b) = delta, delta given via the gaussian tail
    z-value yp (BoundsOnBinomialProportions.cs AbramowitzStegunFormula26p5p22)."""
    b2m1 = 2.0 * b - 1.0
    a2m1 = 2.0 * a - 1.0
    lam = (yp * yp - 3.0) / 6.0
    h = 2.0 / (1.0 / a2m1 + 1.0 / b2m1)
    w = (yp * np.sqrt(h + lam)) / h - (1.0 / b2m1 - 1.0 / a2m1) * (
        lam + 5.0 / 6.0 - 2.0 / (3.0 * h))
    return a / (a + b * np.exp(2.0 * w))


def proportion_lower_bound(n, k, num_std_devs):
    """ApproximateLowerBoundOnP: exact branches for k ∈ {0, 1, n}, A&S
    26.5.22 otherwise (BoundsOnBinomialProportions.cs:43-54)."""
    n = np.asarray(n, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    delta = _delta_of_num_stdevs(num_std_devs)
    with np.errstate(divide="ignore", invalid="ignore"):
        exact_k1 = 1.0 - np.power(1.0 - delta, 1.0 / np.maximum(n, 1.0))
        exact_kn = np.power(delta, 1.0 / np.maximum(n, 1.0))
        general = 1.0 - _as_26_5_22((n - k) + 1.0, np.maximum(k, 1.0),
                                    -1.0 * np.asarray(num_std_devs, dtype=np.float64))
    return np.where(
        n == 0, 0.0,
        np.where(k == 0, 0.0,
                 np.where(k == 1, exact_k1,
                          np.where(k == n, exact_kn, general))))


def proportion_upper_bound(n, k, num_std_devs):
    """ApproximateUpperBoundOnP: exact branches for k ∈ {0, n-1, n}, A&S
    26.5.22 otherwise (BoundsOnBinomialProportions.cs:64-81)."""
    n = np.asarray(n, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    delta = _delta_of_num_stdevs(num_std_devs)
    with np.errstate(divide="ignore", invalid="ignore"):
        exact_knm1 = np.power(1.0 - delta, 1.0 / np.maximum(n, 1.0))
        exact_k0 = 1.0 - np.power(delta, 1.0 / np.maximum(n, 1.0))
        general = 1.0 - _as_26_5_22(np.maximum(n - k, 1.0), k + 1.0,
                                    np.asarray(num_std_devs, dtype=np.float64))
    return np.where(
        n == 0, 1.0,
        np.where(k == n, 1.0,
                 np.where(k == n - 1, exact_knm1,
                          np.where(k == 0, exact_k0, general))))


def _hacky_adjuster(f):
    """Widens the 2-sigma z value for high inclusion probabilities
    (BoundsOnRatiosInSampledSets.cs HackyAdjuster)."""
    f = np.asarray(f, dtype=np.float64)
    tmp = np.sqrt(1.0 - f)
    return np.where(f <= 0.5, tmp, tmp + 0.01 * (f - 0.5))


def ratio_bounds(count_a, count_b_in_a, f=1.0, num_std_devs: float = 2.0):
    """(estimate, lb, ub) of |B|/|A| given countA retained samples of A,
    countB of them in B, and inclusion probability f = theta/2^63
    (BoundsOnRatiosInThetaSketchedSets.cs:45-103 →
    BoundsOnRatiosInSampledSets.cs:51-123). f == 1.0 (exact mode) collapses
    both bounds to the estimate, as the reference does."""
    a = np.asarray(count_a, dtype=np.float64)
    b = np.asarray(count_b_in_a, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        est = np.where(a > 0, b / np.maximum(a, 1.0), 0.5)
        z = num_std_devs * _hacky_adjuster(f)
        lb = np.where(a == 0, 0.0,
                      np.where(f == 1.0, est, proportion_lower_bound(a, b, z)))
        ub = np.where(a == 0, 1.0,
                      np.where(f == 1.0, est, proportion_upper_bound(a, b, z)))
    return est, lb, ub
