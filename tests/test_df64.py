"""DD (double-single) arithmetic vs true f64 (CPU has real f64)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidar_slam_tpu.ops import df64
from lidar_slam_tpu.ops.df64 import DD


def from64(x):
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DD(jnp.asarray(hi), jnp.asarray(lo))


def val(x: DD):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_selftest_healthy():
    assert df64.selftest() < 1e-12


def test_add_mul_relative_error(rng):
    a = rng.uniform(-1, 1, 10000) * 10.0 ** rng.integers(-8, 9, 10000)
    b = rng.uniform(-1, 1, 10000) * 10.0 ** rng.integers(-8, 9, 10000)
    s = val(df64.add(from64(a), from64(b)))
    p = val(df64.mul(from64(a), from64(b)))
    # DD error is bounded relative to the OPERANDS (2^-49-ish); under
    # cancellation the result can be much smaller than the operands
    opm = np.maximum(np.abs(a), np.abs(b))
    assert np.max(np.abs(s - (a + b)) / np.maximum(opm, 1e-30)) < 1e-12
    assert np.max(np.abs(p - a * b) / np.maximum(np.abs(a * b), 1e-30)) < 1e-13


def test_div_sqrt(rng):
    a = rng.uniform(0.5, 2.0, 1000) * 10.0 ** rng.integers(-6, 7, 1000)
    b = rng.uniform(0.5, 2.0, 1000) * 10.0 ** rng.integers(-6, 7, 1000)
    q = val(df64.div(from64(a), from64(b)))
    r = val(df64.sqrt(from64(a)))
    assert np.max(np.abs(q - a / b) / np.abs(a / b)) < 1e-12
    assert np.max(np.abs(r - np.sqrt(a)) / np.sqrt(a)) < 1e-12


def test_cancellation_sum(rng):
    """Sums whose f32 result is garbage must match f64 to ~1e-13."""
    a = rng.uniform(1, 2, 8192) * 1e6
    a = np.concatenate([a, -a * (1 - 1e-10)])
    rng.shuffle(a)
    want = np.sum(a)
    mass = np.sum(np.abs(a))
    got = val(df64.dsum(from64(a), axis=0))
    f32 = np.sum(a.astype(np.float32))
    assert abs(got - want) / mass < 1e-12  # ~2^-49 of the operand mass
    assert abs(got - want) < abs(f32 - want) / 100  # and f32 is far worse


def test_cumsum_matches_f64(rng):
    a = rng.normal(0, 1e5, (4096, 6))
    got = val(df64.cumsum(from64(a), axis=0))
    want = np.cumsum(a, axis=0)
    mass = np.cumsum(np.abs(a), axis=0)  # error bound scales with mass
    assert (np.abs(got - want) / mass).max() < 1e-12


def test_matvec_ill_conditioned(rng):
    """DD matvec on a K-like matrix (entries ~1e10, answer ~1) matches f64."""
    n = 256
    u = rng.normal(0, 1e5, (n, 4))
    K = u @ u.T + np.eye(n)
    p = rng.normal(0, 1, n)
    want = K @ p
    got = val(df64.matvec(from64(K), from64(p)))
    assert np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-3)) < 1e-9


def test_cholesky_solve_ill_conditioned(rng):
    """DD Cholesky solve on kappa~1e10 SPD is BACKWARD stable at DD
    precision: residual ~ eps_dd * ||K|| ||x||, and forward error within
    the kappa * eps_dd bound (f32 Cholesky of the same matrix is
    garbage/NaN — its K is numerically indefinite)."""
    n = 96
    u = rng.normal(0, 1e4, (n, 6))
    K = u @ u.T + np.eye(n)
    b = rng.normal(0, 1, n)
    want = np.linalg.solve(K, b)
    L = df64.cholesky(from64(K))
    x = val(df64.solve_cholesky(L, from64(b)))
    eps_dd = 2.0 ** -49
    # backward error: x solves a (K + dK) x = b with ||dK|| ~ eps_dd ||K||
    resid = np.max(np.abs(K @ x - b))
    assert resid / (np.abs(K).sum(axis=1).max() * np.max(np.abs(x))) \
        < 100 * eps_dd
    # forward error obeys the conditioning bound (vs the f64 solution,
    # itself only kappa*eps64 accurate — hence the shared kappa budget)
    kappa = np.linalg.cond(K)
    bound = 100 * kappa * eps_dd * np.max(np.abs(want))
    assert np.max(np.abs(x - want)) < bound
    # and f32 is qualitatively broken on the same system
    K32 = K.astype(np.float32)
    try:
        L32 = np.linalg.cholesky(K32)
        x32 = np.linalg.solve(K32, b.astype(np.float32)).astype(np.float64)
        f32_err = np.max(np.abs(x32 - want))
    except np.linalg.LinAlgError:
        f32_err = np.inf
    assert np.max(np.abs(x - want)) < f32_err / 100


def test_solve_pcg_eager_scaling_induced(rng):
    """EAGER solve_pcg on a SCALING-INDUCED kappa~1e10 SPD system — the
    pose-graph K shape: a moderately-conditioned core blown up by row/col
    scales spanning ~1e5 (lever arms). Jacobi rescaling undoes exactly
    this, so the f32-preconditioned DD PCG reaches ~1e-7 forward error.
    Jit execution is NOT covered — see the docstring's jit caveat."""
    n = 96
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    core = (q * rng.uniform(1.0, 1e3, n)) @ q.T       # kappa ~ 1e3
    scales = 10.0 ** rng.uniform(0.0, 4.0, n)          # rows span ~1e8 in K
    K = core * scales[:, None] * scales[None, :]
    b = rng.normal(0, 1.0, n) * scales
    want = np.linalg.solve(K, b)
    assert np.linalg.cond(K) > 1e8                     # genuinely f32-hostile
    x = val(df64.solve_pcg(from64(K), from64(b)))
    assert np.abs(x - want).max() / np.abs(want).max() < 1e-5
