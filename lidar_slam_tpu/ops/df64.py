"""Double-single ("df64") arithmetic: ~f64 precision from f32 pairs on TPU.

TPU has no f64 ALU and the JAX TPU plugin silently demotes float64 arrays to
f32, but the pose-graph backend's Woodbury capacitance matrix spans ~1e10 of
dynamic range with O(1) smallest eigenvalues (docs/SUBSYSTEMS.md): its
assembly and solve need ~1e-11 RELATIVE precision — f64 territory. This
module represents each number as an UNEVALUATED SUM of two f32s
``hi + lo`` (|lo| <= ulp(hi)/2) and implements the classic error-free
transformations (Dekker 1971, Knuth TAOCP 4.2.2, the double-double of
Hida/Li/Bailey's QD library — all public-domain numerics):

- ``two_sum`` / ``quick_two_sum``: exact error of f32 addition
- ``split`` / ``two_prod``: exact error of f32 multiplication via Veltkamp
  splitting (f32 has a 24-bit significand -> split constant 2^12 + 1; no FMA
  required, and XLA does not contract a*b+c on its own)

giving ~49 bits of effective significand — enough for the ~37 bits the
K-pipeline needs beyond f32's 24.

All ops are elementwise on arrays and vmap/jit-compatible; reductions are
balanced trees (log-depth, keeps both the error bound and the TPU happy).
Used by models/pose_graph.py's ``optimize_dd`` backend; validated
against true f64 on CPU (tests/test_df64.py) and by ``selftest()`` on any
backend.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# 2^12 + 1 (Veltkamp constant for f32). A PYTHON float, deliberately: a
# module-level jnp array would be one device buffer closed over by every
# DD program, and jax 0.9's handling of shared hoisted constants corrupts
# dispatch once several such programs coexist ("Execution supplied N
# buffers but compiled program expected M"). A weak-typed Python scalar is
# inlined as a literal into each program instead.
_SPLIT = 4097.0

# Every intermediate of an error-free transform goes through an
# optimization barrier: under jit, XLA's algebraic simplifier exploits
# exact-arithmetic identities like (s - a) when s = a + b and cancels the
# compensation terms to zero — measured: the jitted DD solve differed from
# eager by 1e4x the result magnitude until the barriers went in. The
# barrier only pins the EFT micro-ops; surrounding code still fuses.
_ob = jax.lax.optimization_barrier


class DD(NamedTuple):
    """hi + lo with |lo| <= ulp(hi)/2 (a "double-single" number)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def _pin(x: DD) -> DD:
    """Barrier a DD pair at a primitive boundary.

    The micro-op barriers inside the EFTs protect each identity, but a
    LARGE fused program still produced a different (and step-destroying)
    realization than op-by-op eager execution at 4,500-pose scale: the
    Woodbury back-substitution d = y1 - D^-1 B alpha cancels ~9 orders of
    magnitude, so every DD intermediate must be bit-identical across its
    consumers. Pinning each primitive's OUTPUT makes the jitted dataflow
    materialize exactly the values eager execution materializes (measured:
    jitted one-step cost 1.19e10 -> 1.19e7 = the eager/f64 value, at
    identical compile time). Cost: blocks producer fusion at DD op
    boundaries only — acceptable on this rare backend-rescue path."""
    hi, lo = _ob((x.hi, x.lo))
    return DD(hi, lo)


def dd(x) -> DD:
    """Lift f32 (or anything castable) to DD exactly."""
    x = jnp.asarray(x, jnp.float32)
    return DD(x, jnp.zeros_like(x))


def _two_sum(a, b):
    s = _ob(a + b)
    bb = _ob(s - a)
    err = _ob(a - _ob(s - bb)) + _ob(b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = _ob(a + b)
    return s, _ob(b - _ob(s - a))


def _split(a):
    t = _ob(_SPLIT * a)
    hi = _ob(t - _ob(t - a))
    return hi, _ob(a - hi)


def _two_prod(a, b):
    p = _ob(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = _ob(_ob(ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(x: DD, y: DD) -> DD:
    s, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return _pin(DD(*_quick_two_sum(s, e)))


def neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def sub(x: DD, y: DD) -> DD:
    return add(x, neg(y))


def mul(x: DD, y: DD) -> DD:
    p, e = _two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return _pin(DD(*_quick_two_sum(p, e)))


def mul_f(x: DD, f) -> DD:
    """DD * plain f32."""
    p, e = _two_prod(x.hi, jnp.asarray(f, jnp.float32))
    e = e + x.lo * f
    return _pin(DD(*_quick_two_sum(p, e)))


def div(x: DD, y: DD) -> DD:
    """Long-division with one refinement step (~full DD accuracy)."""
    q1 = x.hi / y.hi
    r = sub(x, mul_f(y, q1))
    q2 = r.hi / y.hi
    r = sub(r, mul_f(y, q2))
    q3 = r.hi / y.hi
    s, e = _quick_two_sum(q1, q2)
    return _pin(add(DD(s, e), dd(q3)))


def sqrt(x: DD) -> DD:
    """Karp's high-precision sqrt: one Newton step off the f32 estimate.
    Domain x > 0 (callers guard)."""
    approx = jnp.sqrt(x.hi)
    inv = jnp.where(approx > 0, 1.0 / jnp.maximum(approx, 1e-30), 0.0)
    # sqrt(x) ~ approx + (x - approx^2) * inv / 2
    diff = sub(x, DD(*_two_prod(approx, approx)))
    corr = diff.hi * inv * 0.5
    return _pin(DD(*_quick_two_sum(approx, corr)))


# -- array helpers -----------------------------------------------------------


def _pad_pow2(x: DD, axis: int):
    n = x.hi.shape[axis]
    m = 1 << (n - 1).bit_length()
    if m == n:
        return x, n
    pad = [(0, 0)] * x.hi.ndim
    pad[axis] = (0, m - n)
    return DD(jnp.pad(x.hi, pad), jnp.pad(x.lo, pad)), n


def dsum(x: DD, axis: int = -1) -> DD:
    """Balanced-tree reduction along ``axis`` in DD arithmetic."""
    axis = axis % x.hi.ndim
    x, _ = _pad_pow2(x, axis)
    while x.hi.shape[axis] > 1:
        m = x.hi.shape[axis] // 2
        lo_ = jax.lax.slice_in_dim(x.hi, 0, m, axis=axis)
        hi_ = jax.lax.slice_in_dim(x.hi, m, 2 * m, axis=axis)
        llo = jax.lax.slice_in_dim(x.lo, 0, m, axis=axis)
        lhi = jax.lax.slice_in_dim(x.lo, m, 2 * m, axis=axis)
        x = add(DD(lo_, llo), DD(hi_, lhi))
    return DD(jnp.squeeze(x.hi, axis), jnp.squeeze(x.lo, axis))


def cumsum(x: DD, axis: int = 0) -> DD:
    """Prefix sums in DD via an associative scan (log-depth)."""

    def comb(a, b):
        return add(DD(*a), DD(*b))

    hi, lo = jax.lax.associative_scan(comb, (x.hi, x.lo), axis=axis)
    return DD(hi, lo)


def dot_small(a: DD, b: DD, axis: int = -1) -> DD:
    """Contraction over a SMALL axis (e.g. the 6 of SE(3) blocks):
    elementwise DD products then tree-summed."""
    return dsum(mul(a, b), axis=axis)


def matvec(K: DD, p: DD) -> DD:
    """(N, N) DD @ (N,) DD with DD accumulation (tree over N)."""
    prod = mul(K, DD(p.hi[None, :], p.lo[None, :]))
    return dsum(prod, axis=1)


def to_f32(x: DD) -> jnp.ndarray:
    return x.hi + x.lo


# -- dense linear algebra ----------------------------------------------------


def cholesky(A: DD) -> DD:
    """Lower Cholesky of an SPD (N, N) DD matrix, right-looking with masked
    rank-1 updates (no dynamic slicing — TPU-friendly fixed shapes).

    Backward-stable at DD precision (~1e-15): the computed factor is exact
    for a ~1e-15-perturbed matrix, which is what an ill-conditioned solve
    (kappa ~ 1e10) needs — iterative methods at the same precision leave
    FORWARD error ~ kappa * eps that is not backward-consistent and breaks
    the consumer (measured on the pose-graph K: PCG alpha at 4e-7 forward
    error destroys the LM step; this factorization matches the f64 direct
    solve)."""
    N = A.hi.shape[0]
    idx = jnp.arange(N)

    def body(j, A):
        dj = DD(A.hi[j, j], A.lo[j, j])
        s = sqrt(dj)
        col = DD(A.hi[:, j], A.lo[:, j])
        Lj = div(col, DD(jnp.broadcast_to(s.hi, col.hi.shape),
                         jnp.broadcast_to(s.lo, col.lo.shape)))
        keep = idx >= j
        Lj = DD(jnp.where(keep, Lj.hi, 0.0), jnp.where(keep, Lj.lo, 0.0))
        below = idx > j
        Lb = DD(jnp.where(below, Lj.hi, 0.0), jnp.where(below, Lj.lo, 0.0))
        outer = mul(DD(Lb.hi[:, None], Lb.lo[:, None]),
                    DD(Lb.hi[None, :], Lb.lo[None, :]))
        A2 = sub(A, outer)  # touches only rows>j & cols>j (masks zero rest)
        return DD(A2.hi.at[:, j].set(Lj.hi), A2.lo.at[:, j].set(Lj.lo))

    A = jax.lax.fori_loop(0, N, body, A)
    tril = idx[:, None] >= idx[None, :]
    return DD(jnp.where(tril, A.hi, 0.0), jnp.where(tril, A.lo, 0.0))


def solve_cholesky(L: DD, b: DD) -> DD:
    """Solve (L L^T) x = b by two masked substitutions in DD."""
    N = L.hi.shape[0]
    idx = jnp.arange(N)

    def fwd(j, y):
        row = DD(L.hi[j], L.lo[j])
        m = idx < j
        row = DD(jnp.where(m, row.hi, 0.0), jnp.where(m, row.lo, 0.0))
        acc = dsum(mul(row, y), axis=0)
        yj = div(sub(DD(b.hi[j], b.lo[j]), acc), DD(L.hi[j, j], L.lo[j, j]))
        return DD(y.hi.at[j].set(yj.hi), y.lo.at[j].set(yj.lo))

    y = jax.lax.fori_loop(0, N, fwd, dd(jnp.zeros_like(b.hi)))

    def bwd(k, x):
        j = N - 1 - k
        colT = DD(L.hi[:, j], L.lo[:, j])  # L^T row j = L column j
        m = idx > j
        colT = DD(jnp.where(m, colT.hi, 0.0), jnp.where(m, colT.lo, 0.0))
        acc = dsum(mul(colT, x), axis=0)
        xj = div(sub(DD(y.hi[j], y.lo[j]), acc), DD(L.hi[j, j], L.lo[j, j]))
        return DD(x.hi.at[j].set(xj.hi), x.lo.at[j].set(xj.lo))

    return jax.lax.fori_loop(0, N, bwd, dd(jnp.zeros_like(b.hi)))


def _safe_div(num: DD, den: DD) -> DD:
    """num/den, 0 where |den| ~ 0 (PCG after convergence: stall, not NaN)."""
    ok = jnp.abs(den.hi) > 1e-30
    d = div(num, DD(jnp.where(ok, den.hi, 1.0), jnp.where(ok, den.lo, 0.0)))
    return DD(jnp.where(ok, d.hi, 0.0), jnp.where(ok, d.lo, 0.0))


def solve_pcg(A: DD, b: DD, iters: int = 40, lift: float = 4e-6) -> DD:
    """Solve SPD ``A x = b`` to ~1e-8 relative accuracy via DD-precision PCG
    preconditioned by a Jacobi-rescaled, diagonally-lifted f32 Cholesky —
    the FAST path for K-matrices whose ill-conditioning is scaling-induced.

    The pose-graph capacitance matrix K = I + B^T D^-1 B spans ~1e10 of
    dynamic range because loop lever arms scale its translation rows;
    symmetric Jacobi scaling S K S (S = diag(K)^-1/2) drops kappa 6.2e8 ->
    9.7e7 on the full-scale KITTI test graph. That is still at the f32
    Cholesky EDGE (LAPACK f32 rejects it as indefinite), so the factor gets
    a diagonal lift ``lift`` (>= ~50x the f32 assembly perturbation of the
    unit-diagonal scaled matrix). Plain iterative refinement then DIVERGES
    — the f32 triangular-solve arithmetic errs by kappa~ * eps32 ~ 6 > 1
    per application (measured: fwd err 5e23 after 24 sweeps) — but PCG
    minimizes over the Krylov space instead of fixed-point iterating, and
    with all vector algebra (matvec, dots, axpys) in DD it reaches 1e-7
    relative in ~16 iterations and floors at ~1.4e-8 (measured on the
    full-scale K; the direct DD Cholesky reaches 3.8e-7). Per iteration:
    one (N, N) DD matvec + two f32 triangular solves — O(N^2), vs the
    direct factorization's O(N^3) SEQUENTIAL DD work, ~1000x cheaper at
    engine scale (N ~ 1e3).

    Degrades loudly, not wrongly: if even the lifted f32 factorization
    fails, NaN poisons the result and the caller's accept/reject or
    convergence ladder escalates to :func:`cholesky` +
    :func:`solve_cholesky` (backward-stable at any conditioning).

    JIT CAVEAT: correct eagerly but a single fused jit degrades it to
    ~0.6 relative (realization splitting + the broadcast-multiplier
    miscompile — see solve_pcg_staged, the jit-safe variant).

    WHY THIS IS NOT THE DEFAULT TIER: PCG's error is FORWARD error at the
    kappa~ * eps_dd floor (~2e-7 relative on the pose-graph K), in an
    arbitrary direction. The Woodbury consumer computes
    d = y1 - D^-1 B alpha, a ~9-order cancellation: it survives the direct
    DD Cholesky's larger-looking error because backward-stable
    factorization error is CONSISTENT with the system, but PCG's
    2.5e-7 forward error destroys the step at harsh states (measured:
    step cost 2.9e11 vs the direct tier's 1.18e7 from the same system).
    Enabling this tier as default requires outer-system iterative
    refinement (solve, compute the (D + B B^T) residual in DD, solve the
    correction) to make the combined error backward-consistent —
    ~2x the PCG cost, still O(N^2) per LM step. Until then
    ``PoseGraphConfig.dd_solve`` defaults to 'direct'."""
    import jax.scipy.linalg as jsl

    N = A.hi.shape[0]
    idx = jnp.arange(N)
    dg = A.hi[idx, idx]
    s = _ob(1.0 / jnp.sqrt(jnp.maximum(dg, 1e-30)))   # one pinned realization
    At = mul_f(mul_f(A, s[None, :]), s[:, None])      # S A S in DD
    bt = mul_f(b, s)
    P32 = to_f32(At) + lift * jnp.eye(N, dtype=jnp.float32)
    Lf = jnp.linalg.cholesky(P32)

    def prec(rv):
        y = jsl.solve_triangular(Lf, rv, lower=True)
        return jsl.solve_triangular(Lf.T, y, lower=False)

    x0 = dd(jnp.zeros_like(b.hi))
    r0 = bt
    z0 = dd(prec(to_f32(r0)))
    p0 = z0
    rz0 = dot_small(r0, z0, axis=0)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = matvec(At, p)
        alpha = _safe_div(rz, dot_small(p, Ap, axis=0))
        x = add(x, mul(alpha, p))
        r = sub(r, mul(alpha, Ap))
        z = dd(prec(to_f32(r)))
        rz_new = dot_small(r, z, axis=0)
        beta = _safe_div(rz_new, rz)
        p = add(z, mul(beta, p))
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return mul_f(x, s)


@__import__("functools").lru_cache(maxsize=None)
def _pcg_fns(N: int, lift: float):
    """Jitted phases of the staged PCG (one entry per system size): scale,
    factor, init, one-iteration, unscale — every cross-phase value is a
    materialized parameter (see solve_pcg's jit caveat and
    models/pose_graph._dd_prep for why fused programs break DD algebra)."""
    import jax.scipy.linalg as jsl

    # The scale factors arrive as FULL-SHAPE (N, N) parameters: XLA:CPU
    # (jax 0.9) miscompiles error-free transforms whose multiplier is an
    # in-program BROADCAST — mul_f(A, s[None, :]) under jit loses the whole
    # compensation channel (measured hi/lo diff 2e-3 vs eager; bit-exact
    # with materialized full-shape parameters, even nested). The scaling
    # must stay a true rank-1 row/col scaling tracked at DD precision —
    # pre-rounding s_i*s_j to f32 would perturb the scaled matrix entrywise
    # at eps32, the same perturbation that makes the unscaled K indefinite.
    def _scale(A: DD, b: DD, Sc, Sr, s):
        return mul_f(mul_f(A, Sc), Sr), mul_f(b, s)

    def _chol(At: DD):
        return jnp.linalg.cholesky(
            to_f32(At) + lift * jnp.eye(N, dtype=jnp.float32)
        )

    def _prec(Lf, rv):
        y = jsl.solve_triangular(Lf, rv, lower=True)
        return jsl.solve_triangular(Lf.T, y, lower=False)

    def _init(btS: DD, Lf):
        r = btS
        z = dd(_prec(Lf, to_f32(r)))
        rz = dot_small(r, z, axis=0)
        x = dd(jnp.zeros_like(btS.hi))
        return x, r, z, rz

    def _iter(At: DD, Lf, x: DD, r: DD, p: DD, rz: DD):
        Ap = matvec(At, p)
        al = _safe_div(rz, dot_small(p, Ap, axis=0))
        x = add(x, mul(al, p))
        r = sub(r, mul(al, Ap))
        z = dd(_prec(Lf, to_f32(r)))
        rz_new = dot_small(r, z, axis=0)
        beta = _safe_div(rz_new, rz)
        p = add(z, mul(beta, p))
        return x, r, p, rz_new

    def _unscale(x: DD, s):
        return mul_f(x, s)

    return (jax.jit(_scale), jax.jit(_chol), jax.jit(_init),
            jax.jit(_iter), jax.jit(_unscale))


def solve_pcg_staged(A: DD, b: DD, iters: int = 96, lift: float = 4e-6) -> DD:
    """Jit-safe :func:`solve_pcg`: the host drives the PCG loop over small
    jitted phases with materialized hand-offs (same accuracy as the eager
    path — ~3e-7 forward error on the full-scale pose-graph K; measured
    identical). Each iteration is one dispatch of O(N^2) work; use from
    host-driven loops (pose_graph.optimize_dd), not inside jit."""
    import numpy as np

    N = A.hi.shape[0]
    scale, chol, init, step, unscale = _pcg_fns(N, float(lift))
    # Jacobi scale from the f32 diagonal on the HOST — one deterministic
    # realization — expanded to FULL-SHAPE row/col matrices so no program
    # contains a broadcast multiplier (see _scale's comment).
    dg = np.asarray(A.hi)[np.arange(N), np.arange(N)]
    s_np = (1.0 / np.sqrt(np.maximum(dg, 1e-30))).astype(np.float32)
    Sc = jnp.asarray(np.ascontiguousarray(np.broadcast_to(s_np[None, :], (N, N))))
    Sr = jnp.asarray(np.ascontiguousarray(np.broadcast_to(s_np[:, None], (N, N))))
    s = jnp.asarray(s_np)
    At, btS = scale(A, b, Sc, Sr, s)
    Lf = chol(At)
    x, r, p, rz = init(btS, Lf)
    rz0 = abs(float(rz.hi))
    for _ in range(iters):
        x, r, p, rz = step(At, Lf, x, r, p, rz)
        # host-side exit on the preconditioned residual norm: each check is
        # one scalar fetch per iteration (this loop is host-driven anyway)
        if abs(float(rz.hi)) <= 1e-26 * max(rz0, 1e-30):
            break
    return unscale(x, s)


@__import__("functools").lru_cache(maxsize=None)
def _resid_fn(N: int):
    """Jitted DD residual r = b - A x with every operand a materialized
    parameter (same safety class as _pcg_fns' _iter phase, which already
    runs matvec-under-jit correctly; the EFT-breaking pattern is broadcast
    f32 multipliers and cross-program shared subexpressions, neither of
    which appears here)."""

    def _resid(A: DD, b: DD, x: DD) -> DD:
        return sub(b, matvec(A, x))

    return jax.jit(_resid)


def solve_pcg_refined(A: DD, b: DD, iters: int = 96, lift: float = 4e-6,
                      refine: int = 2) -> DD:
    """:func:`solve_pcg_staged` + OUTER-SYSTEM DD iterative refinement —
    the missing piece named in :func:`solve_pcg`'s "WHY THIS IS NOT THE
    DEFAULT TIER" note (round 5).

    PCG's error is FORWARD error at the preconditioned-kappa * eps_dd floor
    (~2e-7 relative on the full-scale pose-graph K) in an arbitrary
    direction, which the Woodbury consumer's ~9-order cancellation cannot
    survive. Refinement computes the residual r = b - A x in full DD and
    solves the correction through the same PCG; each round contracts the
    error by the PCG convergence factor, so 1-2 rounds reach a
    backward-consistent ~1e-13 relative solution. Cost: (1 + refine) PCG
    solves + refine DD matvecs — still O(N^2) per application vs the direct
    DD Cholesky's O(N^3) SEQUENTIAL work.

    Degrades like solve_pcg: a failed lifted f32 factorization propagates
    NaN and the caller's ladder escalates to the direct tier.
    """
    x = solve_pcg_staged(A, b, iters=iters, lift=lift)
    resid = _resid_fn(A.hi.shape[0])
    for _ in range(refine):
        r = resid(A, b, x)
        dx = solve_pcg_staged(A, r, iters=iters, lift=lift)
        x = add(x, dx)
    return x


def selftest() -> float:
    """Max relative error of DD ops vs known-exact results — run on any
    backend to verify XLA preserves the error-free transforms (it must not
    contract a*b+c into an FMA or reassociate; XLA's default semantics
    don't). Returns ~1e-14 when healthy, ~1e-7 if DD is broken."""
    import numpy as np

    rng = np.random.default_rng(0)
    a64 = rng.uniform(1.0, 2.0, 4096) * 10.0 ** rng.integers(-6, 7, 4096)
    # cancellation-heavy alternating sum
    a64 = np.concatenate([a64, -a64 * (1 - 1e-9)])
    rng.shuffle(a64)
    want = np.sum(a64.astype(np.float64))
    mass = np.sum(np.abs(a64))  # DD precision is relative to the operand
    # mass (~2^-49 * mass), not to a catastrophically-cancelled result
    ahi = a64.astype(np.float32)
    alo = (a64 - ahi.astype(np.float64)).astype(np.float32)
    got = jax.jit(lambda h, l: dsum(DD(h, l), axis=0))(ahi, alo)
    err_sum = abs(float(got.hi) + float(got.lo) - want) / mass

    b64 = rng.uniform(0.5, 1.5, a64.shape) * 10.0 ** rng.integers(-3, 4, a64.shape)
    want_dot = float(np.dot(a64, b64))
    bhi = b64.astype(np.float32)
    blo = (b64 - bhi.astype(np.float64)).astype(np.float32)
    got = jax.jit(
        lambda ah, al, bh, bl: dot_small(DD(ah, al), DD(bh, bl), axis=0)
    )(ahi, alo, bhi, blo)
    err_dot = abs(float(got.hi) + float(got.lo) - want_dot) / np.sum(
        np.abs(a64 * b64)
    )
    return max(err_sum, err_dot)
