"""Pose-graph optimization (Gauss-Newton on SE(3)).

NEW capability — the reference has no geometric backend at all (no
bundle adjustment, no pose graph; SURVEY.md executive summary). This
module adds a TPU-native pose-graph refiner used to fuse odometry
chains with loop-closure / relocalization constraints:

  * state: N absolute poses (R_i, t_i), first pose gauge-fixed;
  * residuals: for each edge (i, j) with measured relative transform
    Z_ij, r = log_SE3( Z_ij^-1 * (X_i^-1 * X_j) )  in R^6;
  * solver: damped Gauss-Newton on a *local tangent* parameterization.
    Each edge depends on exactly two poses, so the edge Jacobian is two
    (6, 6) blocks (``jax.jacfwd`` over a 12-dim per-edge tangent,
    vmapped over edges) and the normal equations assemble by block
    scatter-add — O(E) assembly + one linear solve per iteration, fully
    jittable with fixed iteration count (``lax`` loops), so the whole
    refinement is ONE compiled kernel.

    Two linear solvers (``solver=``):

    * ``"dense"`` — materialize the (6N, 6N) normal matrix and Cholesky.
      Memory is 36 N^2 floats and the solve is O(N^3). Measured
      envelope on one v5e chip (tools/profiling/exp_r5_posegraph.py,
      10 GN iterations, value-fenced): N=200 -> 43 ms (5.8 MB matrix),
      N=500 -> 96 ms (36 MB), N=1000 -> 312 ms (144 MB); at N=2000 the
      576 MB graph no longer compiles through the remote TPU compile
      helper (environment bound, not an OOM of the chip itself).
      Dense is the right tool up to ~1k keyframes.
    * ``"cg"`` — matrix-free block-Jacobi-preconditioned conjugate
      gradient on the same normal equations: the operator applies the
      per-edge (6, 6) blocks directly (O(E) work and memory per
      matvec, the dense matrix is never formed), preconditioned by the
      inverted 6x6 diagonal blocks. Fixed ``cg_iterations`` keeps the
      solve a single compiled ``lax.scan``. Measured (100 CG x 10 GN):
      N=200 -> 41 ms, N=1000 -> 73 ms, N=2000 -> 113 ms, N=5000 ->
      234 ms, N=10000 -> 474 ms — linear in E, and already at parity
      with dense at N=200. This is the scale-out path for
      multi-sequence graphs; the Schur/psum-sharded variant over the
      device mesh distributes the same assembly. (GN itself, either
      solver, needs a sane initialization: a synthetic chain drifted
      ~19 m off ground truth diverged — real usage solves
      incrementally as closures arrive, keeping the linearization
      valid.)

SE(3) log/exp here use the first-order-exact closed forms with
small-angle guards, accurate for the small residuals a vSLAM graph
produces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from atdn_vslam_tpu.geometry.se3 import se3_inverse

_EPS = 1e-8


def _skew(v: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], -1),
        ],
        -2,
    )


# Small-angle guards follow the "double-where" pattern: every ratio is
# computed from a SMOOTH primitive (theta^2 as a polynomial of the
# inputs, never a norm/arccos at the singular point), with the
# singular-branch inputs replaced by safe constants BEFORE the
# nonlinearity so reverse-mode gradients stay finite at identity —
# jacfwd/jacrev of the Gauss-Newton residual hit exactly that point
# when the graph is consistent.

_SMALL = 1e-8


def _sincs(t2: jax.Array):
    """(sin th/th, (1-cos th)/th^2, (th - sin th)/th^3) from theta^2,
    gradient-safe at 0."""
    small = t2 < _SMALL
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2_safe)
    c = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0,
        (theta - jnp.sin(theta)) / (t2_safe * theta),
    )
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues, gradient-safe at 0. (..., 3) -> (..., 3, 3)."""
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = _skew(w)
    a, b, _ = _sincs(t2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) rotation vector.

    Guarded at both singular regions: gradient-safe Taylor branch near
    the identity, and an axis-from-symmetric-part branch near theta=pi
    where the antisymmetric vee vector vanishes (a loop-closure edge
    with ~180 deg residual must not produce NaNs in the pose-graph
    solve)."""
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    cos = cos[..., None]
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    near_id = cos > 1.0 - 1e-6
    near_pi = cos < -1.0 + 1e-4
    cos_safe = jnp.where(near_id | near_pi, 0.0, cos)
    theta = jnp.arccos(cos_safe)
    # theta^2 via the smooth polynomial 2(1-cos) near identity
    t2_small = 2.0 * (1.0 - cos)
    scale = jnp.where(
        near_id,
        0.5 + t2_small / 12.0,
        theta / (2.0 * jnp.sin(jnp.where(near_id | near_pi, 1.0, theta))),
    )
    main = scale * vee

    # near pi: axis is the dominant column of R + I (R ~= 2nn^T - I)
    B = R + jnp.eye(3, dtype=R.dtype)
    col_norms = jnp.linalg.norm(B, axis=-2)  # (..., 3)
    k = jnp.argmax(col_norms, axis=-1)
    axis = jnp.take_along_axis(B, k[..., None, None], axis=-1)[..., 0]
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    theta_pi = jnp.arccos(jnp.clip(cos[..., 0], -1.0 + 1e-7, 1.0))
    # orient consistently with the (tiny but signed) vee vector
    sign = jnp.where(jnp.sum(vee * axis, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    pi_branch = theta_pi[..., None] * axis * sign

    return jnp.where(near_pi, pi_branch, main)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) = (rho, phi) -> (..., 4, 4) via the SE(3) exp map."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    K = _skew(phi)
    _, b, c = _sincs(t2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * (K @ K)
    t = (V @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], -2)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> twist (..., 6) = (rho, phi), gradient-safe at I."""
    phi = so3_log(T[..., :3, :3])
    t2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    K = _skew(phi)
    small = t2 < _SMALL
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    # V^-1 = I - K/2 + coef K^2; the (1+cos)/(2 theta sin) term tends
    # to 0 at theta=pi but 0/0s numerically — guard the denominator
    # (coef -> 1/pi^2 there)
    denom = 2.0 * theta * jnp.sin(theta)
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    coef = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / t2_safe - (1.0 + jnp.cos(theta)) / denom,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    v_inv = eye - 0.5 * K + coef * (K @ K)
    rho = (v_inv @ T[..., :3, 3:])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def edge_residuals(
    poses: jax.Array, edges_i: jax.Array, edges_j: jax.Array,
    measurements: jax.Array,
) -> jax.Array:
    """r_e = log( Z_e^-1 * X_i^-1 * X_j ) for each edge -> (E, 6)."""
    xi = poses[edges_i]
    xj = poses[edges_j]
    pred = se3_inverse(xi) @ xj
    return se3_log(se3_inverse(measurements) @ pred)


def _pcg_solve(
    matvec, b: jax.Array, prec, iterations: int
) -> jax.Array:
    """Fixed-iteration preconditioned conjugate gradient (flattened
    operands, jittable — a tolerance-based ``while_loop`` would also
    work but a static ``scan`` keeps the whole GN solve one fused
    program and the iteration count is part of the documented cost)."""

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    # Convergence freeze: once ||r||^2 drops below ~f32 noise relative
    # to ||b||^2, further iterations divide near-zero rz/pAp and
    # AMPLIFY rounding noise instead of refining (measured: a
    # fixed-150-iteration f32 solve on a 48-dof graph drifted 0.35 in
    # the poses once past convergence, and GSPMD reduction-order noise
    # made sharded != unsharded). Freeze alpha/beta at 0 when
    # converged — the state is then a fixed point.
    bnorm2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def body(state, _):
        x, r, p, rz = state
        active = jnp.sum(r * r) > 1e-12 * bnorm2
        ap = matvec(p)
        pap = jnp.sum(p * ap)
        ok = active & (pap > 0)
        alpha = jnp.where(ok, rz / jnp.where(pap == 0, 1.0, pap), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(ok, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z + beta * p
        rz_next = jnp.where(ok, rz_new, rz)
        return (x, r, p, rz_next), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, p0, rz0), None, length=iterations
    )
    return x


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "damping", "solver", "cg_iterations"),
)
def optimize_pose_graph(
    poses: jax.Array,
    edges_i: jax.Array,
    edges_j: jax.Array,
    measurements: jax.Array,
    weights: jax.Array | None = None,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "dense",
    cg_iterations: int = 100,
) -> tuple[jax.Array, jax.Array]:
    """Damped Gauss-Newton over a pose graph. Jitted end-to-end (the
    whole solve is one device computation — an un-jitted call pays one
    host dispatch per surrounding op, which dominated the measured
    solve time through the remote-device link).

    :param poses: (N, 4, 4) initial absolute poses; pose 0 is held
        fixed (gauge).
    :param edges_i, edges_j: (E,) int edge endpoints.
    :param measurements: (E, 4, 4) measured relative transforms
        X_i^-1 X_j (odometry steps, loop closures, relocalizations).
    :param weights: optional (E,) per-edge information weights.
    :param solver: ``"dense"`` (Cholesky on the materialized (6N, 6N)
        normal matrix — best below ~1-2k nodes, see module docstring)
        or ``"cg"`` (matrix-free block-Jacobi PCG — O(E) memory, use
        for large graphs).
    :param cg_iterations: CG steps per GN iteration (``"cg"`` only).
    :return: (optimized (N, 4, 4) poses, final mean squared residual).
    """
    if solver not in ("dense", "cg"):
        raise ValueError(f"unknown solver {solver!r}")
    # TPU matmuls default to bf16-precision MXU passes; the normal
    # equations are ill-conditioned enough (weighted closures +
    # tiny damping) that the assembly einsums and the blocked
    # Cholesky then produce NaNs on chip (measured: dense solve
    # NaN at every N on v5e, exact same graph fine on CPU). The
    # graph is tiny next to the networks -- full f32 costs nothing.
    with jax.default_matmul_precision("highest"):
        n = poses.shape[0]
        e = edges_i.shape[0]
        w = jnp.ones((e,), poses.dtype) if weights is None else weights
        sqrt_w = jnp.sqrt(w)[:, None]

        # Sparse GN assembly: each edge depends on exactly TWO poses, so
        # the edge Jacobian has two (6, 6) blocks — computed by jacfwd over
        # a 12-dim per-edge tangent (vmapped over edges) instead of pushing
        # all (N-1)*6 tangents through every residual (the dense jacfwd
        # formulation measured 937 ms for a 200-node/204-edge graph on a
        # v5e; this assembly is O(E) + one dense solve).
        def edge_res(di, dj, xi, xj, z, sw):
            pred = se3_inverse(xi @ se3_exp(di)) @ (xj @ se3_exp(dj))
            return se3_log(se3_inverse(z) @ pred) * sw

        edge_jac = jax.vmap(
            jax.jacfwd(edge_res, argnums=(0, 1)), in_axes=(None, None, 0, 0, 0, 0)
        )

        def gn_step(state, _):
            cur, _prev = state
            xi, xj = cur[edges_i], cur[edges_j]
            r0 = edge_residuals(cur, edges_i, edges_j, measurements) * sqrt_w
            zero6 = jnp.zeros((6,), poses.dtype)
            ji, jj = edge_jac(zero6, zero6, xi, xj, measurements, sqrt_w)

            rhs = jnp.zeros((n, 6), poses.dtype)
            rhs = rhs.at[edges_i].add(-jnp.einsum("era,er->ea", ji, r0))
            rhs = rhs.at[edges_j].add(-jnp.einsum("era,er->ea", jj, r0))

            if solver == "dense":
                # normal equations via block scatter-add: JtJ[(a, b)] +=
                # Ja^T Jb for (a, b) in {i, j}^2; rhs[a] += -Ja^T r
                jtj = jnp.zeros((n, 6, n, 6), poses.dtype)
                jtj = jtj.at[edges_i, :, edges_i, :].add(
                    jnp.einsum("era,erb->eab", ji, ji)
                )
                jtj = jtj.at[edges_j, :, edges_j, :].add(
                    jnp.einsum("era,erb->eab", jj, jj)
                )
                jtj = jtj.at[edges_i, :, edges_j, :].add(
                    jnp.einsum("era,erb->eab", ji, jj)
                )
                jtj = jtj.at[edges_j, :, edges_i, :].add(
                    jnp.einsum("era,erb->eab", jj, ji)
                )

                # gauge: pose 0 fixed — drop its block row/column.
                # Marquardt-scaled damping (lam * diag(A) + lam * I):
                # absolute-only damping left the smallest eigenvalue at
                # ~the damping value, far below the f32 rounding noise
                # of matrix entries once edges carry O(100) weights —
                # the TPU's blocked Cholesky then hits a negative pivot
                # and the whole solve goes NaN from GN iteration 2
                # (measured on v5e; the identical graph passed on CPU
                # by rounding luck). Relative damping keeps the floor
                # proportional to the matrix scale.
                m = (n - 1) * 6
                A = jtj.reshape(n * 6, n * 6)[6:, 6:]
                A = (
                    A
                    + damping * jnp.diag(jnp.diagonal(A))
                    + damping * jnp.eye(m, dtype=poses.dtype)
                )
                b = rhs.reshape(n * 6)[6:]
                # JtJ is SPD (damped normal equations): Cholesky beats LU
                # on TPU
                L = jax.scipy.linalg.cho_factor(A, lower=True)
                delta = jax.scipy.linalg.cho_solve(L, b).reshape(n - 1, 6)
            else:
                # Matrix-free PCG on the gauge-projected normal equations.
                # The operator applies only the per-edge (6, 6) blocks —
                # O(E) memory; the (6N)^2 matrix is never formed. The
                # gauge (pose 0 fixed) is enforced by projecting block row
                # 0 of both the rhs and every matvec result to zero; the
                # damping keeps the projected operator SPD on the
                # complement.
                def project(v):
                    return v.at[0].set(0.0)

                # per-pose 6x6 diagonal blocks (also the preconditioner)
                diag = jnp.zeros((n, 6, 6), poses.dtype)
                diag = diag.at[edges_i].add(jnp.einsum("era,erb->eab", ji, ji))
                diag = diag.at[edges_j].add(jnp.einsum("era,erb->eab", jj, jj))
                # Marquardt-scaled damping — same scaling as the dense
                # path (see comment there): lam * diag + lam
                dvec = damping * (
                    jnp.diagonal(diag, axis1=-2, axis2=-1) + 1.0
                )

                def matvec(v):
                    v = project(v)
                    u = (
                        jnp.einsum("eab,eb->ea", ji, v[edges_i])
                        + jnp.einsum("eab,eb->ea", jj, v[edges_j])
                    )
                    out = jnp.zeros((n, 6), poses.dtype)
                    out = out.at[edges_i].add(jnp.einsum("eab,ea->eb", ji, u))
                    out = out.at[edges_j].add(jnp.einsum("eab,ea->eb", jj, u))
                    return project(out + dvec * v)

                # block-Jacobi preconditioner: invert the damped 6x6
                # diagonal blocks (pose 0's block is identity — the
                # projection keeps its component zero anyway)
                diag = diag + jax.vmap(jnp.diag)(dvec)
                diag = diag.at[0].set(jnp.eye(6, dtype=poses.dtype))
                diag_chol = jax.vmap(
                    lambda a: jax.scipy.linalg.cho_factor(a, lower=True)[0]
                )(diag)

                def prec(r):
                    return jax.vmap(
                        lambda l, x: jax.scipy.linalg.cho_solve((l, True), x)
                    )(diag_chol, project(r))

                delta_full = _pcg_solve(
                    matvec, project(rhs), prec, cg_iterations
                )
                delta = delta_full[1:]

            full = jnp.concatenate([jnp.zeros((1, 6), poses.dtype), delta], 0)
            new = cur @ se3_exp(full)
            return (new, jnp.mean(r0**2)), None

        (optimized, mse), _ = jax.lax.scan(
            gn_step, (poses, jnp.asarray(0.0, poses.dtype)), None,
            length=iterations,
        )
        final_r = edge_residuals(optimized, edges_i, edges_j, measurements)
        return optimized, jnp.mean(final_r**2)


def odometry_edges(n: int) -> tuple[jax.Array, jax.Array]:
    """Consecutive-pose chain edges (0-1, 1-2, ...)."""
    idx = jnp.arange(n - 1)
    return idx, idx + 1


def optimize_pose_graph_sharded(
    mesh,
    poses: jax.Array,
    edges_i: jax.Array,
    edges_j: jax.Array,
    measurements: jax.Array,
    weights: jax.Array | None = None,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "dense",
    cg_iterations: int = 100,
) -> tuple[jax.Array, jax.Array]:
    """Distributed pose-graph solve: edges shard over the mesh "data"
    axis; each device evaluates its edge block's residuals/Jacobian
    rows and GSPMD reduces J^T J and J^T r over ICI (the psum'd
    normal-equation assembly of a distributed BA backend — SURVEY.md
    build step 9). Poses replicate; the dense solve is tiny (pass
    ``solver="cg"`` for large graphs — the matvec's scatter-adds
    reduce the same way).

    Edge count must be divisible by the data-axis size (pad with
    weight-0 self-edges if needed).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    e = edges_i.shape[0]
    data = mesh.shape["data"]
    if e % data != 0:
        pad = data - e % data
        edges_i = jnp.concatenate([edges_i, jnp.zeros(pad, edges_i.dtype)])
        edges_j = jnp.concatenate([edges_j, jnp.zeros(pad, edges_j.dtype)])
        eye = jnp.broadcast_to(
            jnp.eye(4, dtype=measurements.dtype), (pad, 4, 4)
        )
        measurements = jnp.concatenate([measurements, eye])
        w = jnp.ones((e,), poses.dtype) if weights is None else weights
        weights = jnp.concatenate([w, jnp.zeros((pad,), poses.dtype)])

    edge_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    args = (
        jax.device_put(poses, repl),
        jax.device_put(edges_i, edge_sharding),
        jax.device_put(edges_j, edge_sharding),
        jax.device_put(measurements, edge_sharding),
        jax.device_put(weights, edge_sharding) if weights is not None else None,
    )
    return _sharded_solve_fn(mesh, iterations, damping, solver, cg_iterations)(
        *args
    )


@functools.lru_cache(maxsize=8)
def _sharded_solve_fn(
    mesh, iterations: int, damping: float, solver: str, cg_iterations: int
):
    """Cached jitted solver (a fresh lambda per call would defeat
    jit's trace cache and pay retrace on every solve)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(
        lambda p, ei, ej, m, w: optimize_pose_graph(
            p, ei, ej, m, w, iterations, damping, solver, cg_iterations
        ),
        out_shardings=(repl, repl),
    )
