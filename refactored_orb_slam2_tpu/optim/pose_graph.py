"""Essential-graph pose optimization over Sim3 (mono) / SE3 (stereo, RGB-D).

Replaces Optimizer::OptimizeEssentialGraph — both the 7-DoF Sim3
implementation for monocular (Optimizer.cc:763-1043) and the 6-DoF SE3 one
for stereo/RGB-D (Optimizer.cc:1052-1362; scale frozen at 1).  Nodes are
keyframe Sim3 poses ``S_iw``; edges carry relative measurements
``M_ji = S_jw * S_iw^-1`` captured at edge-creation time (loop edges use
the corrected relative pose).  Residual per edge:

    r = log( M_ji * S_i * S_j^-1 )   in R^7 (rho, phi, sigma)

which is zero when the graph is consistent with the measurement.
Jacobians come from forward-mode autodiff of the tangent perturbation
(batched over edges); the normal system is assembled by segment-sum
scatters.  Two solvers:

- ``solver="dense"``: materialize H (K,K,7,7), one (7K,7K) dense solve —
  fastest for small graphs (K <= ~512).
- ``solver="pcg"``: matrix-free block-Jacobi preconditioned CG over the
  per-edge blocks — memory O(E*49), never materializes H; the path for
  KITTI-scale graphs (K in the thousands) where the dense assembly would
  be gigabytes.  Pose graphs are chain-like, so information propagates
  one hop per CG iteration: n_cg should be on the order of the graph
  diameter (the LM outer loop compounds propagation, so n_cg ~ K/4
  converges to the dense solution in practice; see tests/test_pose_graph).

20 LM iterations like the reference (OptimizeEssentialGraph,
Optimizer.cc:989 and :1305).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, sim3


class PoseGraphEdges(NamedTuple):
    """Padded edge list.  i/j: (E,) int32 node ids (-1 pad).  Measurement
    M_ji stored as (R (E,3,3), t (E,3), s (E,))."""

    i: jax.Array
    j: jax.Array
    R: jax.Array
    t: jax.Array
    s: jax.Array
    weight: jax.Array   # (E,) information scale (1.0 normal, higher for loop)
    valid: jax.Array


def make_edges_from_poses(i, j, poses_R, poses_t, poses_s, valid):
    """Build measurements M_ji = S_j * S_i^-1 from current node poses."""
    ic = jnp.clip(i, 0)
    jc = jnp.clip(j, 0)
    Ri, ti, si = poses_R[ic], poses_t[ic], poses_s[ic]
    Rj, tj, sj = poses_R[jc], poses_t[jc], poses_s[jc]
    Rii, tii, sii = sim3.inverse(Ri, ti, si)
    Rm, tm, sm = sim3.compose(Rj, tj, sj, Rii, tii, sii)
    return PoseGraphEdges(
        i=i, j=j, R=Rm, t=tm, s=sm,
        weight=jnp.ones_like(sm), valid=valid,
    )


def _edge_residual(dz_i, dz_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """r = log(M * exp(dz_i) S_i * (exp(dz_j) S_j)^-1), (7,)."""
    Rdi, tdi, sdi = sim3.exp(dz_i)
    Rdj, tdj, sdj = sim3.exp(dz_j)
    R1, t1, s1 = sim3.compose(Rdi, tdi, sdi, Ri, ti, si)
    R2, t2, s2 = sim3.compose(Rdj, tdj, sdj, Rj, tj, sj)
    R2i, t2i, s2i = sim3.inverse(R2, t2, s2)
    Ra, ta, sa = sim3.compose(R1, t1, s1, R2i, t2i, s2i)
    Rr, tr, sr = sim3.compose(Rm, tm, sm, Ra, ta, sa)
    return sim3.log(Rr, tr, sr)


def optimize_pose_graph(
    poses_R: jax.Array,     # (K, 3, 3) S_iw rotations
    poses_t: jax.Array,     # (K, 3)
    poses_s: jax.Array,     # (K,)
    node_valid: jax.Array,  # (K,)
    node_fixed: jax.Array,  # (K,)
    edges: PoseGraphEdges,
    *,
    fix_scale: bool,
    n_iters: int = 20,
    solver: str = "dense",
    n_cg: int | None = None,
):
    """LM over the pose graph.  Returns updated (R, t, s).

    fix_scale=True freezes the scale coordinate (SE3 mode — the reference's
    stereo/RGB-D variant with its checkUnitScale assertion,
    Optimizer.cc:1057-1067).

    solver="pcg" never materializes the (K,K,7,7) Hessian: the normal
    equations are solved matrix-free by block-Jacobi preconditioned CG over
    the per-edge 7x7 blocks (memory O(E*49 + K*49)); n_cg defaults to
    max(64, K//4) — with 20 LM outer iterations the total information
    propagation far exceeds the graph diameter.
    """
    K = poses_R.shape[0]
    E = edges.i.shape[0]
    ic = jnp.clip(edges.i, 0)
    jc = jnp.clip(edges.j, 0)
    zero7 = jnp.zeros(7, dtype=poses_t.dtype)

    def residuals_and_jacs(R, t, s):
        Ri, ti, si = R[ic], t[ic], s[ic]
        Rj, tj, sj = R[jc], t[jc], s[jc]

        def one(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
            f = lambda di, dj: _edge_residual(di, dj, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
            r = f(zero7, zero7)
            Ji = jax.jacfwd(f, argnums=0)(zero7, zero7)
            Jj = jax.jacfwd(f, argnums=1)(zero7, zero7)
            return r, Ji, Jj

        return jax.vmap(one)(Ri, ti, si, Rj, tj, sj, edges.R, edges.t, edges.s)

    free = (node_valid & ~node_fixed).astype(poses_t.dtype)

    def total_err(R, t, s):
        Ri, ti, si = R[ic], t[ic], s[ic]
        Rj, tj, sj = R[jc], t[jc], s[jc]
        r = jax.vmap(
            lambda Ri, ti, si, Rj, tj, sj, Rm, tm, sm: _edge_residual(
                zero7, zero7, Ri, ti, si, Rj, tj, sj, Rm, tm, sm
            )
        )(Ri, ti, si, Rj, tj, sj, edges.R, edges.t, edges.s)
        w = (edges.valid.astype(r.dtype) * edges.weight)[:, None]
        return jnp.sum(w * r * r), r

    if n_cg is None:
        n_cg = max(64, K // 4)
    sel7 = jnp.zeros((7, 7), dtype=poses_t.dtype).at[6, 6].set(1.0)
    keep7 = jnp.eye(7, dtype=poses_t.dtype) - sel7

    def _proj(x):
        """Gauge + scale projection applied symmetrically around the normal
        operator (matches the dense path's masking semantics)."""
        x = x * free[:, None]
        if fix_scale:
            x = x @ keep7
        return x

    def _solve_dense(Hii, Hjj, Hij, g, lamD, r_dtype):
        Hflat = jnp.zeros((K * K, 7, 7), dtype=r_dtype)
        Hflat = Hflat.at[ic * K + ic].add(Hii)
        Hflat = Hflat.at[jc * K + jc].add(Hjj)
        Hflat = Hflat.at[ic * K + jc].add(Hij)
        Hflat = Hflat.at[jc * K + ic].add(jnp.swapaxes(Hij, 1, 2))
        H = Hflat.reshape(K, K, 7, 7)
        diag_idx = jnp.arange(K)
        H = H.at[diag_idx, diag_idx].add(lamD)
        mask2 = free[:, None] * free[None, :]
        H = H * mask2[:, :, None, None]
        H = H.at[diag_idx, diag_idx].add(
            (1.0 - free)[:, None, None] * jnp.eye(7, dtype=r_dtype)
        )
        g = g * free[:, None]
        if fix_scale:
            H = jnp.einsum("ab,kqbc,cd->kqad", keep7, H, keep7)
            H = H.at[diag_idx, diag_idx].add(sel7)
            g = g @ keep7
        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        return -jnp.linalg.solve(Hd, g.reshape(7 * K)).reshape(K, 7)

    def _solve_pcg(Hii, Hjj, Hij, g, lamD, r_dtype):
        """Matrix-free block-Jacobi PCG on the same projected system the
        dense path materializes: A = P (H_edges + lamD) P + (I - P)."""
        # block-diagonal of H (K,7,7) for damping and the preconditioner
        D = jnp.zeros((K, 7, 7), dtype=r_dtype)
        D = D.at[ic].add(Hii).at[jc].add(Hjj)
        D = D + lamD

        def matvec(x):
            xp = _proj(x)
            xi = xp[ic]
            xj = xp[jc]
            yi = jnp.einsum("eij,ej->ei", Hii, xi) + jnp.einsum(
                "eij,ej->ei", Hij, xj)
            yj = jnp.einsum("eji,ej->ei", Hij, xi) + jnp.einsum(
                "eij,ej->ei", Hjj, xj)
            y = jnp.zeros((K, 7), dtype=r_dtype)
            y = y.at[ic].add(yi).at[jc].add(yj)
            y = y + jnp.einsum("kij,kj->ki", lamD, xp)
            y = _proj(y)
            # identity on the projected-out subspace keeps A positive
            # definite (fixed nodes / frozen scale coords solve to 0)
            return y + (x - xp)

        # block-Jacobi preconditioner on the projected diagonal
        if fix_scale:
            Dp = jnp.einsum("ab,kbc,cd->kad", keep7, D, keep7) + sel7
        else:
            Dp = D
        Dp = (free[:, None, None] * Dp
              + (1.0 - free)[:, None, None] * jnp.eye(7, dtype=r_dtype))
        Minv = jnp.linalg.inv(Dp + 1e-6 * jnp.eye(7, dtype=r_dtype))

        def apply_M(x):
            return jnp.einsum("kij,kj->ki", Minv, x)

        b = _proj(-g)
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = apply_M(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step(carry, _):
            x, r, z, p, rz = carry
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, 1e-30), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_M(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
            p = z + beta * p
            return (x, r, z, p, rz_new), None

        (dz, _, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, r0, z0, p0, rz0), None, length=n_cg
        )
        return dz

    def step(carry, _):
        R, t, s, lam = carry
        r, Ji, Jj = residuals_and_jacs(R, t, s)
        w = edges.valid.astype(r.dtype) * edges.weight
        # per-edge normal blocks and gradient (K,7)
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj)
        gi = jnp.einsum("eri,e,er->ei", Ji, w, r)
        gj = jnp.einsum("eri,e,er->ei", Jj, w, r)
        g = jnp.zeros((K, 7), dtype=r.dtype)
        g = g.at[ic].add(gi).at[jc].add(gj)

        # LM damping blocks from the Hessian block diagonal
        Dblk = jnp.zeros((K, 7, 7), dtype=r.dtype)
        Dblk = Dblk.at[ic].add(Hii).at[jc].add(Hjj)
        lamD = lam * jax.vmap(jnp.diag)(
            jax.vmap(jnp.diag)(Dblk)
        ) + 1e-8 * jnp.eye(7)

        if solver == "pcg":
            dz = _solve_pcg(Hii, Hjj, Hij, g, lamD, r.dtype)
        else:
            dz = _solve_dense(Hii, Hjj, Hij, g, lamD, r.dtype)
        dz = dz * free[:, None]
        if fix_scale:
            dz = dz.at[:, 6].set(0.0)

        Rd, td, sd = sim3.exp(dz)
        R_new, t_new, s_new = sim3.compose(Rd, td, sd, R, t, s)
        err_old, _ = total_err(R, t, s)
        err_new, _ = total_err(R_new, t_new, s_new)
        accept = err_new < err_old
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-12, 1e8)
        return (R, t, s, lam), err_new

    (R, t, s, _), _ = jax.lax.scan(
        step, (poses_R, poses_t, poses_s, jnp.float32(1e-6)), None, length=n_iters
    )
    return R, t, s


def correct_points_after_pose_graph(
    pt_pos: jax.Array,       # (P, 3)
    pt_ref_kf: jax.Array,    # (P,) reference keyframe per point
    old_R, old_t, old_s,     # (K, ...) pre-optimization keyframe Sim3
    new_R, new_t, new_s,     # (K, ...) post-optimization
):
    """Remap points through their reference keyframe's correction:
    p' = S_new_wr( S_old_rw (p) ) (Optimizer.cc:1030-1042)."""
    kc = jnp.clip(pt_ref_kf, 0)
    Ro, to, so = old_R[kc], old_t[kc], old_s[kc]
    Rn, tn, sn = new_R[kc], new_t[kc], new_s[kc]
    p_cam = sim3.apply(Ro, to, so, pt_pos)
    Rni, tni, sni = sim3.inverse(Rn, tn, sn)
    p_new = sim3.apply(Rni, tni, sni, p_cam)
    ok = pt_ref_kf >= 0
    return jnp.where(ok[:, None], p_new, pt_pos)
