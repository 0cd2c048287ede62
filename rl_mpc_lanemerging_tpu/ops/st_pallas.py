"""Pallas TPU kernel for the ST lattice wavefront DP.

This is the production TPU path for the solver in ``st_dp.py`` (which
remains the portable/golden implementation).  The jnp gather formulation
materializes (max_offset, S) candidate tensors per layer in HBM; profiling
shows it at ~3 ms/solve, 99% of controller time.  This kernel keeps the
whole wavefront in VMEM and realizes the shifted reads ``V[j-d]`` with a
residue-major sweep: Mosaic only allows 8-aligned sublane slices, so the
buffers are rolled ONE row per mod-8 residue (8 rolls per layer) and the
23 offsets within each residue class (d = 8k + r) are read through static
8-aligned slices at start ``d_pad - 8k``.  An explicit lexicographic
tie-break (min cost, then max offset) keeps the result identical to an
ascending-d sweep with <= updates.  Compared to rolling once per offset
(184 rolls x 4 buffers per layer) this cuts VMEM roll traffic ~23x and
roughly doubles end-to-end solver throughput:

* layout: s on sublanes (padded by the offset reach), scenarios on lanes
  (128 per grid step);
* state carried across layers in VMEM scratch via the sequential TPU grid
  (grid = (batch_tiles, T-1), t innermost; scratch persists and @pl.when
  reinitializes at t==0);
* cost evaluation via the weighted-variance identity
  c_a (x-u)^2 + c_j (x-beta)^2 = c_aj (x-m)^2 + K (exact algebra, both
  factors stay in small-difference form -- no f32 cancellation), with the
  carried wavefront value folded into K and m pre-scaled by sqrt(c_aj):
  the whole per-offset candidate cost is ONE subtract + ONE fma + one
  scalar add, down from the two factored quadratics of rounds 1-4;
* the feasibility band is carried as float displacement thresholds
  [xlo, xhi] in two buffers -- for integer d, ``d >= ceil(y)`` iff
  ``d >= y`` and ``d <= floor(y)`` iff ``d <= y``, so the reference's
  integer quantization (st_cy.pyx get_all_range_indices) is preserved
  without the per-offset decode of the round-4 packed-code scheme;
* the obstacle mask and distance penalty are pre-folded into one per-cell
  penalty tensor outside the kernel and streamed per layer with a manual
  single-buffer DMA (it is only consumed after the offset sweep);
* tie-breaking matches the heap/dense solvers: (cost, -d) lexicographic
  argmin = the largest offset / smallest predecessor index among ties;
* per-layer argmin backpointers accumulate directly into the layer's
  output block.

Differences from the float64 oracle semantics (accepted for the TPU path,
covered by differential tests at behavioral tolerance): f32 arithmetic,
offset-relative displacement values (d * delta_s) instead of absolute
grid-value differences, and integer-domain feasibility comparisons on the
relative rather than absolute cell positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .st_dp import STWeights

__all__ = ["make_pallas_solver", "LANE_TILE"]

LANE_TILE = 128         # scenarios per grid step (lanes)
_SB = 64               # destination-row block (sublanes) per sweep step
_BIG = 3e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(v0_ref, a0_ref, pen_hbm, bp_ref, vmin_ref, amin_ref,
            m_buf, k2_buf, u_buf, xlo_buf, xhi_buf, best_buf, usel_buf,
            pen_buf, pen_sem,
            *, s_pad, d_pad, num_s, delta_t, delta_s, w: STWeights):
    i = pl.program_id(0)
    t = pl.program_id(1)
    dt = delta_t
    ds = delta_s
    c_a = w.a_weight / (dt ** 4)
    c_j = w.j_weight / (dt ** 6)
    c_v = w.v_weight / (dt ** 2)
    big_d = w.desired_speed * dt               # displacement of v_desired
    c_tot = c_a + c_j + c_v
    sq_tot = c_tot ** 0.5
    rows = s_pad + d_pad

    # start streaming this layer's penalty row; consumed after the sweep
    pen_dma = pltpu.make_async_copy(
        pen_hbm.at[t + 1, :, pl.ds(i * LANE_TILE, LANE_TILE)],
        pen_buf, pen_sem)
    pen_dma.start()

    def band_and_moments(vcur, u, beta):
        """Per-source quantities consumed by the offset sweep.

        Weighted-variance identity over all three quadratics (exact
        algebra; every factor stays in small-difference form so there is
        no f32 cancellation):
            c_a (x-u)^2 + c_j (x-beta)^2 + c_v (x-D)^2
                = c_tot (x-m)^2 + K,
            m = (c_a u + c_j beta + c_v D) / c_tot,
            K = c_a (u-m)^2 + c_j (beta-m)^2 + c_v (D-m)^2,
        with D = desired_speed * dt.  The sweep then evaluates one
        subtract + one fma against mt = m * sqrt(c_tot) and
        k2 = K + V (the carried wavefront value folded in).  The
        feasibility band (st_cy.pyx:65-93) is carried as *displacement*
        thresholds [xlo, xhi]: for integer d, d >= ceil(y) <=> d >= y
        and d <= floor(y) <=> d <= y, so the ceil/floor quantization of
        get_all_range_indices is preserved by float compares.
        """
        wv = 2.0 * u - beta                     # w = prev displacement
        v = u / dt
        prev_v = wv / dt
        a = (v - prev_v) / dt
        min_a = jnp.maximum(a + w.negative_jerk_limit * dt,
                            w.negative_acceleration_limit)
        max_a = jnp.minimum(a + w.positive_jerk_limit * dt,
                            w.positive_acceleration_limit)
        min_v = jnp.maximum(v + min_a * dt, 0.0)
        max_v = jnp.minimum(v + max_a * dt, w.max_speed)
        xlo = min_v * dt * (1.0 / ds)           # feasible d band (floats)
        xhi = max_v * dt * (1.0 / ds)
        m = (c_a * u + c_j * beta + c_v * big_d) * (1.0 / c_tot)
        k = c_a * (u - m) ** 2 + c_j * (beta - m) ** 2 \
            + c_v * (big_d - m) ** 2
        return m * sq_tot, k + vcur, xlo, xhi

    @pl.when(t == 0)
    def _init():
        v0 = v0_ref[0, :]                       # (128,)
        a0 = a0_ref[0, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE_TILE), 0)
        origin = iota == d_pad                  # row of s index 0
        vcur = jnp.where(origin, 0.0, _BIG)
        u0 = jnp.broadcast_to((v0 * dt)[None, :], (rows, LANE_TILE))
        w0 = dt * (v0 - a0 * dt)                # est_prev - est_second
        b0 = jnp.broadcast_to((2.0 * v0 * dt - w0)[None, :],
                              (rows, LANE_TILE))
        mt, k2, xlo, xhi = band_and_moments(vcur, u0, b0)
        m_buf[:, :] = mt
        k2_buf[:, :] = k2
        u_buf[:, :] = u0
        xlo_buf[:, :] = xlo
        xhi_buf[:, :] = xhi

    # pad rows [0, d_pad) hold rolled garbage from the previous layer's
    # sweep (sources with s < 0); force them infeasible every layer
    xlo_buf[pl.ds(0, d_pad), :] = jnp.ones((d_pad, LANE_TILE), jnp.float32)
    xhi_buf[pl.ds(0, d_pad), :] = jnp.full((d_pad, LANE_TILE), -1.0,
                                           jnp.float32)

    best_buf[:, :] = jnp.full((s_pad, LANE_TILE), _BIG, jnp.float32)
    bp_ref[0, :, :] = jnp.full((s_pad, LANE_TILE), -1, jnp.int32)
    usel_buf[:, :] = jnp.zeros((s_pad, LANE_TILE), jnp.float32)

    # Residue-major sweep: at residue r the buffers have been rolled r rows,
    # so the slice starting at the 8-aligned row base + d_pad - 8k reads the
    # sources of offset d = 8k + r for destination rows [base, base + _SB).
    # Destination rows are processed in _SB-row blocks with a dynamic trip
    # count from the wavefront reachability bound: layer t+1 can only reach
    # s-indices < d_pad * (t + 1) + 1 (at most d_pad - 1 cells of progress
    # per step), which skips ~45% of all blocks across the horizon.
    n_k = d_pad // 8
    n_blocks = s_pad // _SB
    hi_rows = d_pad * (t + 1) + 1
    nb = jnp.minimum((hi_rows + _SB - 1) // _SB, n_blocks)

    def residue(r, _):
        rf = r.astype(jnp.float32)

        def block(bi, _):
            base = bi * _SB
            # Per-residue local winner with `<=` updates: within a
            # residue, d = 8k + r ascends with k, so later-k-wins-ties ==
            # max-d-wins-ties.  The (cost, -d) lexicographic compare then
            # runs ONCE per (residue, block) in the merge below instead
            # of once per offset.
            loc_best = jnp.full((_SB, LANE_TILE), _BIG, jnp.float32)
            loc_d = jnp.full((_SB, LANE_TILE), -1, jnp.int32)
            loc_u = jnp.zeros((_SB, LANE_TILE), jnp.float32)
            for k in range(n_k):
                src = base + d_pad - 8 * k
                mts = m_buf[pl.ds(src, _SB), :]
                k2s = k2_buf[pl.ds(src, _SB), :]
                us = u_buf[pl.ds(src, _SB), :]
                xlos = xlo_buf[pl.ds(src, _SB), :]
                xhis = xhi_buf[pl.ds(src, _SB), :]
                d = 8 * k + r
                df = 8.0 * k + rf                # scalar
                xt = df * (ds * sq_tot)          # scalar, mt domain
                diff = xt - mts
                cand = diff * diff + k2s
                feas = (df >= xlos) & (df <= xhis)
                upd = feas & (cand <= loc_best)
                loc_best = jnp.where(upd, cand, loc_best)
                loc_d = jnp.where(upd, d, loc_d)
                loc_u = jnp.where(upd, us, loc_u)
            prev_best = best_buf[pl.ds(base, _SB), :]
            prev_d = bp_ref[0, pl.ds(base, _SB), :]
            prev_u = usel_buf[pl.ds(base, _SB), :]
            # (cost, -d) lexicographic merge of the residue winner
            upd = (loc_best < prev_best) | ((loc_best == prev_best)
                                            & (loc_d > prev_d))
            best_buf[pl.ds(base, _SB), :] = jnp.where(upd, loc_best,
                                                      prev_best)
            bp_ref[0, pl.ds(base, _SB), :] = jnp.where(upd, loc_d, prev_d)
            usel_buf[pl.ds(base, _SB), :] = jnp.where(upd, loc_u, prev_u)
            return 0

        jax.lax.fori_loop(0, nb, block, 0)
        # next residue's view
        m_buf[:, :] = pltpu.roll(m_buf[:, :], 1, 0)
        k2_buf[:, :] = pltpu.roll(k2_buf[:, :], 1, 0)
        u_buf[:, :] = pltpu.roll(u_buf[:, :], 1, 0)
        xlo_buf[:, :] = pltpu.roll(xlo_buf[:, :], 1, 0)
        xhi_buf[:, :] = pltpu.roll(xhi_buf[:, :], 1, 0)
        return 0

    jax.lax.fori_loop(0, 8, residue, 0)
    # No orientation restore is needed: the epilogue below rewrites the
    # real rows [d_pad, d_pad + s_pad) in physical position, and the pad
    # rows' (rolled garbage) content is never consumed -- they are forced
    # infeasible by the pad-row override at the start of every layer.

    best = best_buf[:, :]
    dbest = bp_ref[0, :, :]
    pen_dma.wait()
    pen = pen_buf[:, :]                          # (s_pad, 128)
    new_v = jnp.where(best < _BIG, best + pen, _BIG)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (s_pad, LANE_TILE), 0)
    new_v = jnp.where(s_iota < num_s, new_v, _BIG)

    # write the new wavefront back at the source offset; u' = d * ds and
    # beta' = 2u' - w' where w' = u of the selected predecessor
    dbf = dbest.astype(jnp.float32)
    u_new = dbf * ds
    b_new = 2.0 * u_new - usel_buf[:, :]
    mt, k2, xlo, xhi = band_and_moments(new_v, u_new, b_new)
    m_buf[pl.ds(d_pad, s_pad), :] = mt
    k2_buf[pl.ds(d_pad, s_pad), :] = k2
    u_buf[pl.ds(d_pad, s_pad), :] = u_new
    xlo_buf[pl.ds(d_pad, s_pad), :] = xlo
    xhi_buf[pl.ds(d_pad, s_pad), :] = xhi

    bp_ref[0, :, :] = s_iota - dbest             # predecessor index
    vmin = jnp.min(new_v, axis=0)
    vmin_ref[0, :, :] = jnp.broadcast_to(vmin[None, :], (8, LANE_TILE))
    is_min = new_v == vmin[None, :]
    big_idx = jnp.where(is_min, s_iota, num_s + 1)
    amin = jnp.min(big_idx, axis=0)
    amin_ref[0, :, :] = jnp.broadcast_to(amin[None, :], (8, LANE_TILE))


def make_pallas_solver(cfg_delta_t: float, cfg_delta_s: float,
                       w: STWeights, max_offset: int, num_t: int,
                       num_s: int, interpret: bool = False):
    """Build a jitted batched solver specialized to static grid geometry.

    Returned fn: (obstacles (B,T,S) bool, s_values (B,S), ego_speed (B,),
    ego_accel (B,), distances (B,T,S)) -> s sequences (B,T), with the same
    output contract as ``st_dp.solve_st_fast`` (zero-filled past the
    furthest reachable layer).  B must be a multiple of LANE_TILE.
    """
    s_pad = _round_up(num_s, _SB)
    d_pad = _round_up(max_offset, 8)
    grid_t = num_t - 1

    kernel = functools.partial(
        _kernel, s_pad=s_pad, d_pad=d_pad, num_s=num_s,
        delta_t=float(cfg_delta_t), delta_s=float(cfg_delta_s), w=w)

    def solve(obstacles, s_values, ego_speed, ego_accel, distances):
        b = obstacles.shape[0]
        assert b % LANE_TILE == 0, \
            f"batch {b} must be a multiple of {LANE_TILE}"
        dist = distances.astype(jnp.float32)
        pen = jnp.where(dist < w.min_allowed_distance,
                        1e6 / jnp.maximum(dist, 1.0), 1.0 / dist)
        pen = w.d_weight * pen
        pen = jnp.where(obstacles, _BIG, pen)
        pen = jnp.pad(pen, ((0, 0), (0, 0), (0, s_pad - num_s)),
                      constant_values=_BIG)
        pen_t = jnp.transpose(pen, (1, 2, 0))        # (T, s_pad, B)

        v0 = jnp.broadcast_to(ego_speed.astype(jnp.float32)[None, :],
                              (8, b))
        a0 = jnp.broadcast_to(ego_accel.astype(jnp.float32)[None, :],
                              (8, b))

        rows = s_pad + d_pad
        out_shapes = (
            jax.ShapeDtypeStruct((num_t, s_pad, b), jnp.int32),   # bp
            jax.ShapeDtypeStruct((num_t, 8, b), jnp.float32),     # vmin
            jax.ShapeDtypeStruct((num_t, 8, b), jnp.int32),       # argmin
        )
        bp, vmin8, amin8 = pl.pallas_call(
            kernel,
            grid=(b // LANE_TILE, grid_t),
            in_specs=[
                pl.BlockSpec((8, LANE_TILE), lambda i, t: (0, i),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec((8, LANE_TILE), lambda i, t: (0, i),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # pen in HBM
            ],
            out_specs=(
                pl.BlockSpec((1, s_pad, LANE_TILE),
                             lambda i, t: (t + 1, 0, i),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec((1, 8, LANE_TILE), lambda i, t: (t + 1, 0, i),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec((1, 8, LANE_TILE), lambda i, t: (t + 1, 0, i),
                             memory_space=pltpu.MemorySpace.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.MemorySpace.VMEM((rows, LANE_TILE), jnp.float32),   # m*sqrt(c_aj)
                pltpu.MemorySpace.VMEM((rows, LANE_TILE), jnp.float32),   # K + V
                pltpu.MemorySpace.VMEM((rows, LANE_TILE), jnp.float32),   # U
                pltpu.MemorySpace.VMEM((rows, LANE_TILE), jnp.float32),   # band lo
                pltpu.MemorySpace.VMEM((rows, LANE_TILE), jnp.float32),   # band hi
                pltpu.MemorySpace.VMEM((s_pad, LANE_TILE), jnp.float32),  # best
                pltpu.MemorySpace.VMEM((s_pad, LANE_TILE), jnp.float32),  # usel
                pltpu.MemorySpace.VMEM((s_pad, LANE_TILE), jnp.float32),  # pen row
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(v0, a0, pen_t)

        vmin = vmin8[:, 0, :]                         # (T, B)
        amin = amin8[:, 0, :]

        # --- backtrace (tiny jnp) ---
        finite = vmin < _BIG
        finite = finite.at[0].set(True)
        t_iota = jnp.arange(num_t)[:, None]
        best_t = jnp.max(jnp.where(finite, t_iota, 0), axis=0)    # (B,)
        amin = amin.at[0].set(0)
        best_s = jnp.take_along_axis(amin, best_t[None, :],
                                     axis=0)[0]                    # (B,)

        def back(idx, t):
            active = t <= best_t
            nxt = jnp.take_along_axis(bp[t], idx[None, :], axis=0)[0]
            s_out = jnp.where(active, idx, -1)
            idx = jnp.where(active, nxt, idx)
            return idx, s_out

        ts = jnp.arange(num_t - 1, 0, -1)
        idx0, s_idx_rev = jax.lax.scan(back, best_s, ts)
        s_idx = jnp.concatenate(
            [idx0[None, :], jnp.flip(s_idx_rev, axis=0)], axis=0)  # (T,B)
        seq = jnp.where(
            s_idx >= 0,
            jnp.take_along_axis(s_values.T, jnp.maximum(s_idx, 0), axis=0),
            0.0)
        return seq.T                                               # (B, T)

    return jax.jit(solve)
