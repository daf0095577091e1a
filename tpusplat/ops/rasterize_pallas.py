"""Pallas TPU rasterization kernel (forward + custom VJP).

The production path for K8 (``render.comp:30-99``) and the backward blend the
reference lacks. Design (TPU-native, no atomics, no scattered writes):

  * Instances are pre-gathered into depth-sorted order XLA-side (one
    coalesced gather) and packed as a [16, C] float32 slab — attributes on
    sublanes (uv.x, uv.y, conic a/b/c, opacity, rgb, pad), instances on
    lanes — so windows DMA as aligned [16, WIN] slices. The reference
    instead chases pointers per pixel (``render.comp:63-66``); on TPU a
    contiguous stream beats random access by an order of magnitude.
  * Grid = one program per 16x16 tile, executed sequentially ("arbitrary"
    dimension semantics). Each program DMAs windows of WIN instances from
    HBM using its [start, end) range (scalar-prefetched, start aligned down
    to the 128-lane tiling with in-range lane masks), and blends chunks of
    CK = 128 instances against all 256 pixels at once: alpha matrix
    [CK, 256] with the chunk on sublanes (one [16,128] -> [128,16]
    transpose per chunk) and pixels on lanes.
  * The sequential per-Gaussian transmittance recurrence becomes an
    inclusive cumulative product along the sublane axis (a 7-step
    Hillis-Steele scan in registers — the same algorithm the reference
    spends ceil(log2 N)+1 HBM dispatches on, ``prefix_sum.comp:32-52``).
    Termination (T < 1e-4, ``render.comp:82-84``) is a contribution mask —
    exact, because T is monotone — plus a whole-tile early exit.
  * Backward recomputes the forward walk (front-to-back) using the saved
    final color/transmittance: dL/dalpha_g needs the suffix color sum
    S_after = c_final - c_incl_g, available from a running inclusive sum.
    Per-instance gradients reduce over pixels and stream back to a [16, C]
    buffer in 128-lane granules. This is race-free without atomics: every
    instance belongs to exactly one tile, the grid runs sequentially, and
    the one granule shared by two adjacent tiles is handed forward through
    a persistent VMEM carry buffer and written once by the later tile — no
    gradient preload from HBM, so writebacks pipeline freely under the
    compute (see _backward_kernel).
    The per-Gaussian reduction then re-sorts the gradient rows by gaussian
    id (where each Gaussian's rows are contiguous) and reduces runs with
    a second matmul-based Pallas kernel (_segment_reduce_kernel) — the
    'segment reduction instead of atomicAdd' strategy, SURVEY.md §7 hard
    part 2, with zero scatters anywhere in the backward path.

Gradient semantics match the XLA path exactly (masks frozen, flow through
alpha/T inside contributions) — verified by tests against autodiff of the
naive golden renderer.
"""

from __future__ import annotations

import collections
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusplat.config import RenderConfig
from tpusplat.ops.binning import BinnedInstances
from tpusplat.ops.preprocess import ProcessedGaussians

WIN = 1024  # instances per DMA window (1024 ~1% faster than 512; DMA waste
# for small tiles is bandwidth-trivial, latency already hidden by prefetch)
CK = 256  # instances per compute chunk (sublane dim after transpose);
# 256 measured 11% faster fwd than 128 (more independent work per scan
# phase for the VPU scheduler) and 18% faster than 512 (tail waste).
GR = 128  # gradient write granule (boundary-handoff unit, == ALIGN)
ATTR_W = 16  # packed attribute rows (9 used + 7 pad)
ALIGN = 128  # lane alignment for DMA offsets
GROUP = 8  # tiles per FORWARD kernel program and the tile-table padding
# unit (amortizes per-program DMA latency; 8 measured ~3% faster fwd)
GROUP_B = 4  # tiles per BACKWARD program (8 loses ~9% there: the gradient
# writeback ping-pong stalls with more tiles in flight per program)
# attribute row layout
A_UVX, A_UVY, A_CA, A_CB, A_CC, A_OP, A_CR, A_CG, A_CB_ = range(9)


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (CPU test mesh, SURVEY.md §5 race row)."""
    return jax.default_backend() != "tpu"


def _scan_sublane(x, op, identity):
    """Inclusive scan along axis 0 (sublanes), two-level.

    Level 1: Hillis-Steele within 8-sublane groups (intra-vreg rotates);
    level 2: scan of the 16 group totals on a [k/8, P] slice; combine by a
    broadcast multiply. Measured ~11x faster than a flat Hillis-Steele at
    [128, 256] — pltpu.roll with shift >= 8 crosses vector registers and is
    far more expensive than the sub-8 rotates (docs/PROFILE.md).
    """
    k, p = x.shape
    if k <= 8 or k % 8:
        rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
        step = 1
        while step < k:
            rolled = pltpu.roll(x, shift=step, axis=0)
            x = op(x, jnp.where(rows >= step, rolled, identity))
            step *= 2
        return x
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    for step in (1, 2, 4):
        rolled = pltpu.roll(x, shift=step, axis=0)
        x = op(x, jnp.where(rows % 8 >= step, rolled, identity))
    ng = k // 8
    g = x.reshape(ng, 8, p)[:, 7, :]  # [k/8, P] group totals
    rows_g = lax.broadcasted_iota(jnp.int32, g.shape, 0)
    step = 1
    while step < ng:
        rolled = pltpu.roll(g, shift=step, axis=0)
        g = op(g, jnp.where(rows_g >= step, rolled, identity))
        step *= 2
    # exclusive group prefix, broadcast back over each group
    ge = jnp.where(rows_g >= 1, pltpu.roll(g, shift=1, axis=0), identity)
    gb = jnp.broadcast_to(ge.reshape(ng, 1, p), (ng, 8, p)).reshape(k, p)
    return op(x, gb)


def _cumprod_sublane(x):
    return _scan_sublane(x, lax.mul, jnp.float32(1.0))


def _cumsum_sublane(x):
    return _scan_sublane(x, lax.add, jnp.float32(0.0))


def _pixel_coords(tile_id, tiles_x, tile_w, tile_h, row0):
    """Pixel-center coordinates for this tile: two [1, P] f32 vectors."""
    npx = tile_w * tile_h
    tx = tile_id % tiles_x
    ty = row0 + tile_id // tiles_x
    p = lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    pxf = (tx * tile_w + p % tile_w).astype(jnp.float32)
    pyf = (ty * tile_h + p // tile_w).astype(jnp.float32)
    return pxf, pyf


def _dot(a, b, precision=lax.Precision.HIGHEST):
    """f32 MXU matmul (contraction on a's last / b's first dim).

    HIGHEST (6-pass bf16 decomposition, f32-exact) is the parity default.
    The blend kernels thread ``RenderConfig.mm_precision`` through: DEFAULT
    (single bf16 pass, ~0.4% relative input rounding) measures 8% faster
    fwd and 13% faster bwd at garden scale — a documented production option
    for training runs where gradient noise swamps it, never for parity."""
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _mm_prec(cfg):
    return (lax.Precision.HIGHEST if cfg.mm_precision == "highest"
            else lax.Precision.DEFAULT)


def _excl_from_incl(cumf):
    """Exclusive scan result from the inclusive one (shift rows down by one,
    first row = identity) — replaces a [CK, P] divide by f."""
    rows = lax.broadcasted_iota(jnp.int32, cumf.shape, 0)
    return jnp.where(rows >= 1, pltpu.roll(cumf, shift=1, axis=0), 1.0)


def _chunk_alpha(slab_t, lo, hi, pxf, pyf, cfg: RenderConfig):
    """Alpha matrix for one CK-chunk given instance-major attrs [CK, ATTR_W].

    ``lo``/``hi``: number of valid leading rows is rows in [lo, hi)
    (global-index bounds already rebased to chunk-local row numbers).
    """
    rows = lax.broadcasted_iota(jnp.int32, (CK, 1), 0)
    valid = (rows >= lo) & (rows < hi)

    uvx = slab_t[:, A_UVX:A_UVX + 1]
    uvy = slab_t[:, A_UVY:A_UVY + 1]
    ca = slab_t[:, A_CA:A_CA + 1]
    cb = slab_t[:, A_CB:A_CB + 1]
    cc = slab_t[:, A_CC:A_CC + 1]
    # Folding the row-validity mask into opacity (cheap [CK, 1] select)
    # kills the [CK, P] `& valid` pass: masked rows get alpha == 0, which
    # fails the alpha_min test on its own. Slab lanes always hold finite
    # real table rows (clamped gather + zero padding), so the dead rows'
    # power/epow stay finite.
    op = jnp.where(valid, slab_t[:, A_OP:A_OP + 1], 0.0)

    dx = uvx - pxf  # [CK, P]
    dy = uvy - pyf
    # Quadratic with pre-scaled [CK, 1] coefficients: one fewer [CK, P] pass
    # than -0.5 * (ca*dx*dx + cc*dy*dy) - cb*dx*dy.
    a2 = -0.5 * ca
    c2 = -0.5 * cc
    power = a2 * (dx * dx) + c2 * (dy * dy) - cb * (dx * dy)
    epow = jnp.exp(power)
    alpha_raw = op * epow
    alpha = jnp.minimum(jnp.float32(cfg.alpha_max), alpha_raw)
    ok = (power <= 0.0) & (alpha >= cfg.alpha_min)
    f = jnp.where(ok, 1.0 - alpha, 1.0)
    return dict(
        alpha=alpha, alpha_raw=alpha_raw, epow=epow, ok=ok, f=f,
        uvx=uvx, uvy=uvy, ca=ca, cb=cb, cc=cc, op=op, power=power, valid=valid,
    )


def _blend_chunk(buf_ref, base, lo, hi, pxf, pyf, cfg, inner):
    """One CK-chunk of the forward blend. inner = (T [1,P], c3 [3,P])."""
    t_acc, c3 = inner
    slab_t = jnp.transpose(buf_ref[:, pl.ds(base, CK)], (1, 0))  # [CK, ATTR_W]
    ch = _chunk_alpha(slab_t, lo, hi, pxf, pyf, cfg)
    cumf = _cumprod_sublane(ch["f"])
    t_incl = t_acc * cumf  # [CK, P]
    t_excl = t_acc * _excl_from_incl(cumf)
    contrib = ch["ok"] & (t_incl >= cfg.t_min)
    wgt = jnp.where(contrib, ch["alpha"] * t_excl, 0.0)
    # Color accumulation as one MXU matmul: col3 [3, CK] @ wgt [CK, P].
    col3 = buf_ref[A_CR:A_CB_ + 1, pl.ds(base, CK)]
    c3 = c3 + _dot(col3, wgt, _mm_prec(cfg))
    return t_incl[CK - 1:CK, :], c3


def _forward_kernel(
    starts_ref, ends_ref, row0_ref, attr_hbm, out_ref, head_buf, roll_buf,
    head_sem, roll_sem,
    *, tiles_x, tile_w, tile_h, cfg: RenderConfig,
):
    """GROUP tiles per program. DMA pipeline: the first window of every tile
    in the group is issued up front (cross-tile overlap, the common
    single-window case); within a tile, subsequent windows double-buffer
    through two rolling slots (the dense-tile case)."""
    base_t = pl.program_id(0) * GROUP
    npx = tile_w * tile_h

    def tile_info(j):
        t = base_t + j
        start = starts_ref[t]
        end = ends_ref[t]
        a_start = (start // ALIGN) * ALIGN
        return t, start, end, a_start

    # Issue every tile's first window.
    for j in range(GROUP):
        _, _, _, a = tile_info(j)
        pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(a, WIN)], head_buf.at[j], head_sem.at[j]
        ).start()

    for j in range(GROUP):
        t, start, end, a_start = tile_info(j)
        pxf, pyf = _pixel_coords(t, tiles_x, tile_w, tile_h, row0_ref[0])
        nwin = pl.cdiv(end - a_start, WIN)

        def chunks_of(buf_ref, off, carry):
            # No chunk-level early exit: the per-chunk T reduction + while
            # loop cost more than they save (measured +2.7 ms at garden);
            # the window-level exit below already captures saturation.
            def chunk(k, inner):
                base = pl.multiple_of(k * CK, CK)
                lo = start - (off + base)
                hi = end - (off + base)
                return _blend_chunk(buf_ref, base, lo, hi, pxf, pyf, cfg, inner)

            nck = jnp.clip(pl.cdiv(end - off, CK), 0, WIN // CK)
            return lax.fori_loop(0, nck, chunk, carry)

        carry = (
            jnp.ones((1, npx), jnp.float32),
            jnp.zeros((3, npx), jnp.float32),
        )

        # Window 0 (always issued; empty tiles still drain the semaphore).
        pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(a_start, WIN)], head_buf.at[j], head_sem.at[j]
        ).wait()

        @pl.when(nwin >= 2)
        def _():
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(a_start + WIN, WIN)], roll_buf.at[0],
                roll_sem.at[0],
            ).start()

        carry = chunks_of(head_buf.at[j], a_start, carry)

        # Windows 1..nwin-1, double-buffered, with whole-tile early exit.
        def wcond(state):
            w, inner = state
            return (w < nwin) & (jnp.max(inner[0]) >= cfg.t_min)

        def wbody(state):
            w, inner = state
            slot = (w - 1) % 2
            off = a_start + w * WIN
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(off, WIN)], roll_buf.at[slot],
                roll_sem.at[slot],
            ).wait()

            @pl.when(w + 1 < nwin)
            def _():
                pltpu.make_async_copy(
                    attr_hbm.at[:, pl.ds(off + WIN, WIN)], roll_buf.at[w % 2],
                    roll_sem.at[w % 2],
                ).start()

            inner = chunks_of(roll_buf.at[slot], off, inner)
            return w + 1, inner

        w_fin, carry = lax.while_loop(wcond, wbody, (jnp.int32(1), carry))

        # Early exit leaves one issued-but-unwaited window; drain it so the
        # rolling semaphores are clean for the next tile (scratch persists
        # across tiles and grid steps).
        @pl.when((w_fin < nwin) & (nwin >= 2))
        def _():
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(a_start + w_fin * WIN, WIN)],
                roll_buf.at[(w_fin - 1) % 2],
                roll_sem.at[(w_fin - 1) % 2],
            ).wait()

        t_acc, c3 = carry
        out_ref[j, 0:3, :] = c3
        out_ref[j, 3:4, :] = t_acc
        out_ref[j, 4:8, :] = jnp.zeros((4, npx), jnp.float32)


def _backward_kernel(
    starts_ref, ends_ref, row0_ref, attr_hbm, cot_ref, fin_ref,
    dattr_hbm, head_buf, roll_buf, gout_buf, carry_buf,
    head_sem, roll_sem, gsem,
    *, tiles_x, tile_w, tile_h, cfg: RenderConfig, num_tiles: int,
):
    """Pipelined backward blend: GROUP tiles per program, double-buffered
    attribute loads, and gradient writeback in 128-lane granules.

    Gradient-write ownership (the TPU answer to the reference's free
    per-pixel scatter, ``render.comp:61-89``): tile ranges are contiguous
    (end[t] == start[t+1]) but not lane-aligned, and DMA stores move whole
    128-lane granules — so the boundary granule shared by two tiles is
    written by the LATER tile only. The earlier tile leaves its partial
    granule (its lanes filled, the rest zero) in ``carry_buf``, which
    persists across tiles and grid programs (the grid is sequential), and
    the next tile vector-adds it into its first granule before writing.
    Every granule is therefore written exactly once, all in-flight stores
    are disjoint, and no gradient preload/merge from HBM is needed at all
    — the previous design's 3rd slab DMA and its per-window serialization
    are gone.

    Writeback pipelining: gradient windows stage through two ping-pong
    buffers keyed by a program-global window counter ``wg``; granule
    stores from window ``wg`` stay in flight while windows ``wg+1`` is
    computed, and the slot is reclaimed (semaphore wait) before window
    ``wg+2`` reuses it.
    """
    pid = pl.program_id(0)
    base_t = pid * GROUP_B
    npx = tile_w * tile_h
    nper = WIN // GR  # write granules per window

    @pl.when(pid == 0)
    def _():
        carry_buf[:, :] = jnp.zeros((ATTR_W, GR), jnp.float32)

    # Issue every tile's first attribute window up front (cross-tile overlap).
    for j in range(GROUP_B):
        start_j = starts_ref[base_t + j]
        a0 = (start_j // ALIGN) * ALIGN
        pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(a0, WIN)], head_buf.at[j], head_sem.at[j]
        ).start()

    def wb_wait(slot, off, n):
        """Reclaim the granule stores of the window that used ``slot``."""
        for i in range(nper):
            @pl.when(i < n)
            def _():
                pltpu.make_async_copy(
                    gout_buf.at[slot, :, pl.ds(i * GR, GR)],
                    dattr_hbm.at[:, pl.ds(pl.multiple_of(off + i * GR, ALIGN), GR)],
                    gsem.at[slot, i],
                ).wait()

    # (wg, o1, n1, o2, n2): window counter + offset/issued-granule count of
    # the previous two windows, threaded across tiles within the program.
    wb0 = (jnp.int32(0),) * 5

    for j in range(GROUP_B):
        t = base_t + j
        start = starts_ref[t]
        end = ends_ref[t]
        a_start = (start // ALIGN) * ALIGN
        pxf, pyf = _pixel_coords(t, tiles_x, tile_w, tile_h, row0_ref[0])

        dc3 = cot_ref[j, 0:3, :]  # [3, P] color cotangents
        dt_fin = cot_ref[j, 3:4, :]
        fin_t = fin_ref[j, 3:4, :]
        # D = sum_c dc_c * fin_c, per pixel (see dalpha identity below).
        d_fin = jnp.sum(dc3 * fin_ref[j, 0:3, :], axis=0, keepdims=True)
        dtf = -dt_fin * fin_t  # [1, P], hoisted out of the chunk loop

        # dT != 0 disables the compute skip (those terms touch every passing
        # Gaussian, not only pre-termination ones).
        dt_active = jnp.max(jnp.abs(dt_fin)) > 0.0

        # Tile-local pixel bases for the moment matmuls (local coordinates
        # keep the expansion of sum(dpower * dx^2) etc. cancellation-free).
        ox = pxf[0, 0]
        oy = pyf[0, 0]
        pxl = pxf - ox  # [1, P]
        pyl = pyf - oy
        ones_p = jnp.ones((1, npx), jnp.float32)
        basis = jnp.transpose(
            jnp.concatenate(
                [ones_p, pxl, pxl * pxl, pyl, pyl * pyl, pxl * pyl], axis=0
            ),
            (1, 0),
        )  # [P, 6]
        dc3_t = jnp.transpose(dc3, (1, 0))  # [P, 3]

        nwin = pl.cdiv(end - a_start, WIN)

        def window_body(w, buf_ref, off, t_acc, sdot, wb):
            wg, o1, n1, o2, n2 = wb
            s = lax.rem(wg, 2)
            # Reclaim the gout slot this window will stage through.
            wb_wait(s, o2, n2)

            active = (jnp.max(t_acc) >= cfg.t_min) | dt_active
            nck = jnp.clip(pl.cdiv(end - off, CK), 0, WIN // CK)

            def chunk(k, inner):
                t_acc_i, sdot_i = inner
                base = pl.multiple_of(k * CK, CK)
                slab_t = jnp.transpose(buf_ref[:, pl.ds(base, CK)], (1, 0))
                lo = start - (off + base)
                hi = end - (off + base)
                ch = _chunk_alpha(slab_t, lo, hi, pxf, pyf, cfg)
                alpha, f, ok = ch["alpha"], ch["f"], ch["ok"]
                cumf = _cumprod_sublane(f)
                t_incl = t_acc_i * cumf
                t_excl = t_acc_i * _excl_from_incl(cumf)
                contrib = ok & (t_incl >= cfg.t_min)
                wgt = jnp.where(contrib, alpha * t_excl, 0.0)

                # dL/dalpha. Identity: sum_c dc_c * (col_c * t_excl -
                # S_after_c/f) with S_after_c = fin_c - incl_c collapses to
                # ONE fused running sum because sum_c dc_c * incl_c =
                # cumsum(wgt * dccol). dccol is one small MXU matmul instead
                # of five [CK, P] VPU passes.
                dccol = _dot(slab_t[:, A_CR:A_CB_ + 1], dc3, _mm_prec(cfg))  # [CK, P]
                incl_dot = sdot_i + _cumsum_sublane(wgt * dccol)
                rf = 1.0 / f
                dalpha = jnp.where(
                    contrib, dccol * t_excl - (d_fin - incl_dot) * rf, 0.0
                )
                # + transmittance cotangent (all passing rows; dtf hoisted)
                dalpha = dalpha + jnp.where(ok, dtf * rf, 0.0)

                # through alpha = min(0.99, opacity * exp(power))
                gate = ch["alpha_raw"] < cfg.alpha_max
                da_raw = jnp.where(gate, dalpha, 0.0)
                dpower = da_raw * ch["alpha_raw"]

                # Pixel reductions as MXU matmuls. dx = u'x - pxl with
                # u'x = uvx - ox (tile-local), so every quadratic-form
                # reduction is a linear combination of the moments of dpower
                # against the local pixel basis {1, x, x^2, y, y^2, xy}.
                m = _dot(dpower, basis, _mm_prec(cfg))  # [CK, 6]
                m1, mx, mx2 = m[:, 0:1], m[:, 1:2], m[:, 2:3]
                my, my2, mxy = m[:, 3:4], m[:, 4:5], m[:, 5:6]
                ux = ch["uvx"] - ox  # [CK, 1]
                uy = ch["uvy"] - oy
                g_ca = -0.5 * (ux * ux * m1 - 2.0 * ux * mx + mx2)
                g_cb = -(ux * uy * m1 - ux * my - uy * mx + mxy)
                g_cc = -0.5 * (uy * uy * m1 - 2.0 * uy * my + my2)
                sx = ux * m1 - mx  # sum(dpower * dx)
                sy = uy * m1 - my
                g_uvx = -(ch["ca"] * sx + ch["cb"] * sy)
                g_uvy = -(ch["cc"] * sy + ch["cb"] * sx)
                # d/d(opacity): sum_p da_raw * epow = sum_p dpower / opacity
                # = m1/op (dpower = da_raw * epow * op) — the moments matmul
                # already computed the sum; no extra [CK, P] pass needed.
                g_op = m1 / jnp.maximum(ch["op"], 1e-30)
                g_col = _dot(wgt, dc3_t, _mm_prec(cfg))  # [CK, 3]

                zeros7 = jnp.zeros((CK, ATTR_W - 9), jnp.float32)
                g = jnp.concatenate(
                    [g_uvx, g_uvy, g_ca, g_cb, g_cc, g_op, g_col, zeros7],
                    axis=1,
                )  # [CK, ATTR_W]; masked rows (outside [lo, hi)) are zero.
                gout_buf[s, :, pl.ds(base, CK)] = jnp.transpose(g, (1, 0))
                return t_incl[CK - 1:CK, :], incl_dot[CK - 1:CK, :]

            def compute(inner):
                return lax.fori_loop(0, nck, chunk, inner)

            def skip(inner):
                gout_buf[s] = jnp.zeros((ATTR_W, WIN), jnp.float32)
                return inner

            t_acc2, sdot2 = lax.cond(active, compute, skip, (t_acc, sdot))

            # Granule postprocessing: merge the carried boundary granule
            # into this tile's first GR-granule, hold the final partial
            # granule for the next tile, write everything else. Granules
            # (GR = 128, the lane-alignment/handoff unit) are decoupled
            # from compute chunks (CK = 256).
            n_gr = jnp.clip(pl.cdiv(end - off, GR), 0, nper)
            n_issued = jnp.int32(0)
            for k in range(nper):
                in_range = k < n_gr
                g_end = off + (k + 1) * GR
                held = in_range & (g_end > end)

                @pl.when(in_range & (w == 0) & (k == 0) & (start != a_start))
                def _():
                    gout_buf[s, :, pl.ds(0, GR)] = (
                        gout_buf[s, :, pl.ds(0, GR)] + carry_buf[:, :]
                    )

                @pl.when(held)
                def _():
                    carry_buf[:, :] = gout_buf[s, :, pl.ds(k * GR, GR)]

                @pl.when(in_range & ~held)
                def _():
                    pltpu.make_async_copy(
                        gout_buf.at[s, :, pl.ds(k * GR, GR)],
                        dattr_hbm.at[:, pl.ds(pl.multiple_of(off + k * GR, ALIGN), GR)],
                        gsem.at[s, k],
                    ).start()
                n_issued = n_issued + jnp.where(in_range & ~held, 1, 0)

            return t_acc2, sdot2, (wg + 1, off, n_issued, o1, n1)

        # ---- window 0 from the prefetched head buffer ----
        pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(a_start, WIN)], head_buf.at[j], head_sem.at[j]
        ).wait()

        @pl.when(nwin >= 2)
        def _():
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(a_start + WIN, WIN)], roll_buf.at[0],
                roll_sem.at[0],
            ).start()

        t_acc = jnp.ones((1, npx), jnp.float32)
        sdot = jnp.zeros((1, npx), jnp.float32)

        def head_case(args):
            t_acc, sdot, wb = args
            return window_body(jnp.int32(0), head_buf.at[j], a_start,
                               t_acc, sdot, wb)

        def head_skip(args):
            return args[0], args[1], args[2]

        t_acc, sdot, wb0 = lax.cond(
            nwin >= 1, head_case, head_skip, (t_acc, sdot, wb0)
        )

        # ---- windows 1..nwin-1, double-buffered attr loads ----
        def wbody(state):
            w, t_acc, sdot, wb = state
            slot = (w - 1) % 2
            off = a_start + w * WIN
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(off, WIN)], roll_buf.at[slot],
                roll_sem.at[slot],
            ).wait()

            @pl.when(w + 1 < nwin)
            def _():
                pltpu.make_async_copy(
                    attr_hbm.at[:, pl.ds(off + WIN, WIN)], roll_buf.at[w % 2],
                    roll_sem.at[w % 2],
                ).start()

            t_acc, sdot, wb = window_body(w, roll_buf.at[slot], off,
                                          t_acc, sdot, wb)
            return w + 1, t_acc, sdot, wb

        def wcond(state):
            return state[0] < nwin

        _, _, _, wb0 = lax.while_loop(
            wcond, wbody, (jnp.int32(1), t_acc, sdot, wb0)
        )

    # ---- program epilogue: drain in-flight granule stores ----
    wg_f, o1, n1, o2, n2 = wb0
    wb_wait(lax.rem(wg_f, 2), o2, n2)  # window wg-2 used slot wg%2
    wb_wait(lax.rem(wg_f + 1, 2), o1, n1)  # window wg-1 used slot (wg-1)%2

    # ---- grid epilogue: flush the final held boundary granule ----
    # Guarded: when ends[num_tiles-1] is ALIGN-aligned no granule was held
    # (the last window wrote everything), and an unconditional flush would
    # store a stale carry over an already-written granule.
    @pl.when(pid == pl.num_programs(0) - 1)
    def _():
        end_last = ends_ref[num_tiles - 1]

        @pl.when(end_last % ALIGN != 0)
        def _():
            a_flush = pl.multiple_of((end_last // ALIGN) * ALIGN, ALIGN)
            cp = pltpu.make_async_copy(
                carry_buf, dattr_hbm.at[:, pl.ds(a_flush, GR)], gsem.at[0, 0]
            )
            cp.start()
            cp.wait()


def _run_forward(attr, starts, ends, row0, *, tiles_x, num_tiles, tile_w, tile_h, cfg):
    npx = tile_w * tile_h
    kernel = functools.partial(
        _forward_kernel,
        tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h, cfg=cfg,
    )
    t_pad = -(-num_tiles // GROUP) * GROUP  # starts/ends are pre-padded
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (GROUP, 8, npx), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((GROUP, ATTR_W, WIN), jnp.float32),
            pltpu.VMEM((2, ATTR_W, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((GROUP,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, 8, npx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(starts, ends, row0, attr)


def _run_backward(attr, starts, ends, row0, cot, fin, *, tiles_x, num_tiles,
                  tile_w, tile_h, cfg):
    npx = tile_w * tile_h
    kernel = functools.partial(
        _backward_kernel,
        tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h, cfg=cfg,
        num_tiles=num_tiles,
    )
    t_pad = -(-num_tiles // GROUP) * GROUP  # padding unit stays GROUP (lcm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // GROUP_B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (GROUP_B, 8, npx), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (GROUP_B, 8, npx), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((GROUP_B, ATTR_W, WIN), jnp.float32),  # head attr windows
            pltpu.VMEM((2, ATTR_W, WIN), jnp.float32),  # rolling attr windows
            pltpu.VMEM((2, ATTR_W, WIN), jnp.float32),  # grad staging ping-pong
            pltpu.VMEM((ATTR_W, GR), jnp.float32),  # boundary-granule carry
            pltpu.SemaphoreType.DMA((GROUP_B,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, WIN // GR)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attr.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=_interpret(),
    )(starts, ends, row0, attr, cot, fin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _raster_core(attr, starts, ends, row0, static: Any):
    return _run_forward(attr, starts, ends, row0, **static._asdict())


def _raster_core_fwd(attr, starts, ends, row0, static):
    out = _run_forward(attr, starts, ends, row0, **static._asdict())
    return out, (attr, starts, ends, row0, out)


def _raster_core_bwd(static, res, cot):
    attr, starts, ends, row0, out = res
    dattr = _run_backward(attr, starts, ends, row0, cot, out, **static._asdict())
    # Lanes never covered by a tile range (slots past the last valid
    # instance, plus WIN padding) hold stale memory, but their gauss_id is
    # the sentinel N, so the gid-keyed segment reduction never reads them —
    # no masking pass needed.
    return dattr, None, None, None


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


_RasterStatic = collections.namedtuple(
    "_RasterStatic", ["tiles_x", "num_tiles", "tile_w", "tile_h", "cfg"]
)


GB = 256  # gaussian ids per segment-reduce segment
GROWS = 9  # live gradient rows (uvx, uvy, ca, cb, cc, op, r, g, b)
GPAD = 16  # slab rows: GROWS padded to the f32 (8, 128) sublane tiling
SEGG = 8  # segments per segment-reduce program (head-prefetch group)


def _seg_win(rows: int, n_pad: int) -> int:
    """Segment-reduce DMA window, adaptive to occupancy.

    The reduce streams >= 1 window per GB-id segment, so at low occupancy
    (strip mode: ~100 rows/segment) the cost is window-alignment waste and
    a small window wins, while at high occupancy (full frame: ~770
    rows/segment) fewer, larger DMAs win. v5e measurements at garden scale
    (docs/MICRO_r05.md): strip 6.9 ms @1024 -> 2.8 @256; full frame 8.4
    @1024 vs 10.2 @256. Rule: ~1.5x expected occupancy, clamped to a
    128-multiple in [128, 1024].
    """
    occ = max(1, rows * GB // max(n_pad, 1))
    return min(1024, max(128, -(-3 * occ // 256) * 128))


def _segment_reduce_kernel(lo_ref, hi_ref, *refs, n_real, win, rps,
                           stream_targets):
    """Sum id-keyed gradient rows per target id — without a single scatter.

    Each program owns SEGG output segments of GB target ids. A segment's
    rows live in ``rps`` contiguous ranges of the row slab (``rps`` = 1 for
    the gid-sorted dense/compact reduce; ``rps`` = S for the owner-side
    reduce of S independently-sorted all_to_all blocks). Each ``win``-row
    window of a range is reduced onto the segment's [GPAD, GB] accumulator
    by one MXU matmul against a 0/1 selection matrix built from the
    per-row ids — the TPU answer to CUDA's atomicAdd gradient accumulation
    (SURVEY.md §7 hard part 2).

    Targets are either the dense iota ``s*GB + i`` (``stream_targets``
    False — the per-Gaussian reduce of the single-chip VJP) or an
    arbitrary non-decreasing-per-range id list streamed as an input
    (``stream_targets`` True — the owner-blocked compact target list of
    the all-to-all gradient exchange, parallel/compact_grad.py). Rows
    whose id matches no target contribute nothing (zero selection column);
    rows with out-of-[0, n_real) ids — capacity-padding sentinels whose
    values are stale memory the backward kernel never wrote — are zeroed
    with a select (0 * NaN would poison the matmul sum).

    DMA pipeline: every range's first window is issued up front
    (cross-range latency overlap), and multi-window ranges double-buffer
    through two rolling slots — the same scheme as the forward blend
    kernel.
    """
    if stream_targets:
        (targets_ref, grad_hbm, gid_hbm, out_ref, head_g, head_i,
         roll_g, roll_i, hgsem, hisem, rgsem, risem) = refs
    else:
        (grad_hbm, gid_hbm, out_ref, head_g, head_i,
         roll_g, roll_i, hgsem, hisem, rgsem, risem) = refs
    p = pl.program_id(0)
    nranges = SEGG * rps

    def rinfo(j):
        r = p * nranges + j
        lo = lo_ref[r]
        hi = hi_ref[r]
        a_lo = (lo // ALIGN) * ALIGN
        return hi, a_lo

    def issue(g_dst, i_dst, g_sem, i_sem, off):
        pltpu.make_async_copy(
            grad_hbm.at[:, pl.ds(off, win)], g_dst, g_sem).start()
        pltpu.make_async_copy(
            gid_hbm.at[:, pl.ds(off, win)], i_dst, i_sem).start()

    def wait(g_dst, i_dst, g_sem, i_sem, off):
        pltpu.make_async_copy(
            grad_hbm.at[:, pl.ds(off, win)], g_dst, g_sem).wait()
        pltpu.make_async_copy(
            gid_hbm.at[:, pl.ds(off, win)], i_dst, i_sem).wait()

    # Issue every range's first window (cross-range latency overlap).
    for j in range(nranges):
        _, a = rinfo(j)
        issue(head_g.at[j], head_i.at[j], hgsem.at[j], hisem.at[j], a)

    for sj in range(SEGG):
        s = p * SEGG + sj
        if stream_targets:
            targets_col = jnp.transpose(
                targets_ref[0:1, pl.ds(sj * GB, GB)], (1, 0))  # [GB, 1] i32
        else:
            targets_col = s * GB + lax.broadcasted_iota(
                jnp.int32, (GB, 1), 0)

        def reduce_window(gb, ib, acc):
            # Selection matrix built TRANSPOSED ([GB, win] from the free
            # [GB, 1] target column against the raw [1, win] id row — no
            # per-window relayout) and contracted dim-1 x dim-1, the same
            # orientation trick as the emission kernel's step matrix.
            sel_t = (targets_col == ib[0:1, :]).astype(jnp.float32)
            in_range = (ib[0:1, :] >= 0) & (ib[0:1, :] < n_real)
            gm = jnp.where(in_range, gb[:, :], 0.0)
            return acc + lax.dot_general(
                gm, sel_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )  # [GPAD, GB]

        acc = jnp.zeros((GPAD, GB), jnp.float32)
        for b in range(rps):
            j = sj * rps + b
            hi, a_lo = rinfo(j)
            nwin = pl.cdiv(hi - a_lo, win)

            # Window 0 from the prefetched head slot (issued for every
            # range; empty ranges reduce a garbage window whose rows are
            # all masked by in_range / zero selection).
            wait(head_g.at[j], head_i.at[j], hgsem.at[j], hisem.at[j], a_lo)

            @pl.when(nwin >= 2)
            def _():
                issue(roll_g.at[0], roll_i.at[0], rgsem.at[0], risem.at[0],
                      a_lo + win)

            acc = reduce_window(head_g[j], head_i[j], acc)

            def wbody(state):
                w, acc = state
                slot = lax.rem(w - 1, 2)
                off = a_lo + w * win
                wait(roll_g.at[slot], roll_i.at[slot],
                     rgsem.at[slot], risem.at[slot], off)

                @pl.when(w + 1 < nwin)
                def _():
                    nxt = lax.rem(w, 2)
                    issue(roll_g.at[nxt], roll_i.at[nxt],
                          rgsem.at[nxt], risem.at[nxt], off + win)

                return w + 1, reduce_window(roll_g[slot], roll_i[slot], acc)

            _, acc = lax.while_loop(
                lambda st: st[0] < nwin, wbody, (jnp.int32(1), acc)
            )
        out_ref[:, sj * GB:(sj + 1) * GB] = acc


def _run_segment_reduce_general(grad, gid, lo, hi, n_pad, n_real, win,
                                rps=1, targets=None):
    """Generalized matmul segment reduce (see _segment_reduce_kernel).

    grad [GPAD, R + win] (id-keyed rows, 9 live + pad), gid [1, R + win]
    int32, lo/hi [(n_pad//GB) * rps] int32 absolute row ranges (rps ranges
    per GB-target output segment), targets [1, n_pad] int32 or None (dense
    iota) -> per-target sums [GPAD, n_pad] (n_pad a multiple of GB*SEGG).
    Sublane dims are GPAD (not GROWS): DMA slices must respect the f32
    (8, 128) tiling on real hardware.

    ``win`` (a 128-multiple): rows streamed per DMA window — callers pick
    it with :func:`_seg_win` (occupancy-adaptive; measured on v5e, garden
    strip scale: 6.9 ms at 1024 -> 2.8 at 256, docs/MICRO_r05.md)."""
    nranges = SEGG * rps
    stream_targets = targets is not None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [lo, hi]
    if stream_targets:
        in_specs.insert(0, pl.BlockSpec(
            (1, GB * SEGG), lambda i, *_: (0, i), memory_space=pltpu.VMEM))
        args.append(targets)
    args += [grad, gid]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // (GB * SEGG),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (GPAD, GB * SEGG), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nranges, GPAD, win), jnp.float32),
            pltpu.VMEM((nranges, 1, win), jnp.int32),
            pltpu.VMEM((2, GPAD, win), jnp.float32),
            pltpu.VMEM((2, 1, win), jnp.int32),
            pltpu.SemaphoreType.DMA((nranges,)),
            pltpu.SemaphoreType.DMA((nranges,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_segment_reduce_kernel, n_real=n_real, win=win,
                          rps=rps, stream_targets=stream_targets),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GPAD, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(*args)


def _run_segment_reduce(grad, gid, bounds, n_pad, n_real, win=WIN):
    """Dense per-Gaussian reduce over gid-sorted rows: segment s owns ids
    [s*GB, (s+1)*GB) whose rows are one contiguous range (bounds =
    searchsorted of the sorted ids at GB multiples)."""
    return _run_segment_reduce_general(
        grad, gid, bounds[:-1], bounds[1:], n_pad, n_real, win)


def _assemble_strip(out, num_tiles, nrows, tiles_x, tw, th, crop_h, width):
    """Kernel output [t_pad, 8, npx] -> (img [crop_h, width, 3],
    tmap [crop_h, width])."""
    out = out[:num_tiles]
    rgb = out[:, 0:3, :]
    img = rgb.reshape(nrows, tiles_x, 3, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(nrows * th, tiles_x * tw, 3)
    img = img[:crop_h, :width]
    tmap = out[:, 3, :].reshape(nrows, tiles_x, th, tw)
    tmap = tmap.transpose(0, 2, 1, 3).reshape(nrows * th, tiles_x * tw)
    tmap = tmap[:crop_h, :width]
    return img, tmap


def _disassemble_strip_cot(d_img, t_pad, num_tiles, nrows, tiles_x, tw, th):
    """Transpose of _assemble_strip's image path for a full-strip cotangent
    d_img [nrows*th, width, 3] -> [t_pad, 8, npx] (tmap cotangent zero)."""
    w_pad = tiles_x * tw
    d = jnp.pad(d_img, ((0, 0), (0, w_pad - d_img.shape[1]), (0, 0)))
    # inverse of transpose(0, 3, 1, 4, 2): [nrows, th, tiles_x, tw, 3] ->
    # [nrows, tiles_x, 3, th, tw]
    d = d.reshape(nrows, th, tiles_x, tw, 3).transpose(0, 2, 4, 1, 3)
    d = d.reshape(num_tiles, 3, th * tw)
    cot = jnp.zeros((t_pad, 8, th * tw), jnp.float32)
    return cot.at[:num_tiles, 0:3, :].set(d)


def _sort_grad_rows(d_attr, gauss_id):
    """Re-sort the 9 live gradient rows of d_attr keyed by gaussian id —
    measured ~3x cheaper than permuting [C, 16] rows through a gather
    (docs/PROFILE.md micro table). Returns (gid_sorted [C], grad [GROWS, C])."""
    c = gauss_id.shape[0]
    cols = tuple(d_attr[k, :c] for k in range(GROWS))
    sorted_ = lax.sort((gauss_id,) + cols, num_keys=1, is_stable=False)
    return sorted_[0], jnp.stack(sorted_[1:])


@jax.custom_vjp
def _pack_gather(table, gauss_id):
    """attr slab [ATTR_W, C + WIN] from the per-Gaussian table [N, 16]."""
    n = table.shape[0]
    safe = jnp.minimum(gauss_id, n - 1)
    # One contiguous row-gather of the pre-packed table: an order of
    # magnitude faster on TPU than 9 separate 1-D gathers.
    attr = table[safe]  # [C, 16]
    return jnp.pad(attr.T, ((0, 0), (0, WIN)))


def _pack_gather_fwd(table, gauss_id):
    return _pack_gather(table, gauss_id), (table.shape[0], gauss_id)


def _pack_gather_bwd(res, d_attr):
    """The transpose of the gather is a segment reduction, NOT a scatter-add
    (XLA's non-unique scatter serializes on TPU, ~450 ms at garden scale):
      1. re-sort the 9 live gradient rows keyed by gaussian id — measured
         ~3x cheaper than permuting [C, 16] rows through a gather
         (docs/PROFILE.md micro table);
      2. contiguous-run reduce per Gaussian (Pallas, matmul-based), output
         directly in id order — no inverse permutation needed.
    Summation order within a Gaussian follows the sort network rather than
    instance order; the sum is exact per addend and differs only by fp
    reassociation.
    """
    from tpusplat.ops.binning import _SUB, searchsorted_left, searchsorted_left_big

    n, gauss_id = res
    c = gauss_id.shape[0]

    gid_s, grad = _sort_grad_rows(d_attr, gauss_id)  # [C], [GROWS, C]

    n_pad = -(-n // (GB * SEGG)) * (GB * SEGG)
    qs = jnp.minimum(lax.iota(jnp.int32, n_pad // GB + 1) * GB, jnp.int32(n))
    search = searchsorted_left_big if c % _SUB == 0 else searchsorted_left
    bounds = search(gid_s, qs)

    win = _seg_win(c, n_pad)
    grad = jnp.pad(grad, ((0, GPAD - GROWS), (0, win)))
    gid2d = jnp.pad(gid_s[None, :], ((0, 0), (0, win)), constant_values=-1)
    g_sum = _run_segment_reduce(grad, gid2d, bounds, n_pad, n,
                                win=win)  # [GPAD, n_pad]

    d_table = jnp.transpose(g_sum[:, :n], (1, 0))  # [N, GPAD == ATTR_W]
    return d_table, None


_pack_gather.defvjp(_pack_gather_fwd, _pack_gather_bwd)


def pack_instances(pg: ProcessedGaussians, binned: BinnedInstances):
    """Gather per-instance attributes into the packed [ATTR_W, C + WIN] slab."""
    n = pg.uv.shape[0]
    table = jnp.concatenate(
        [
            pg.uv,
            pg.conic,
            pg.opacity[:, None],
            pg.color,
            jnp.zeros((n, ATTR_W - 9), pg.uv.dtype),
        ],
        axis=-1,
    )  # [N, 16]
    return _pack_gather(table, binned.gauss_id)


def rasterize_pallas(
    pg: ProcessedGaussians,
    binned: BinnedInstances,
    width: int,
    height: int,
    cfg: RenderConfig,
    row0: int = 0,
    nrows: int | None = None,
):
    """Drop-in replacement for rasterize_xla running the Pallas kernels.

    ``row0`` may be a traced scalar (e.g. a shard's ``axis_index``-derived
    tile-row offset); it reaches the kernel via scalar prefetch.
    """
    tiles_x, tiles_y = cfg.tile_grid(width, height)
    strip = nrows is not None
    if not strip:
        nrows = tiles_y
    num_tiles = tiles_x * nrows
    tw, th = cfg.tile_w, cfg.tile_h

    attr = pack_instances(pg, binned)

    static = _RasterStatic(
        tiles_x=tiles_x, num_tiles=num_tiles, tile_w=tw, tile_h=th, cfg=cfg,
    )
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)
    # Pad the tile tables to a GROUP multiple; padded tiles are empty ranges.
    t_pad = -(-num_tiles // GROUP) * GROUP
    starts = jnp.pad(binned.tile_start, (0, t_pad - num_tiles))
    ends = jnp.pad(binned.tile_end, (0, t_pad - num_tiles))
    out = _raster_core(attr, starts, ends, row0_arr, static)
    crop_h = height if not strip else nrows * th
    img, tmap = _assemble_strip(out, num_tiles, nrows, tiles_x, tw, th,
                                crop_h, width)

    counts = binned.tile_end - binned.tile_start
    aux = dict(
        transmittance=tmap,
        tile_overflow=jnp.zeros((), jnp.int32),  # kernel streams true ranges
        capacity_overflow=binned.overflow,
        gauss_overflow=binned.gauss_overflow,
        num_instances=binned.num_instances,
        max_tile_count=jnp.max(counts),
    )
    return img, aux
