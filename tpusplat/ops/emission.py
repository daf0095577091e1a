"""Pallas instance-emission kernel: per-slot (tile, gauss_id) at HBM speed.

Replaces the XLA formulation of K4 key expansion (``preprocess_sort.comp:
43-58``) in ``binning.expand_instances`` — whose scatter-max owner marks,
cummax, and [C, 6] row gather run at XLA's ~4-10 ns/element gather rates
(~45 ms at garden scale, docs/PROFILE.md) — with a streaming kernel built
from dense compares and MXU matmuls only (~15 ms fused, hardware-measured;
see docs/PROFILE.md round 4).

The formulation: instance slot ``s`` is owned by the last Gaussian ``g``
(in depth-emission order) with ``off[g] <= s`` (off = exclusive cumsum of
tile counts; zero-count Gaussians tie with their successor and can never be
the last, see binning.py). For any per-Gaussian integer field ``f``, the
owner's value is a telescoping sum over the depth stream:

    f[owner(s)] = sum_g (f[g] - f[g-1]) * [off[g] <= s]

so ONE [MROWS, EIB] x [EIB, EW] matmul against the 0/1 step matrix
``LE[i, j] = off[i] <= slot[j]`` recovers every field of every slot's owner
simultaneously (built transposed — ``LE_T[j, i]`` from a [EW, 1] slot iota
against the raw [1, EIB] off row — and contracted via dot_general on both
operands' dim 1, which avoids any per-block relayout; measured 28% faster
than materializing LE). Each program walks the blocks of Gaussians
overlapping its slot windows (block-exact bounds via binary search over the
block-subsampled off array XLA-side), carrying the last row between blocks;
starting the telescope at an aligned block start with a zero carry is exact
because rows before the window's first candidate have all-ones indicators
and telescope away.

Exactness: all fields are integers < 2^24 (guarded in the caller; x0/y0/bbh
travel as one 8/8/8-bit packed field), every in-order partial sum
telescopes to some f[k] < 2^24, and the HIGHEST (multi-pass bf16) MXU
decomposition splits 24-bit integers into exact 8-bit bf16 components whose
partial sums stay < 2^24 — so the matmul is bit-exact, verified against the
XLA path by tests/test_emission.py and the hardware gate.

Emission-order parity with the reference (x outer, y inner,
``preprocess_sort.comp:47-48``) and the +0.5-biased float-reciprocal
integer division follow binning.expand_instances exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusplat.ops.preprocess import ProcessedGaussians

EW = 512  # instance slots per emission window
EIB = 128  # gaussian meta rows per streamed block (lane-aligned)
EWG = 8  # windows per program (head-prefetch group)
MROWS = 8  # meta slab rows: off, packed(x0|y0|bbh), gid + 5 pad
SENTINEL = 2**31 - 1  # python int: jnp constants at module scope would be
# captured by the kernel trace ("captures constants" error)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot11(a, b):
    """Contract a's dim 1 with b's dim 1 (b given transposed): exact for
    0/1-weighted sums of <2^24 integers under HIGHEST (see module doc)."""
    return lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _emission_kernel(astart_ref, nblk_ref, row0_ref, total_ref, meta_hbm,
                     tile_ref, gid_ref, head, roll, hsem, rsem,
                     *, tiles_x, n_sentinel):
    pid = pl.program_id(0)

    def issue(dst, sem, col):
        pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(pl.multiple_of(col, EIB), EIB)], dst, sem
        ).start()

    def wait(dst, sem, col):
        pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(pl.multiple_of(col, EIB), EIB)], dst, sem
        ).wait()

    # Issue every window's first meta block up front.
    for j in range(EWG):
        issue(head.at[j], hsem.at[j], astart_ref[pid * EWG + j])

    for j in range(EWG):
        p = pid * EWG + j
        a0 = astart_ref[p]
        nb = nblk_ref[p]
        slots_f = (p * EW + lax.broadcasted_iota(jnp.int32, (1, EW), 1)
                   ).astype(jnp.float32)  # [1, EW] exact ints < 2^24
        slots_col = (p * EW + lax.broadcasted_iota(jnp.int32, (EW, 1), 0)
                     ).astype(jnp.float32)  # [EW, 1]

        def telescope(buf, carry_acc):
            carry, acc = carry_acc
            b = buf[:, :]  # [MROWS, EIB]
            cols = lax.broadcasted_iota(jnp.int32, (MROWS, EIB), 1)
            prev = jnp.where(cols == 0, carry, pltpu.roll(b, shift=1, axis=1))
            delta = b - prev  # [MROWS, EIB] integer-valued f32
            le_t = jnp.where(b[0:1, :] <= slots_col, 1.0, 0.0)  # [EW, EIB]
            return b[:, EIB - 1:EIB], acc + _dot11(delta, le_t)

        carry = jnp.zeros((MROWS, 1), jnp.float32)
        acc = jnp.zeros((MROWS, EW), jnp.float32)

        # Block 0 from the head slot; blocks 1.. double-buffer through roll.
        wait(head.at[j], hsem.at[j], a0)

        @pl.when(nb >= 2)
        def _():
            issue(roll.at[0], rsem.at[0], a0 + EIB)

        carry, acc = telescope(head.at[j], (carry, acc))

        def bbody(state):
            w, carry, acc = state
            slot = lax.rem(w - 1, 2)
            col = a0 + w * EIB
            wait(roll.at[slot], rsem.at[slot], col)

            @pl.when(w + 1 < nb)
            def _():
                issue(roll.at[lax.rem(w, 2)], rsem.at[lax.rem(w, 2)],
                      col + EIB)

            carry, acc = telescope(roll.at[slot], (carry, acc))
            return w + 1, carry, acc

        _, carry, acc = lax.while_loop(
            lambda st: st[0] < nb, bbody, (jnp.int32(1), carry, acc)
        )

        # Per-slot owner fields -> (tile, gid). Same math as
        # binning.expand_instances: r = s - off, q = floor((r + 0.5)/bbh)
        # (the +0.5 bias makes the f32 division exact for r < 2^13).
        off = acc[0:1, :]
        packed = acc[1:2, :].astype(jnp.int32)
        x0 = (packed & 255).astype(jnp.float32)
        y0 = ((packed >> 8) & 255).astype(jnp.float32)
        bbh = jnp.maximum(((packed >> 16) & 255).astype(jnp.float32), 1.0)
        gidf = acc[2:3, :]
        r = slots_f - off
        q = jnp.floor((r + 0.5) / bbh)
        rem = r - q * bbh
        row0f = row0_ref[0].astype(jnp.float32)
        tile_f = x0 + q + (y0 + rem - row0f) * tiles_x

        slots_i = p * EW + lax.broadcasted_iota(jnp.int32, (1, EW), 1)
        valid = slots_i < total_ref[0]
        tile_ref[0:1, pl.ds(j * EW, EW)] = jnp.where(
            valid, tile_f.astype(jnp.int32), SENTINEL)
        gid_ref[0:1, pl.ds(j * EW, EW)] = jnp.where(
            valid, gidf.astype(jnp.int32), jnp.int32(n_sentinel))


def expand_instances_pallas(
    pg: ProcessedGaussians, tiles_x: int, capacity: int, row0=0, nrows=None,
    depth_order: jax.Array | None = None, gauss_capacity: int | None = None,
    meta_sorted=None,
):
    """Drop-in replacement for binning.expand_instances (Pallas path).

    Same contract: per-slot (tile, gid) for ``capacity`` static slots in
    depth-major emission order, plus (total, overflow, gauss_overflow).
    ``row0`` may be traced. The kernel internally pads the slot axis to a
    EW*EWG multiple (padded slots are invalid and sliced away).

    Caller contract (checked by the router in ``binning.bin_and_sort``):
    tiles_x <= 255 AND tiles_y <= 255 — x0/y0/bbh travel as 8-bit fields of
    the packed meta word, and y0/bbh are bounded by the tile-row count, not
    tiles_x. Frames taller than 255 tile rows (> 4080 px at tile_h = 16)
    must use the XLA ``expand_instances`` path.

    ``gauss_capacity`` (strip compaction): when the caller's depth_order
    key marks STRIP-visible Gaussians (clipped ntiles > 0) and pushes the
    rest to the end (inf depth key), ``order[:gauss_capacity]`` is exactly
    the strip's Gaussians in depth order — so the meta gather, cumsum,
    bound search, and the kernel's block walk all run at ~0.2N instead of
    N (the per-chip N-replication tax of docs/SCALING.md). Instances of
    Gaussians past the cap (only possible if the cap is too small) are
    counted into ``gauss_overflow`` — a SEPARATE channel from instance
    ``overflow``, because the recoveries differ: instance overflow is fixed
    by growing ``capacity`` (cfg.capacity / capacity_mult), gauss overflow
    only by growing ``cfg.strip_gauss_mult``. Folding them together sent
    host regrow loops into an unbounded instance-capacity regrow that could
    never clear a gauss-cap overflow.

    ``meta_sorted`` (the production fast path, built by bin_and_sort):
    ``(ids, ntiles, packed, total_true)`` already in depth-emission order
    (and already compacted, if applicable) — the caller carried the meta
    through its depth sort as integer payloads, which measures ~2.7 ms
    cheaper per strip than the [stream, 2] row gather this function
    otherwise performs (docs/MICRO_r05.md). ``total_true`` is the
    pre-compaction clipped instance total (for gauss_overflow accounting).
    Mutually exclusive with ``depth_order``/``gauss_capacity``.
    """
    n_orig = pg.ntiles.shape[0]
    cap_pad = -(-capacity // (EW * EWG)) * (EW * EWG)
    assert n_orig < 2**24 and capacity < 2**24, (
        "emission kernel fields must stay exact in f32"
    )
    assert tiles_x <= 255, "packed meta field holds 8 bits per coordinate"
    if meta_sorted is not None:
        assert depth_order is None and gauss_capacity is None
        ids, ntiles_d, packed_d = (x.astype(jnp.int32) for x in
                                   meta_sorted[:3])
        total_true = meta_sorted[3]
    else:
        x0, y0 = pg.aabb[:, 0], pg.aabb[:, 1]
        x1, y1 = pg.aabb[:, 2], pg.aabb[:, 3]
        if nrows is not None:
            y0 = jnp.clip(y0, row0, row0 + nrows)
            y1 = jnp.clip(y1, row0, row0 + nrows)
        ntiles = jnp.where(pg.ntiles > 0,
                           (x1 - x0) * jnp.maximum(y1 - y0, 0), 0)
        bbh = jnp.maximum(y1 - y0, 1)
        packed = x0 + (y0 << 8) + (bbh << 16)  # 8/8/8 bits, < 2^24

        tbl = jnp.stack([ntiles, packed], axis=-1)  # [N, 2]
        total_true = jnp.sum(ntiles)
        if depth_order is not None and gauss_capacity is not None \
                and gauss_capacity < n_orig:
            ids = depth_order[:gauss_capacity].astype(jnp.int32)
            tbl = tbl[ids]
        elif depth_order is not None:
            ids = depth_order.astype(jnp.int32)
            tbl = tbl[depth_order]
        else:
            ids = lax.iota(jnp.int32, n_orig)
        ntiles_d, packed_d = tbl[:, 0], tbl[:, 1]
    n = ids.shape[0]  # meta length from here on (compacted or full)
    cum = jnp.cumsum(ntiles_d)
    off = (cum - ntiles_d).astype(jnp.int32)
    total = cum[-1]
    # Instances of Gaussians beyond gauss_capacity were never emitted;
    # they are dropped instances exactly like capacity overflow.
    gauss_dropped = total_true - total

    n_pad = -(-n // EIB) * EIB
    meta = jnp.stack([
        off.astype(jnp.float32),
        packed_d.astype(jnp.float32),
        ids.astype(jnp.float32),
    ] + [jnp.zeros((n,), jnp.float32)] * (MROWS - 3), axis=0)  # [MROWS, N]
    totf = total.astype(jnp.float32)
    # Column-pad rows carry off = total so they can never own a valid slot.
    pad_cols = jnp.zeros((MROWS, n_pad - n), jnp.float32).at[0, :].set(totf)
    meta = jnp.concatenate([meta, pad_cols], axis=1) if n_pad > n else meta

    # Per-window gaussian-block bounds. Binary search over the
    # block-subsampled off array is block-EXACT: off_sub[b] <= p*EW <
    # off_sub[b+1] pins the last candidate row to block b (monotone off),
    # and the search runs over [N/EIB] elements instead of [N] — ~13x
    # faster than searching off itself (measured; searchsorted cost is
    # per-round gather dispatch, not elements).
    from tpusplat.ops.binning import searchsorted_left, searchsorted_right

    off_sub = jnp.concatenate(
        [off, jnp.full((n_pad - n,), jnp.int32(2**31 - 1))])[::EIB]
    n_win = cap_pad // EW
    pw = lax.iota(jnp.int32, n_win) * EW
    bstart = searchsorted_right(off_sub, pw) - 1  # block of last off <= p*EW
    bend = searchsorted_left(off_sub, pw + EW)  # first block fully past
    astart = jnp.maximum(bstart, 0) * EIB
    nblk = jnp.maximum(bend - jnp.maximum(bstart, 0), 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_win // EWG,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, EW * EWG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EW * EWG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((EWG, MROWS, EIB), jnp.float32),
            pltpu.VMEM((2, MROWS, EIB), jnp.float32),
            pltpu.SemaphoreType.DMA((EWG,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tile2d, gid2d = pl.pallas_call(
        functools.partial(_emission_kernel, tiles_x=tiles_x,
                          n_sentinel=n_orig),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, cap_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, cap_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        astart, nblk,
        jnp.asarray(row0, jnp.int32).reshape(1),
        jnp.minimum(total, capacity).astype(jnp.int32).reshape(1),
        meta,
    )
    overflow = jnp.maximum(total - capacity, 0)
    return (tile2d[0, :capacity], gid2d[0, :capacity],
            jnp.minimum(total, capacity), overflow, gauss_dropped)
