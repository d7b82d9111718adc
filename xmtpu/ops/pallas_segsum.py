"""Pallas TPU kernel: sorted segment-sum via sequential-grid accumulation.

The scalable SchurQ operator reduces edge arrays into per-frame / per-landmark
sums (``jax.ops.segment_sum``).  XLA lowers scatter-adds poorly on TPU even
with sorted indices; this kernel exploits two structural facts instead:

* edges are **pre-sorted by segment** (SchurQ stores both orderings), so each
  fixed-size row chunk touches a bounded, contiguous band of output segments;
* the TPU Pallas grid executes **sequentially**, so chunks can accumulate
  into the output ref without atomics.

Per grid step the kernel builds a local one-hot band matrix from the chunk's
segment ids and contracts it with the chunk's values — the segment reduction
becomes an MXU matmul for f32 and a VPU masked reduction for f64 (f64 MXU is
software-emulated; the masked form stays exact).

Interface: :func:`sorted_segment_sum(vals, seg_ids, num_segments, band)` with
``band`` = max distinct segments any chunk can span (validated by
:func:`max_band`).  Falls back to ``jax.ops.segment_sum`` on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

CHUNK = 512


def max_band(seg_ids: np.ndarray, chunk: int = CHUNK) -> int:
    """Largest number of distinct segments spanned by any length-``chunk``
    window of the sorted ``seg_ids`` — the safe ``band`` for the kernel."""
    seg_ids = np.asarray(seg_ids)
    E = len(seg_ids)
    best = 1
    for start in range(0, E, chunk):
        w = seg_ids[start:start + chunk]
        best = max(best, int(w[-1] - w[0]) + 1)
    return best


def _kernel(pay_ref, out_ref, *, band, use_mxu, inner, chunk, D):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    # ``inner`` sub-chunks per grid step, rolled as a fori_loop: each grid
    # step carries fixed dispatch/DMA latency, and at CHUNK=512 the per-step
    # matmul is tiny — a 480-step sequential grid was latency-bound
    # (measured 18 ms for the n=6144 edge pass, round 5).  Batching
    # sub-chunks cuts the step count ``inner``-fold at identical arithmetic:
    # band semantics are per 512-row window, unchanged.
    #
    # The segment ids ride as an extra FLOAT payload column (exact for ids
    # < 2^24): a separate (rows, 1) i32 input would occupy a full 128-lane
    # VMEM tile per 8 rows — at inner=16 the two double-buffered inputs blew
    # the 16 MB scoped-VMEM budget; packed, the block is one buffer.
    def sub(j, _):
        # all-i32 index arithmetic: i64 loop indices / bare Python ints
        # under jax_enable_x64 fail Mosaic legalization (platform rule 13) —
        # the fori_loop below gets i32 bounds so ``j`` is i32
        off = j * jnp.int32(chunk)
        blk = pay_ref[pl.ds(off, chunk), :]              # (chunk, D+1)
        ids_f = blk[:, D]                                # float ids, exact
        first = ids_f[0]
        local = ids_f - first                            # in [0, band)
        onehot = (jax.lax.broadcasted_iota(
            jnp.int32, (band, chunk), 0).astype(blk.dtype)
            == local[None, :])
        vals = blk[:, :D]
        if use_mxu:
            # HIGHEST: the TPU f32 matmul default is bf16 passes — measured
            # 6e-3 relative error on real hardware without it (the one-hot
            # matrix is exact; the values are not)
            partial = jnp.dot(onehot.astype(vals.dtype), vals,
                              preferred_element_type=vals.dtype,
                              precision=jax.lax.Precision.HIGHEST)
        else:
            # exact masked reduction (f64: avoid emulated MXU)
            partial = jnp.sum(
                jnp.where(onehot[:, :, None], vals[None, :, :], 0.0), axis=1)
        first_i = first.astype(jnp.int32)
        cur = out_ref[pl.ds(first_i, band), :]
        out_ref[pl.ds(first_i, band), :] = cur + partial
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(inner), sub, jnp.int32(0))


# sub-chunks per grid step (see _kernel); 16 turns the n=6144 edge pass's
# 480-step grid into 30 steps
INNER = 16


def sorted_segment_sum(vals: jax.Array, seg_ids: jax.Array, num_segments: int,
                       band: int, chunk: int = CHUNK,
                       interpret: bool = False) -> jax.Array:
    """Segment sum over **sorted** ``seg_ids``.

    Args:
      vals: (E, D) values, rows sorted by segment id.
      seg_ids: (E,) int32 sorted segment ids (must be < 2^24: they ride the
        kernel as an exact float column).
      num_segments: S.
      band: static bound on distinct segments per chunk (see
        :func:`max_band`); the kernel is incorrect if exceeded.
    """
    E, D = vals.shape
    assert num_segments < (1 << 24), "float-packed ids require S < 2^24"
    # VMEM-aware inner cap: every VMEM buffer lane-pads D to 128, so the
    # resident output costs (S + band) * 128 * itemsize and each
    # double-buffered payload block inner * chunk * 128 * itemsize — a
    # large-S landmark reduction (S ~ 24k: 12.6 MB output) leaves room for
    # only a couple of sub-chunks under the 16 MB scoped budget
    item = jnp.dtype(vals.dtype).itemsize
    out_bytes = (num_segments + band) * 128 * item
    room = 14 * (1 << 20) - out_bytes
    vmem_cap = max(1, room // (2 * chunk * 128 * item))
    inner = int(max(1, min(INNER, vmem_cap, -(-E // chunk))))
    pad = (-E) % (chunk * inner)
    if pad:
        # padding rows keep the last segment id with zero values
        vals = jnp.concatenate([vals, jnp.zeros((pad, D), vals.dtype)])
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.broadcast_to(seg_ids[-1], (pad,))])
        E = E + pad

    use_mxu = vals.dtype == jnp.float32
    out_rows = num_segments + band  # slack so the band store never clips
    payload = jnp.concatenate(
        [vals, seg_ids.astype(vals.dtype)[:, None]], axis=1)

    out = pl.pallas_call(
        functools.partial(_kernel, band=band, use_mxu=use_mxu, inner=inner,
                          chunk=chunk, D=D),
        grid=(E // (chunk * inner),),
        # index maps derive every coordinate from the (i32) program id —
        # literal 0 would trace as i64 under jax_enable_x64 and the mixed
        # (i32, i64) index tuple fails Mosaic legalization
        in_specs=[
            pl.BlockSpec((chunk * inner, D + 1), lambda i: (i, i * 0)),
        ],
        out_specs=pl.BlockSpec((out_rows, D), lambda i: (i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((out_rows, D), vals.dtype),
        interpret=interpret,
    )(payload)
    return out[:num_segments]


# ---------------------------------------------------------------------------
# Segment-blocked variant: outputs beyond VMEM
# ---------------------------------------------------------------------------
#
# The kernel above holds the whole (num_segments + band, D) output resident
# per grid step — fine to ~10^5 f32 rows, impossible at Rome-scale M ~ 10^6
# (tens of MB >> VMEM).  The blocked variant tiles the output over blocks of
# ``SEG_BLOCK`` segments and drives the grid from a host-side SCHEDULE:
# edges (already segment-sorted) are re-chunked so every chunk's segments
# fall inside one output block, with zero-coefficient padding rows aligning
# chunks and empty visits covering edge-less blocks.  Block indices are
# monotone over the sequential grid, so Pallas keeps each output block in
# VMEM across its consecutive visits and writes it back exactly once.

SEG_BLOCK = 2048


def plan_blocks(seg_ids: np.ndarray, num_segments: int, chunk: int = CHUNK,
                seg_block: int = SEG_BLOCK):
    """Host-side schedule for :func:`sorted_segment_sum_blocked`.

    Walks the sorted ``seg_ids`` once: splits the edge stream at output-block
    boundaries, re-chunks each block's span to ``chunk`` rows, and inserts
    one empty visit per edge-less block (every block must be visited so its
    zero-init happens).

    Returns ``(gather_idx (G*chunk,), pad_mask (G*chunk,), blk (G,),
    first (G,), band)`` — gather/pad produce the scheduled edge layout,
    ``blk``/``first`` are the kernel's scalar-prefetch arrays, ``band`` the
    max segments any chunk spans (<= seg_block by construction).
    """
    seg_ids = np.asarray(seg_ids)
    E = len(seg_ids)
    nb = -(-num_segments // seg_block)
    blk_edge_start = np.searchsorted(
        seg_ids, np.arange(nb, dtype=np.int64) * seg_block)
    blk_edge_end = np.append(blk_edge_start[1:], E)
    spans, blks = [], []
    for b in range(nb):
        s, e = int(blk_edge_start[b]), int(blk_edge_end[b])
        if s == e:
            spans.append((s, s))          # empty visit: zero-init the block
            blks.append(b)
        else:
            for c0 in range(s, e, chunk):
                spans.append((c0, min(c0 + chunk, e)))
                blks.append(b)
    G = len(spans)
    s_arr = np.asarray([s for s, _ in spans], np.int64)
    e_arr = np.asarray([e for _, e in spans], np.int64)
    blk = np.asarray(blks, np.int32)
    first = np.ones(G, np.int32)
    first[1:] = (blk[1:] != blk[:-1]).astype(np.int32)
    gidx = s_arr[:, None] + np.arange(chunk, dtype=np.int64)[None, :]
    pad = gidx >= e_arr[:, None]
    gidx = np.clip(np.minimum(gidx, np.maximum(e_arr, 1)[:, None] - 1),
                   0, max(E - 1, 0))
    nonempty = e_arr > s_arr
    band = 1
    if nonempty.any():
        band = int((seg_ids[e_arr[nonempty] - 1]
                    - seg_ids[s_arr[nonempty]]).max()) + 1
    assert band <= seg_block
    return gidx.ravel(), pad.ravel(), blk, first, band


def _kernel_blocked(blk_ref, first_ref, ids_ref, vals_ref, out_ref, *,
                    band, sb, use_mxu):
    g = pl.program_id(0)

    @pl.when(first_ref[g] == 1)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    ids = ids_ref[:, 0]
    blk_start = blk_ref[g] * sb
    # clamp the band window so it stays inside the block; real ids always
    # land in [start, start + band) — padding rows carry the block's first
    # segment id, fall below the window when clamped, and match no one-hot
    # row (their values are zero anyway)
    local_first = ids[0] - blk_start
    start = jnp.maximum(jnp.minimum(local_first, sb - band), 0)
    local = ids - (blk_start + start)
    chunk = ids.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (band, chunk), 0)
              == local[None, :])
    vals = vals_ref[:, :]
    if use_mxu:
        partial = jnp.dot(onehot.astype(vals.dtype), vals,
                          preferred_element_type=vals.dtype,
                          precision=jax.lax.Precision.HIGHEST)
    else:
        partial = jnp.sum(
            jnp.where(onehot[:, :, None], vals[None, :, :], 0.0), axis=1)
    cur = out_ref[pl.ds(start, band), :]
    out_ref[pl.ds(start, band), :] = cur + partial


def sorted_segment_sum_blocked(vals: jax.Array, seg_ids: jax.Array,
                               num_segments: int, blk, first, band: int,
                               seg_block: int = SEG_BLOCK,
                               chunk: int = CHUNK,
                               interpret: bool = False) -> jax.Array:
    """Segment sum with the output tiled over blocks of ``seg_block``
    segments — ``vals``/``seg_ids`` must already be in the SCHEDULED layout
    produced by :func:`plan_blocks` (padding rows: block-first segment id,
    zero values)."""
    from jax.experimental.pallas import tpu as pltpu

    G = len(blk)
    E, D = vals.shape
    assert E == G * chunk, (E, G, chunk)
    nb = -(-num_segments // seg_block)

    out = pl.pallas_call(
        functools.partial(_kernel_blocked, band=band, sb=seg_block,
                          use_mxu=vals.dtype == jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((chunk, 1), lambda g, blk, first: (g, 0)),
                pl.BlockSpec((chunk, D), lambda g, blk, first: (g, 0)),
            ],
            out_specs=pl.BlockSpec((seg_block, D),
                                   lambda g, blk, first: (blk[g], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb * seg_block, D), vals.dtype),
        interpret=interpret,
    )(jnp.asarray(blk, jnp.int32), jnp.asarray(first, jnp.int32),
      seg_ids[:, None].astype(jnp.int32), vals)
    return out[:num_segments]


def schedule_edges(seg_ids: np.ndarray, num_segments: int,
                   chunk: int = CHUNK, seg_block: int = SEG_BLOCK):
    """Host helper: scheduled segment-id array + gather/pad plan for laying
    out per-edge payloads (coefficients, partner ids) in the blocked
    kernel's layout.  Returns ``(ids_sched (G*chunk,), gidx, pad, blk,
    first, band)``."""
    seg_ids = np.asarray(seg_ids)
    gidx, pad, blk, first, band = plan_blocks(seg_ids, num_segments, chunk,
                                              seg_block)
    ids_sched = seg_ids[gidx] if len(seg_ids) else np.zeros_like(gidx)
    blk_first_per_row = np.repeat(blk.astype(np.int64) * seg_block, chunk)
    ids_sched = np.where(pad, blk_first_per_row, ids_sched).astype(np.int32)
    return ids_sched, gidx, pad, blk, first, band
