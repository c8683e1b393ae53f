"""Fused beam-update Pallas kernel — one kernel per hop for ALL the beam's
bookkeeping (SURVEY.md §2b C5; the faiss `search_from_candidates` heap ops).

Motivation (scripts/hop_cost_bench.py, v5e): the legacy hop spends ~3.2 ms
per hop at Q=8192/ef=64/K=64 in three separate XLA ops — the [Q, 2ef] merge
sort (~1.1 ms), the [Q, K, ef] buffer-membership dedup (~1.0 ms) and the
argmin/one-hot next-candidate select (~1.1 ms). Each moves ~10 MB yet costs
a millisecond: they run at ~1% of HBM bandwidth, bounded by VPU-unfriendly
lowerings (lax.sort's generic network, a materialized 3-D compare), not by
the hardware. This kernel fuses all three into one VMEM-resident pass:

  * state is TRANSPOSED to [ef, Q]: the merge axis lives on sublanes (any
    ef works; rolls along axis 0 are cheap register/sublane moves) and Q
    rides the 128-wide lane axis at full utilization;
  * the priority-queue merge is a bitonic network built from XOR
    compare-exchange stages (partner = index ^ stride, realized as two
    `pltpu.roll`s + a select — no cross-lane shuffles at all): the already-
    sorted buffer is merged with the descending-bitonic-sorted candidates
    in log2 stages, exactly the top-ef semantics of the legacy
    `lax.sort((dist, payload))` (ops/beam.py) up to tie order;
  * buffer-membership dedup is an ef-step fori_loop of [K, Q] compares
    against one buffer row at a time (VMEM-resident, ~70 us of VPU work vs
    ~1 ms for the XLA 3-D formulation);
  * the NEXT candidate to expand is selected inside the same kernel
    (min + first-match one-hot along sublanes) and returned as `cur` [Q],
    so the while-loop body is just gather -> distances -> this kernel.

Semantics are identical to ops/beam.py's f32-key "buffer" visited mode with
n_expand=1 (the production serving path): same top-ef retention, same
ef_live runtime masking, same first-occurrence argmin tie-break. The only
divergence is sort stability among EQUAL distances (bitonic networks are
unstable), which can reorder ties at the truncation boundary — recall-
neutral, exercised by the parity tests in tests/test_beam_kernel.py.

Payload encoding matches ops/beam.py: p = (id << 1) | expanded; -1 encodes
(id=-1, expanded) for empty slots. Masked/duplicate candidates enter the
network as (+inf, -1) and lose every exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf


def _pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def _roll(x: jax.Array, shift: int, *, interpret: bool) -> jax.Array:
    # pltpu.roll has no interpret-mode lowering; jnp.roll is bit-identical.
    # pltpu.roll also requires a non-negative shift — rolls are circular,
    # so -s ≡ nrows - s.
    if interpret:
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _cx(vals, pays, s: int, keep_small, *, interpret: bool):
    """One XOR compare-exchange stage along axis 0: partner = i ^ s.
    keep_small [W, 1]: row keeps min(self, partner) else max. Tie-safe:
    on equal keys both sides keep their own payload."""
    up = _roll(vals, -s, interpret=interpret)     # x[i + s]
    dn = _roll(vals, s, interpret=interpret)      # x[i - s]
    up_p = _roll(pays, -s, interpret=interpret)
    dn_p = _roll(pays, s, interpret=interpret)
    w = vals.shape[0]
    lo = (jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0) & s) == 0
    part = jnp.where(lo, up, dn)
    part_p = jnp.where(lo, up_p, dn_p)
    # boolean algebra, not jnp.where-of-bools: Mosaic can't select between
    # i1 vectors ("unsupported target bitwidth for truncation")
    take_self = (keep_small & (vals <= part)) | (
        ~keep_small & (vals >= part))
    return (jnp.where(take_self, vals, part),
            jnp.where(take_self, pays, part_p))


def _bitonic_sort_desc(vals, pays, *, interpret: bool):
    """Full bitonic sort DESCENDING along axis 0 (rows = pow2)."""
    w = vals.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    k = 2
    while k <= w:
        dir_up = (iota & k) != 0      # flipped -> final order descending
        s = k // 2
        while s >= 1:
            lo = (iota & s) == 0
            vals, pays = _cx(vals, pays, s, dir_up == lo,
                             interpret=interpret)
            s //= 2
        k *= 2
    return vals, pays


def _bitonic_merge_asc(vals, pays, *, interpret: bool):
    """Bitonic merge ascending (input = asc half ++ desc half, rows pow2)."""
    w = vals.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    s = w // 2
    while s >= 1:
        keep_small = (iota & s) == 0
        vals, pays = _cx(vals, pays, s, keep_small, interpret=interpret)
        s //= 2
    return vals, pays


def _beam_update_kernel(buf_d_ref, buf_p_ref, cand_i_ref, cand_d_ref,
                        ef_live_ref, out_d_ref, out_p_ref, cur_ref,
                        ndis_ref, *, ef: int, interpret: bool):
    """Per Q-block body. Shapes: buf [ef, bq], cand [K, bq], scalars SMEM."""
    buf_p = buf_p_ref[:]                                   # i32 [ef, bq]
    cand_i = cand_i_ref[:]                                 # i32 [K, bq]
    cand_d = cand_d_ref[:]                                 # f32 [K, bq]
    k_rows, bq = cand_i.shape

    # --- membership dedup: candidate fresh iff not already in the buffer.
    # One buffer row at a time keeps the compare 2-D and VMEM-resident.
    # (carried as i32, not bool: Mosaic can't round-trip i1 vectors
    # through a fori_loop carry)
    def member_body(i, seen):
        row_id = buf_p_ref[pl.ds(i, 1), :] >> 1            # [1, bq]
        return seen | (cand_i == row_id).astype(jnp.int32)

    seen = jax.lax.fori_loop(
        0, ef, member_body, jnp.zeros((k_rows, bq), jnp.int32))
    fresh = (cand_i >= 0) & (seen == 0)
    ndis_ref[:] = jnp.sum(fresh, axis=0, keepdims=True).astype(jnp.int32)

    cand_d = jnp.where(fresh, cand_d, INF)
    cand_p = jnp.where(fresh, cand_i << 1, -1)             # -1 == (-1, exp)

    # --- pad both halves to a common pow2 width, sort candidates
    # descending, then one bitonic merge gives top-ef ascending
    w = max(ef, _pow2(k_rows))
    if k_rows < w:
        cand_d = jnp.concatenate(
            [cand_d, jnp.full((w - k_rows, bq), INF, cand_d.dtype)], axis=0)
        cand_p = jnp.concatenate(
            [cand_p, jnp.full((w - k_rows, bq), -1, cand_p.dtype)], axis=0)
    cand_d, cand_p = _bitonic_sort_desc(cand_d, cand_p, interpret=interpret)
    buf_d = buf_d_ref[:]
    if ef < w:
        buf_d = jnp.concatenate(
            [buf_d, jnp.full((w - ef, bq), INF, buf_d.dtype)], axis=0)
        buf_p = jnp.concatenate(
            [buf_p, jnp.full((w - ef, bq), -1, buf_p.dtype)], axis=0)
    d = jnp.concatenate([buf_d, cand_d], axis=0)
    p = jnp.concatenate([buf_p, cand_p], axis=0)
    d, p = _bitonic_merge_asc(d, p, interpret=interpret)
    d, p = d[:ef], p[:ef]

    # --- ef_live runtime mask (ops/beam.py: emulate a narrower buffer)
    iota = jax.lax.broadcasted_iota(jnp.int32, (ef, 1), 0)
    dead = iota >= ef_live_ref[0, 0]
    d = jnp.where(dead, INF, d)
    p = jnp.where(dead, -1, p)

    # --- select next candidate to expand: nearest unexpanded entry
    key = jnp.where((p & 1) == 1, INF, d)                  # [ef, bq]
    m = jnp.min(key, axis=0, keepdims=True)                # [1, bq]
    ok = m < INF
    first = jnp.where(key == m, iota, ef)                  # first match wins
    j = jnp.min(first, axis=0, keepdims=True)              # [1, bq]
    hit = (iota == j) & ok                                 # one-hot [ef, bq]
    cur_ref[:] = jnp.where(
        ok, jnp.sum(jnp.where(hit, p, 0), axis=0, keepdims=True) >> 1, -1)
    out_d_ref[:] = d
    out_p_ref[:] = p | hit.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("ef", "bq", "interpret"))
def beam_update(buf_d: jax.Array, buf_p: jax.Array, cand_i: jax.Array,
                cand_d: jax.Array, ef_live: jax.Array, *, ef: int,
                bq: int = 0, interpret: bool = False):
    """One fused beam hop update.

    buf_d f32 [ef, Q] ascending per column; buf_p i32 [ef, Q]
    (payload (id<<1)|expanded, -1 = empty); cand_i i32 [K, Q] (-1 = invalid);
    cand_d f32 [K, Q]; ef_live i32 scalar (runtime buffer narrowing).
    Q must be a multiple of 128 (callers pad; see beam.py fused path).

    Returns (buf_d', buf_p', cur [Q] i32 — next node to expand per query,
    -1 when converged — and ndis [Q] i32, the fresh-candidate count).
    """
    ef_rows, q = buf_d.shape
    assert ef_rows == ef
    k_rows = cand_i.shape[0]
    if bq <= 0:
        # VMEM budget: ~24 B/row-col across in+out+network operands
        bq = 512 if ef <= 128 else (256 if ef <= 256 else 128)
    bq = min(bq, q)
    assert q % bq == 0 and bq % 128 == 0, (q, bq)
    grid = (q // bq,)
    kernel = functools.partial(_beam_update_kernel, ef=ef,
                               interpret=interpret)
    out_d, out_p, cur, ndis = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ef, bq), lambda i: (0, i)),
            pl.BlockSpec((ef, bq), lambda i: (0, i)),
            pl.BlockSpec((k_rows, bq), lambda i: (0, i)),
            pl.BlockSpec((k_rows, bq), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((ef, bq), lambda i: (0, i)),
            pl.BlockSpec((ef, bq), lambda i: (0, i)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ef, q), jnp.float32),
            jax.ShapeDtypeStruct((ef, q), jnp.int32),
            jax.ShapeDtypeStruct((1, q), jnp.int32),
            jax.ShapeDtypeStruct((1, q), jnp.int32),
        ],
        interpret=interpret,
    )(buf_d, buf_p, cand_i, cand_d,
      jnp.asarray(ef_live, jnp.int32).reshape(1, 1))
    return out_d, out_p, cur[0], ndis[0]
