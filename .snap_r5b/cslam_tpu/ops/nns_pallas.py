"""Fused Pallas bank-scan kernel for cosine top-k search.

The XLA path (``ops.topk``) materializes the full ``[B, N]`` similarity
matrix in HBM and runs a full-width ``lax.top_k`` — for a 100k-row bank the
sort dominates. This kernel streams the bank through VMEM once:

    grid over bank tiles ->
        MXU: sims = queries @ tile^T            (in VMEM)
        VPU: iterative top-k within the tile    (no HBM traffic)
        one aligned [B, 128] write of (vals, idx) candidates per tile

followed by one tiny ``lax.top_k`` merge over the ``[B, T*K]`` candidates.
Total HBM traffic ~= one bank read instead of bank + 2x similarity matrix +
full-width sort passes.

TPU alignment notes: candidate outputs are padded to a 128-wide lane block
(Mosaic requires lane-aligned VMEM slices) and written once per grid step.
Use ``interpret=True`` on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 4096   # tuned on v5e: 4096 beats 2048 (fewer grid steps)
KERNEL_K = 10   # per-tile candidates (frontend.nb_best_matches default)
_LANE = 128     # TPU lane width: output block last-dim alignment


def _scan_kernel(n_ref, q_ref, bank_ref, inv_ref, vals_ref, idx_ref):
    """One grid step: per-tile cosine top-K of all queries vs one bank tile."""
    t = pl.program_id(0)
    base = t * TILE_N
    n = n_ref[0]
    B = q_ref.shape[0]

    sims = jax.lax.dot_general(
        q_ref[:], bank_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sims = sims * inv_ref[:].reshape(1, TILE_N)

    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    valid = (col + base) < n
    work = jnp.where(valid, sims, -jnp.inf)

    # iterative top-K inside VMEM: K maxima with masking
    bests, args = [], []
    for _ in range(KERNEL_K):
        best = jnp.max(work, axis=1)
        arg = jnp.argmax(work, axis=1).astype(jnp.int32)
        bests.append(best)
        args.append(arg + base)
        work = jnp.where(col == arg[:, None], -jnp.inf, work)

    vals = jnp.stack(bests, axis=1)                       # [B, K]
    idxs = jnp.stack(args, axis=1)                        # [B, K]
    pad = _LANE - KERNEL_K
    vals_ref[0] = jnp.pad(vals, ((0, 0), (0, pad)),
                          constant_values=-jnp.inf)
    idx_ref[0] = jnp.pad(idxs, ((0, 0), (0, pad)))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def cosine_topk_fused(bank: jax.Array, inv_norms: jax.Array, n: jax.Array,
                      queries: jax.Array, k: int,
                      interpret: bool = False):
    """Drop-in equivalent of ``ops.topk.cosine_topk`` via the fused kernel.

    Requires ``bank.shape[0] % TILE_N == 0`` and ``k <= KERNEL_K``.
    """
    assert k <= KERNEL_K
    N, D = bank.shape
    assert N % TILE_N == 0, f"bank rows {N} must be a multiple of {TILE_N}"
    B = queries.shape[0]
    T = N // TILE_N

    queries = queries.astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, D), lambda t, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, D), lambda t, n_ref: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda t, n_ref: (t,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, _LANE), lambda t, n_ref: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, _LANE), lambda t, n_ref: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    vals, idx = pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, B, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((T, B, _LANE), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D, transcendentals=0,
            bytes_accessed=N * D * 4 + B * D * 4 + T * B * _LANE * 8),
    )(jnp.asarray([n], jnp.int32), queries, bank.astype(jnp.float32),
      inv_norms.astype(jnp.float32))

    # merge stage: tiny top-k over T*K candidates, then scale by query norms
    cand_vals = jnp.swapaxes(vals[..., :KERNEL_K], 0, 1).reshape(
        B, T * KERNEL_K)
    cand_idx = jnp.swapaxes(idx[..., :KERNEL_K], 0, 1).reshape(
        B, T * KERNEL_K)
    top_vals, pos = jax.lax.top_k(cand_vals, k)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    q_inv = 1.0 / jnp.maximum(jnp.linalg.norm(queries, axis=-1), 1e-12)
    return top_vals * q_inv[:, None], top_idx


# ---------------------------------------------------------------------------
# v2: streaming per-column chains (round-3 kernel)
# ---------------------------------------------------------------------------

_TOPC = 4          # per-lane-column global candidates kept in scratch
MAX_K = _LANE      # cosine_topk_fused2 supports k up to one lane block

# VMEM envelope (v5e: ~16 MiB/core). The dominant term is the per-tile
# similarity block sims[B, tile_n] (f32); at B=1024 x TILE_N=4096 that is
# 16 MiB alone, which is exactly the round-3 on-chip compile failure
# (HTTP 500 / tpu_compile_helper exit 1 for every fused2 B=1024 variant,
# benchmarks/results/nns_kernel_probe.log). Budget below leaves headroom
# for Mosaic's own buffers; callers at large B must shrink the tile.
_VMEM_BUDGET = 13 * 2 ** 20

# Batch envelope. B=1024 fails the Mosaic compile (tpu_compile_helper
# exit 1) at EVERY tile the VMEM model admits — measured round 4 at
# tile 1024, where the modeled working set (~9.3 MiB) fits comfortably,
# so the limit is a compiler/register-pressure envelope on the [B, 128]
# compare-select chains, not raw VMEM. B=512 at tile 4096 compiles and
# streams at 23-45% of HBM peak. Larger query batches are served as
# sequential <=512-row kernel invocations inside one jitted program
# (cosine_topk_fused2_pre chunks automatically; throughput stays within
# a few % of one dispatch — the scan is HBM-bound either way).
MAX_FUSED2_BATCH = 512


def pick_tile_n(batch: int, dim: int, rows: int,
                bank_itemsize: int = 4) -> int:
    """Largest power-of-two tile (<= TILE_N) whose fused2 working set fits
    the VMEM budget: sims[B, t] + double-buffered bank tile + queries +
    negmask + the per-column candidate scratch. ``rows`` must stay a
    multiple of the returned tile (halving preserves that for the
    power-of-two bank capacities every caller uses). ``batch`` above
    ``MAX_FUSED2_BATCH`` is clamped — the kernel never sees a larger B
    (the entry point chunks)."""
    batch = min(batch, MAX_FUSED2_BATCH)
    t = TILE_N
    while t > _LANE:
        need = (batch * t * 4                       # sims block
                + 2 * t * dim * bank_itemsize       # bank tile (dbl-buf)
                + 2 * t * 4                         # negmask slices
                + batch * dim * 4                   # queries
                + (2 * _TOPC + 1) * batch * _LANE * 4)   # M + A + F scratch
        if need <= _VMEM_BUDGET and rows % t == 0:
            return t
        t //= 2
    return t


def _scan_kernel2(k, specialize, n_ref, q_ref, bank_ref, negm_ref,
                  vals_ref, idx_ref, flag_ref,
                  M_ref, A_ref, F_ref):
    """Streaming bank scan: per-tile top-2-per-lane-column compare-select
    chains feeding a global per-column top-4 scratch, merged to the final
    top-k in-kernel at the last grid step.

    Why this shape: the v1 kernel spent ~19 VPU ops/element on 10 serial
    cross-lane (max, argmax, mask) iterations over ``[B, TILE_N]`` — 6.8%
    of HBM peak measured (benchmarks/nns_kernel_probe.py; the same matmul
    with a single max reduce reaches 80.7%). Here every sim element is
    touched by a short compare-select chain against per-column running
    maxima (pure elementwise VPU work on ``[B, 128]`` registers, no lane
    rotations), and candidates stay in VMEM scratch until the final grid
    step — output traffic is 3 [B, 128] blocks per BANK PASS instead of
    2 per tile. The final merge runs in-kernel too: an XLA
    ``lax.top_k`` over the [B, 512] candidates measured 48us/batch —
    slower than the entire bank scan.

    Exactness bookkeeping (see ``cosine_topk_fused2``): F accumulates an
    upper bound on every sim value this scan may have dropped — the
    3rd-max of each (tile, column) chain and every value displaced from
    (or refused by) the global per-column top-4.
    """
    t = pl.program_id(0)
    T = pl.num_programs(0)
    base = t * bank_ref.shape[0]
    n = n_ref[0]
    B = q_ref.shape[0]
    tile_n = bank_ref.shape[0]
    G = tile_n // _LANE

    @pl.when(t == 0)
    def _init():
        M_ref[:] = jnp.full(M_ref.shape, -jnp.inf, jnp.float32)
        # index slots start at each column's lowest global index so that
        # all-invalid (-inf) columns reproduce lax.top_k's lowest-index
        # tie order (insertion uses strict >, so -inf never overwrites)
        A_ref[:] = jax.lax.broadcasted_iota(jnp.int32, A_ref.shape, 2)
        F_ref[:] = jnp.full(F_ref.shape, -jnp.inf, jnp.float32)

    def do_tile(masked: bool):
        sims = jax.lax.dot_general(
            q_ref[:], bank_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, _LANE), 1)
        negm = negm_ref[:]

        # streaming top-2 (+3rd value) per lane column across the G chunks;
        # indices tracked as the chunk id g (scalar broadcast, saves a
        # per-chunk integer add) and reconstructed once per tile below
        m1 = jnp.full((B, _LANE), -jnp.inf, jnp.float32)
        a1 = jnp.zeros((B, _LANE), jnp.int32)
        m2 = jnp.full((B, _LANE), -jnp.inf, jnp.float32)
        a2 = jnp.zeros((B, _LANE), jnp.int32)
        m3 = jnp.full((B, _LANE), -jnp.inf, jnp.float32)
        for g in range(G):
            w = sims[:, g * _LANE:(g + 1) * _LANE]
            if masked:
                # with specialize=False every live tile pays these G
                # [B, LANE] adds; specialize=True emits a second
                # mask-free pl.when branch for fully-valid tiles,
                # doubling the unrolled program (Mosaic compile cost
                # at TILE_N=4096) to save the adds -- on-hardware A/B
                # via benchmarks/nns_kernel_probe.py --specialize
                w = w + negm[g * _LANE:(g + 1) * _LANE][None, :]
            gc = jnp.int32(g)
            b1 = w > m1
            c2v = jnp.where(b1, m1, w)        # loser of the slot-1 battle
            c2i = jnp.where(b1, a1, gc)
            a1 = jnp.where(b1, gc, a1)
            m1 = jnp.maximum(w, m1)
            b2 = c2v > m2
            c3v = jnp.where(b2, m2, c2v)      # loser of the slot-2 battle
            a2 = jnp.where(b2, c2i, a2)
            m2 = jnp.maximum(c2v, m2)
            m3 = jnp.maximum(m3, c3v)
        off = lane + base
        i1 = a1 * _LANE + off
        i2 = a2 * _LANE + off

        # fold (m1,i1), (m2,i2) into the global per-column top-4 scratch;
        # every displaced/refused value raises the dropped-bound F
        M = [M_ref[s] for s in range(_TOPC)]
        A = [A_ref[s] for s in range(_TOPC)]
        F = jnp.maximum(F_ref[0], m3)
        for v, i in ((m1, i1), (m2, i2)):
            ge = [v > M[s] for s in range(_TOPC)]
            newM = [jnp.where(ge[0], v, M[0])]
            newA = [jnp.where(ge[0], i, A[0])]
            for s in range(1, _TOPC):
                newM.append(jnp.where(ge[s - 1], M[s - 1],
                                      jnp.where(ge[s], v, M[s])))
                newA.append(jnp.where(ge[s - 1], A[s - 1],
                                      jnp.where(ge[s], i, A[s])))
            F = jnp.maximum(F, jnp.where(ge[_TOPC - 1], M[_TOPC - 1], v))
            M, A = newM, newA
        for s in range(_TOPC):
            M_ref[s] = M[s]
            A_ref[s] = A[s]
        F_ref[0] = F

    if specialize:
        # full tiles (entirely below n) skip the per-chunk mask adds;
        # only the single straddling tile runs the masked branch
        @pl.when(base + tile_n <= n)
        def _full_tile():
            do_tile(masked=False)

        @pl.when(jnp.logical_and(base < n, base + tile_n > n))
        def _straddle_tile():
            do_tile(masked=True)
    else:
        @pl.when(base < n)
        def _live_tile():
            do_tile(masked=True)

    @pl.when(t == T - 1)
    def _emit():
        # in-kernel top-k merge over the 4x128 candidates with
        # lax.top_k's exact tie rule (equal values -> ascending index).
        # Duplicate (-inf, lane) padding entries across the 4 slabs are
        # masked together, so they are emitted at most once each.
        M = [M_ref[s] for s in range(_TOPC)]
        A = [A_ref[s] for s in range(_TOPC)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, _LANE), 1)
        outv = jnp.full((B, _LANE), -jnp.inf, jnp.float32)
        outi = jnp.zeros((B, _LANE), jnp.int32)
        imax = jnp.int32(2147483647)
        for j in range(k):
            bv_slab = M[0]
            for s in range(1, _TOPC):
                bv_slab = jnp.maximum(bv_slab, M[s])
            bv = jnp.max(bv_slab, axis=1, keepdims=True)      # [B, 1]
            ieq = jnp.full((B, _LANE), imax, jnp.int32)
            for s in range(_TOPC):
                ieq = jnp.minimum(ieq, jnp.where(M[s] == bv, A[s], imax))
            bi = jnp.min(ieq, axis=1, keepdims=True)          # [B, 1]
            # retire by index alone: a real bank row occupies exactly one
            # scratch slot, so an index collision can only be an -inf
            # init phantom shadowing an emitted index — retire it too
            for s in range(_TOPC):
                hit = A[s] == bi
                M[s] = jnp.where(hit, -jnp.inf, M[s])
                A[s] = jnp.where(hit, imax, A[s])
            write = lane == j
            outv = jnp.where(write, bv, outv)
            outi = jnp.where(write, bi, outi)
        vals_ref[:] = outv
        idx_ref[:] = outi
        flag_ref[:] = F_ref[0]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret", "specialize"))
def cosine_topk_fused2(bank: jax.Array, inv_norms: jax.Array, n: jax.Array,
                       queries: jax.Array, k: int, tile_n: int = TILE_N,
                       interpret: bool = False, specialize: bool = False):
    """Exact cosine top-k via the streaming per-column kernel.

    Drop-in replacement for :func:`cosine_topk_fused` (same contract as
    ``ops.topk.cosine_topk``). This wrapper normalizes the bank rows per
    call — a full bank read+write per dispatch. Throughput callers should
    store UNIT rows (``topk.update_rows_unit``) and call
    :func:`cosine_topk_fused2_pre` directly.
    """
    bank_n = (bank.astype(jnp.float32)
              * inv_norms.astype(jnp.float32)[:, None])
    return cosine_topk_fused2_pre(bank_n, n, queries, k, tile_n=tile_n,
                                  interpret=interpret, specialize=specialize)


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret", "specialize"))
def cosine_topk_fused2_pre(bank_n: jax.Array, n: jax.Array,
                           queries: jax.Array, k: int, tile_n: int = TILE_N,
                           interpret: bool = False,
                           specialize: bool = False):
    """Exact cosine top-k over a bank of L2-NORMALIZED rows.

    Query batches above ``MAX_FUSED2_BATCH`` (512 — the Mosaic compile
    envelope, see the constant's comment) are served as sequential
    <=512-row kernel invocations inside this one jitted program; results
    are concatenated, bit-identical to per-chunk calls.
    """
    B = queries.shape[0]
    if B > MAX_FUSED2_BATCH:
        vals, idxs = [], []
        for lo in range(0, B, MAX_FUSED2_BATCH):
            v, i = _fused2_pre_one(bank_n, n,
                                   queries[lo:lo + MAX_FUSED2_BATCH], k,
                                   tile_n, interpret, specialize)
            vals.append(v)
            idxs.append(i)
        return jnp.concatenate(vals), jnp.concatenate(idxs)
    return _fused2_pre_one(bank_n, n, queries, k, tile_n, interpret,
                           specialize)


def _fused2_pre_one(bank_n: jax.Array, n: jax.Array,
                    queries: jax.Array, k: int, tile_n: int,
                    interpret: bool, specialize: bool):
    """One <=MAX_FUSED2_BATCH kernel invocation (traced under the public
    entry's jit).

    Replaces the reference's O(N) python scan at
    ``cslam/nns_matching.py:42-61``. Exactness: any element the scan
    dropped is bounded above by the emitted flag value F (3rd-of-its-
    tile-column or displaced from a global column top-4); when
    ``F >= k-th value`` — probability ~1e-5/query on non-degenerate
    banks — the whole batch falls back to a full XLA top-k inside
    ``lax.cond``, so results never depend on the collision probability.
    Ties among exactly-equal similarities follow ``lax.top_k``'s
    ascending-index rule (enforced by the in-kernel merge; a dropped
    duplicate tied at the k-th value triggers the fallback via ``>=``).

    bf16 bank tier: if ``bank_n`` is bfloat16 the queries are rounded to
    bfloat16 too and the MXU runs its native bf16 x bf16 -> f32 mode —
    HBM traffic per bank pass halves. Results are the EXACT top-k of the
    bf16-rounded inputs (the similarity matmul, chains, scratch and merge
    all stay f32); relative similarity error vs the f32 bank is ~4e-3,
    far below the detection threshold granularity (0.9 gate).
    """
    assert k <= _LANE
    N, D = bank_n.shape
    assert N % tile_n == 0, f"bank rows {N} must be a multiple of {tile_n}"
    B = queries.shape[0]
    T = N // tile_n

    q_f32 = queries.astype(jnp.float32)
    if bank_n.dtype == jnp.bfloat16:
        queries = q_f32.astype(jnp.bfloat16)
    else:
        queries = q_f32
        bank_n = bank_n.astype(jnp.float32)
    negmask = jnp.where(jnp.arange(N) < n, 0.0,
                        -jnp.inf).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, D), lambda t, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda t, n_ref: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda t, n_ref: (t,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, _LANE), lambda t, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, _LANE), lambda t, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, _LANE), lambda t, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TOPC, B, _LANE), jnp.float32),
            pltpu.VMEM((_TOPC, B, _LANE), jnp.int32),
            pltpu.VMEM((1, B, _LANE), jnp.float32),
        ],
    )

    outv, outi, flag = pl.pallas_call(
        functools.partial(_scan_kernel2, k, specialize),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, _LANE), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D, transcendentals=0,
            bytes_accessed=N * D * 4 + N * 4 + B * D * 4
            + 3 * B * _LANE * 4),
    )(jnp.asarray([n], jnp.int32), queries, bank_n, negmask)

    top_vals = outv[:, :k]
    top_idx = outi[:, :k]
    kth = top_vals[:, k - 1]
    dropped_bound = jnp.max(flag, axis=1)
    need_exact = jnp.any(dropped_bound >= kth)

    def exact_path(_):
        # HIGHEST precision: TPU f32 matmuls default to bf16 passes, and
        # this path fires exactly in near-tie cases — rounded similarities
        # would re-break the tie order the fallback exists to guarantee.
        # (The in-kernel matmul is Mosaic-compiled and not affected.)
        sims = jax.lax.dot_general(
            queries, bank_n,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + negmask[None, :]
        tv, ti = jax.lax.top_k(sims, k)
        return tv, ti

    top_vals, top_idx = jax.lax.cond(
        need_exact, exact_path, lambda _: (top_vals, top_idx), None)
    q_inv = 1.0 / jnp.maximum(jnp.linalg.norm(q_f32, axis=-1), 1e-12)
    return top_vals * q_inv[:, None], top_idx
