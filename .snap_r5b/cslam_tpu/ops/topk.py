"""Batched cosine top-k search over padded, HBM-resident descriptor banks.

This replaces the reference's per-item Python cosine loop
(``cslam/nns_matching.py:42-61`` — "searching from 100000 items consume
30ms") with a single MXU matmul over the whole bank followed by an on-device
``lax.top_k``. Banks are fixed-capacity padded arrays (capacity tiers double,
mirroring the reference's array doubling at ``nns_matching.py:31-37``) so
every capacity tier compiles exactly once.

Key numeric property preserved (tested by the reference at
``tests/test_sparse_matching.py:51-81``): for L2-normalized vectors, cosine
similarity ordering equals euclidean-distance ordering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=())
def cosine_topk(bank: jax.Array, inv_norms: jax.Array, n: jax.Array,
                queries: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine similarity of each query against the first ``n`` bank rows.

    Args:
        bank: ``[capacity, dim]`` float32 descriptor bank (rows >= n are padding).
        inv_norms: ``[capacity]`` float32 precomputed ``1/max(||row||, eps)``.
        n: scalar int32, number of valid rows.
        queries: ``[B, dim]`` float32 query descriptors.
        k: static number of neighbors to return (``k <= capacity``).

    Returns:
        (sims, idx): ``[B, k]`` similarities (descending) and row indices.
        Entries beyond ``n`` valid rows carry similarity ``-inf``.
    """
    bank = bank.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    # One big MXU matmul: [B, dim] x [dim, capacity].
    dots = jax.lax.dot_general(
        queries, bank,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    q_inv = 1.0 / jnp.maximum(jnp.linalg.norm(queries, axis=-1), _EPS)
    sims = dots * inv_norms[None, :] * q_inv[:, None]
    valid = jnp.arange(bank.shape[0], dtype=jnp.int32)[None, :] < n
    sims = jnp.where(valid, sims, -jnp.inf)
    return jax.lax.top_k(sims, k)


@jax.jit
def update_rows(bank: jax.Array, inv_norms: jax.Array, rows: jax.Array,
                start: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Write a chunk of new descriptor rows at ``start`` (device-side append).

    Host inserts are O(1) numpy appends; the device mirror catches up in
    chunks right before a search, so per-keyframe ingest never blocks on a
    device transfer.
    """
    rows = rows.astype(jnp.float32)
    new_bank = jax.lax.dynamic_update_slice(bank, rows, (start, 0))
    inv = 1.0 / jnp.maximum(jnp.linalg.norm(rows, axis=-1), _EPS)
    new_inv = jax.lax.dynamic_update_slice(inv_norms, inv, (start,))
    return new_bank, new_inv


@jax.jit
def update_rows_unit(bank: jax.Array, rows: jax.Array,
                     start: jax.Array) -> jax.Array:
    """Write new rows L2-normalized (device-side append of UNIT rows).

    Storing unit rows lets the streaming Pallas kernel
    (``nns_pallas.cosine_topk_fused2_pre``) skip the per-dispatch
    ``bank * inv_norms`` rewrite — a full extra bank read+write per
    search that measured ~60us/batch inside the bench scan. The matching
    ``inv_norms`` for the XLA paths is simply all-ones.

    Rows are normalized in f32 and stored in the bank's dtype — a
    bfloat16 bank halves the kernel's HBM traffic per search pass.
    """
    rows = rows.astype(jnp.float32)
    inv = 1.0 / jnp.maximum(jnp.linalg.norm(rows, axis=-1, keepdims=True),
                            _EPS)
    return jax.lax.dynamic_update_slice(
        bank, (rows * inv).astype(bank.dtype), (start, 0))


@jax.jit
def cosine_top1_multi(banks: jax.Array, inv_norms: jax.Array, ns: jax.Array,
                      query: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Best match of ONE query against R stacked banks in one dispatch.

    The detection front end matches each new local descriptor against every
    other robot's bank (reference ``loop_closure_sparse_matching.py:36-54``)
    — one search per bank is one device round-trip each; stacking the
    same-capacity banks makes it a single batched einsum + argmax.

    Args:
        banks: ``[R, capacity, dim]`` stacked banks.
        inv_norms: ``[R, capacity]``.
        ns: ``[R]`` int32 valid-row counts (0 allowed; its sim is ``-inf``).
        query: ``[dim]`` descriptor.

    Returns:
        (sims, idx): ``[R]`` best similarity and row index per bank.
    """
    banks = banks.astype(jnp.float32)
    query = query.astype(jnp.float32)
    q_inv = 1.0 / jnp.maximum(jnp.linalg.norm(query), _EPS)
    dots = jnp.einsum("rcd,d->rc", banks, query,
                      preferred_element_type=jnp.float32)
    sims = dots * inv_norms * q_inv
    valid = (jnp.arange(banks.shape[1], dtype=jnp.int32)[None, :]
             < ns[:, None])
    sims = jnp.where(valid, sims, -jnp.inf)
    return jnp.max(sims, axis=1), jnp.argmax(sims, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def euclidean_topk(bank: jax.Array, sq_norms: jax.Array, n: jax.Array,
                   queries: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k *smallest* euclidean distances (returned as negated distances).

    Used by the ScanContext ring-key shortlist stage, which the reference
    implements with a host KDTree (``cslam/lidar_pr/scancontext_matching.py:59-65``).
    ``||q - b||^2 = ||q||^2 - 2 q.b + ||b||^2``; we drop the query norm since
    it does not affect ordering.
    """
    bank = bank.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    dots = jax.lax.dot_general(
        queries, bank,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    neg_sq_dist = 2.0 * dots - sq_norms[None, :]
    valid = jnp.arange(bank.shape[0], dtype=jnp.int32)[None, :] < n
    neg_sq_dist = jnp.where(valid, neg_sq_dist, -jnp.inf)
    return jax.lax.top_k(neg_sq_dist, k)
