"""Mesh-sharded descriptor bank tests (8 virtual CPU devices)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cslam_tpu.matching.mesh_banks import AXIS, MeshDescriptorBanks
from cslam_tpu.matching.nns_bank import DescriptorBank


def make_mesh(n=8):
    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devices[:n]), (AXIS,))


def test_sharded_search_matches_single_device_banks():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    nb_robots, dim = 8, 32
    mesh_banks = MeshDescriptorBanks(mesh, nb_robots, dim, capacity=128, k=4)
    plain_banks = [DescriptorBank() for _ in range(nb_robots)]

    for rid in range(nb_robots):
        n = 20 + 5 * rid
        vecs = rng.random((n, dim)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        mesh_banks.add_items(rid, vecs, list(range(n)))
        plain_banks[rid].add_items(vecs, list(range(n)))

    queries = rng.random((5, dim)).astype(np.float32)
    sims, idx = mesh_banks.search_all(queries)
    assert sims.shape == (8, 5, 4)
    for rid in range(nb_robots):
        ps, pi = plain_banks[rid].search_batch(queries, 4)
        np.testing.assert_allclose(sims[rid], ps, rtol=1e-5)
        np.testing.assert_array_equal(idx[rid], pi)


def test_search_best_others_pattern():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    banks = MeshDescriptorBanks(mesh, 3, 16, capacity=64, k=2)
    target = rng.random(16)
    target /= np.linalg.norm(target)
    banks.add_item(1, target, "hit")
    noise = rng.random((4, 16))
    banks.add_items(2, noise / np.linalg.norm(noise, axis=1, keepdims=True),
                    list("abcd"))

    results = banks.search_best_others(0, target)
    by_rid = {r: (item, sim) for r, item, sim in results}
    assert by_rid[1][0] == "hit"
    assert by_rid[1][1] == pytest.approx(1.0, abs=1e-5)
    assert 0 not in by_rid  # own bank excluded


def test_empty_shard_reports_minus_inf():
    mesh = make_mesh()
    banks = MeshDescriptorBanks(mesh, 8, 8, capacity=16, k=2)
    banks.add_item(0, np.ones(8), 0)
    sims, _ = banks.search_all(np.ones((1, 8)))
    assert np.isneginf(sims[3]).all()  # robot 3 has no entries
    assert sims[0, 0, 0] == pytest.approx(1.0, abs=1e-5)
