"""Index-sharded mesh probe (parallel/mesh.py::sharded_probe_step):
range-partitioned CSR keys over the 8-device virtual mesh, all-gathered
queries, reduce-scattered hits — parity vs the host index lookup
(SURVEY §5's 'host-sharded with all-gather of candidate hits' layout for
ava-*/HBM-overflow indexes; reference's only sharded computation is the
split-index merge, map.c:469-524)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mm2tpu.index.build import build_index
from mm2tpu.parallel.mesh import (make_mesh, shard_index_arrays,
                                  sharded_probe_step)


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(11)
    genome = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 50000)])
    return build_index(["c0"], [genome], w=10, k=15)


def _mesh8():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8
    return make_mesh(8, devices=cpus)


def test_sharded_probe_matches_host(small_index):
    mi = small_index
    mesh = _mesh8()
    khi, klo, start, cnt, ranges = shard_index_arrays(
        mi.keys, mi.start, mi.cnt, mesh.size)
    assert len(khi) % mesh.size == 0
    assert ranges[0][0] == 0 and ranges[-1][1] == len(mi.keys)

    rng = np.random.default_rng(12)
    B, M = 16, 64
    # half real keys, half misses
    q = mi.keys[rng.integers(0, len(mi.keys), (B, M))].copy()
    miss_mask = rng.random((B, M)) < 0.5
    q[miss_mask] = rng.integers(2**33, 2**34, int(miss_mask.sum()),
                                dtype=np.uint64)
    from mm2tpu.parallel.mesh import split_keys
    qhi, qlo = split_keys(q)

    step = sharded_probe_step(mesh)
    s_dev, c_dev = step(khi, klo, start, cnt, qhi, qlo)
    s_dev, c_dev = np.asarray(s_dev), np.asarray(c_dev)

    s_host, c_host = mi.get_many(q.reshape(-1))
    s_host = s_host.reshape(B, M)
    c_host = c_host.reshape(B, M)
    assert np.array_equal(c_dev, c_host)
    # start is only meaningful on hits
    assert np.array_equal(s_dev[c_host > 0], s_host[c_host > 0])


def test_sharded_probe_vs_replicated(small_index):
    """The sharded layout must agree with the replicated device probe
    (the VERIFY_OUTPUT differential pattern, chain.c:244-262)."""
    from mm2tpu.parallel.mesh import lookup_index_device, split_keys
    mi = small_index
    mesh = _mesh8()
    khi_s, klo_s, start_s, cnt_s, _ = shard_index_arrays(
        mi.keys, mi.start, mi.cnt, mesh.size)
    rng = np.random.default_rng(13)
    B, M = 8, 32
    q = mi.keys[rng.integers(0, len(mi.keys), (B, M))]
    qhi, qlo = split_keys(q)
    step = sharded_probe_step(mesh)
    s_dev, c_dev = step(khi_s, klo_s, start_s, cnt_s, qhi, qlo)

    khi, klo = split_keys(mi.keys)
    s_rep, c_rep = lookup_index_device(
        np.asarray(khi), np.asarray(klo),
        mi.start.astype(np.int32), mi.cnt.astype(np.int32),
        qhi.reshape(-1), qlo.reshape(-1))
    assert np.array_equal(np.asarray(c_dev).reshape(-1), np.asarray(c_rep))
    assert np.array_equal(np.asarray(s_dev).reshape(-1), np.asarray(s_rep))
