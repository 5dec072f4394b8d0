"""Tests for the learned device/host cost-model split (chain.c:80-111,
chain_hardware.cpp:54-92 semantics) and the task-size feature precompute."""
import numpy as np
import pytest

from mm2tpu.mapping import costmodel
from mm2tpu.mapping.costmodel import (CostModel, DeviceQueue,
                                      fit_cost_model)
from mm2tpu.mapping.chain import ChainRouter
from mm2tpu.ops.chain_ref import (MAX_TRIPCOUNT, TRIPCOUNT_PER_SUBPART,
                                  num_subparts)


def _task(n, density, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.sort(rng.integers(0, int(n / density), n)).astype(np.uint64)
    a = np.zeros((n, 2), np.uint64)
    a[:, 0] = lo
    a[:, 1] = np.uint64(15) << np.uint64(32)
    return a


def _num_subparts_loop(a, max_dist_x):
    """The reference's incremental formulation (chain.c:62-78), as the
    oracle for the vectorized version."""
    n = len(a)
    ax = (a[:, 0] ^ np.uint64(1 << 63)).astype(np.int64)
    sub = np.zeros(n, np.uint8)
    tot_s = tot_t = 0
    st = 0
    for i in range(n):
        while st < i and ax[i] > ax[st] + max_dist_x:
            st += 1
        tc = min(i - st, MAX_TRIPCOUNT)
        tot_t += tc
        s = tc // TRIPCOUNT_PER_SUBPART
        if tc == 0 or tc % TRIPCOUNT_PER_SUBPART > 0:
            s += 1
        sub[i] = s
        tot_s += s
    return sub, tot_s, tot_t


@pytest.mark.parametrize("n,density", [(100, 0.5), (3000, 0.05),
                                       (3000, 1.0), (5000, 0.3)])
def test_num_subparts_matches_reference_loop(n, density):
    a = _task(n, density, seed=n)
    got = num_subparts(a, 5000)
    want = _num_subparts_loop(a, 5000)
    np.testing.assert_array_equal(got[0], want[0])
    assert got[1:] == want[1:]


def test_fit_recovers_constants():
    rng = np.random.default_rng(1)
    true = CostModel(k1_dev=3e-4, k2_dev=1.2e-5, c_dev=0.32,
                     k_host=5e-6, c_host=0.1)
    rows = []
    for _ in range(50):
        n = int(rng.integers(500, 50000))
        sub = int(n * rng.uniform(1, 8))
        trip = int(n * rng.uniform(10, 900))
        rows.append((n, sub, trip, true.predict_dev(n, sub),
                     true.predict_host(trip)))
    fit = fit_cost_model(rows)
    assert abs(fit.k1_dev - true.k1_dev) < 1e-6
    assert abs(fit.k_host - true.k_host) < 1e-9
    assert abs(fit.c_host - true.c_host) < 1e-3


def test_cost_model_roundtrip(tmp_path):
    m = CostModel(1e-4, 2e-5, 0.3, 5e-6, -1.0)
    p = tmp_path / "params.json"
    m.save(str(p))
    assert CostModel.load(str(p)) == m


def test_device_queue_admission():
    clock = [0.0]
    q = DeviceQueue(clock=lambda: clock[0])
    # device much faster: admit, queue extends
    assert q.admit(t_dev_ms=10.0, t_host_ms=100.0)
    assert q.wait_ms() == pytest.approx(10.0)
    # second task: wait 10 + dev 10 < host 100 -> admit again
    assert q.admit(t_dev_ms=10.0, t_host_ms=100.0)
    # now a task whose host time beats queue-wait + dev time -> refuse
    assert not q.admit(t_dev_ms=10.0, t_host_ms=25.0)
    # time passes; the queue drains and the same task is admitted
    clock[0] = 0.02
    assert q.admit(t_dev_ms=10.0, t_host_ms=25.0)


def test_router_uses_cost_model():
    # model that makes the device always win big tasks, lose small ones
    m = CostModel(k1_dev=0.0, k2_dev=0.0, c_dev=0.5,
                  k_host=1e-3, c_host=0.0)  # host 1ms per 1000 trips
    clock = [0.0]
    q = DeviceQueue(clock=lambda: clock[0])
    r = ChainRouter("auto", cost_model=m, queue=q)
    dense = _task(4096, 1.0, seed=2)   # large windows -> many trips
    sparse = _task(64, 0.001, seed=3)  # nearly no predecessors in range
    assert r.pick(len(dense), a=dense, max_dist_x=5000) == "tpu"
    assert r.pick(len(sparse), a=sparse, max_dist_x=5000) == "native"


def test_router_falls_back_when_device_busy():
    m = CostModel(0.0, 0.0, 10.0, 1e-3, 0.0)
    clock = [0.0]
    q = DeviceQueue(clock=lambda: clock[0])
    r = ChainRouter("auto", cost_model=m, queue=q)
    a = _task(4096, 1.0, seed=4)
    assert r.pick(len(a), a=a, max_dist_x=5000) == "tpu"
    # saturate the queue far beyond any host prediction
    for _ in range(3):
        assert q.admit(1e7, 1e9)
    assert r.pick(len(a), a=a, max_dist_x=5000) == "native"


def test_router_threshold_without_model():
    """Static threshold applies only once a backend is actually up
    (costmodel.backend_ready): a host-capable task must never block on
    accelerator init — until then everything places on host."""
    r = ChainRouter("auto", tpu_min_anchors=1000, cost_model=False or None)
    # ensure no global default model interferes
    r.cost_model = None
    if not costmodel.backend_ready():
        assert r.pick(2000) == "native"  # backend down: degraded mode
    import jax
    jax.numpy.zeros(1).block_until_ready()  # initialize the CPU backend
    assert costmodel.backend_ready()
    assert r.pick(2000) == "tpu"
    assert r.pick(10) == "native"


def test_shipped_router_constants_load():
    """The in-tree trained constants (data/router_params_v5e.json, the
    chain_hardware.h:18-30 analogue) parse and order sanely: a tiny task
    must predict host-faster (c_dev dispatch floor dominates)."""
    import pathlib
    p = (pathlib.Path(__file__).resolve().parent.parent / "mm2tpu" /
         "data" / "router_params_v5e.json")
    m = CostModel.load(str(p))
    assert m.c_dev > 0
    assert m.predict_dev(512, 512) > m.predict_host(512 * 64)


def test_default_model_loads_without_jax_but_gates_on_device():
    """The default constants load from JSON with no jax dependency
    (placement intent must not pay device init), and a router built on
    them never routes to the device unless a REAL accelerator backend is
    up (costmodel.device_ready) — on the CPU test backend every task
    stays native regardless of predictions."""
    import mm2tpu.mapping.costmodel as cm
    saved = dict(cm._DEFAULT_MODELS)
    saved_forced = (cm._FORCED_MODEL, cm._FORCED)
    cm._DEFAULT_MODELS.clear()
    cm._FORCED_MODEL, cm._FORCED = None, False
    try:
        m = cm.get_default_model()
        assert m is not None and m.c_dev > 0
        assert cm.get_default_model("asm20") is not None
        r = ChainRouter("auto")
        assert r._default_model
        # CPU backend (tests force JAX_PLATFORMS=cpu): device never ready
        assert not cm.device_ready()
        huge = _task(200000, 1.0, seed=7)
        assert r.pick(len(huge), a=huge, max_dist_x=5000) == "native"
    finally:
        cm._DEFAULT_MODELS.clear()
        cm._DEFAULT_MODELS.update(saved)
        cm._FORCED_MODEL, cm._FORCED = saved_forced


def test_router_feasibility_short_circuit():
    """The precomputed feasibility bound must agree with the model's own
    physics: below it the device cannot win even at the densest window
    (MAX_TRIPCOUNT trips/anchor), at/above it the full comparison runs.
    A floor-free model keeps the full comparison path."""
    r = ChainRouter("auto")
    m = r.cost_model
    if m is not None and r._default_model and r._n_min_dev < float("inf"):
        # at the bound with saturated trips, predicted times cross over
        nb = r._n_min_dev
        s_min = 1 if m.k2_dev >= 0 else 1024 // 128
        t_dev = m.predict_dev(nb, s_min * nb)
        t_host = m.predict_host(1024 * nb)
        assert abs(t_dev - t_host) <= 1e-6 * max(abs(t_dev), 1.0)
        # just below the bound the device strictly loses
        assert m.predict_dev(nb * 0.9, s_min * nb * 0.9) \
            > m.predict_host(1024 * nb * 0.9)
    free = CostModel(k1_dev=0.0, k2_dev=0.0, c_dev=0.0,
                     k_host=1e-3, c_host=0.0)
    r2 = ChainRouter("auto", cost_model=free)
    assert r2._n_min_dev == 0.0


def test_fit_respects_physical_constraints():
    """A collinear (n, subparts) design must not push the dispatch floor
    into the slopes: the fitter bounds k1_dev, k2_dev, k_host >= 0 and
    c_dev >= the measured dispatch floor (VERDICT r4: the unconstrained
    asm fit produced c_dev = 0.2 us and k2_dev < 0)."""
    rng = np.random.default_rng(1)
    rows = []
    for n in (512, 1024, 2048, 4096, 8192, 16384):
        sub = n * 7.9  # nearly collinear with n, like dense asm tasks
        trip = n * 900.0
        dev = 60.0 + 2.5e-3 * n + rng.normal(0, 0.5)
        hostt = 1.0 + 9e-7 * trip + rng.normal(0, 0.05)
        rows.append((n, sub, trip, dev, hostt))
    floor = 0.9 * min(r[3] for r in rows)  # trainer-measured tiny launch
    m = fit_cost_model(rows, floor_dev_ms=floor)
    assert m.k1_dev >= 0 and m.k2_dev >= 0 and m.k_host >= 0
    assert m.c_dev >= floor
    # and the fit still predicts the data well
    for n, sub, trip, dev, hostt in rows:
        assert abs(m.predict_dev(n, sub) - dev) < 0.3 * dev


def test_shipped_regime_files_are_physical():
    """Every shipped per-regime constant file (the analogue of the
    reference's two pasted-in sets, chain_hardware.h:18-30) must satisfy
    dispatch-floor physics: a device call cannot finish in under the
    launch round-trip, and bigger tasks are never faster."""
    import glob
    import os
    import mm2tpu
    files = glob.glob(os.path.join(
        os.path.dirname(mm2tpu.__file__), "data", "router_params*.json"))
    assert files, "no shipped router constant files found"
    for f in files:
        m = CostModel.load(f)
        assert m.k1_dev >= 0, f
        assert m.k2_dev >= 0, f
        assert m.k_host > 0, f
        # dispatch floor: even a PCIe-attached accelerator needs ~100 us;
        # this tunnel measures ~tens of ms. 0.05 ms is a generous lower
        # bound that still rejects the degenerate 0.2 us fit.
        assert m.c_dev >= 0.05, (f, m.c_dev)


def test_bounded_lstsq_fallback_matches_scipy(monkeypatch):
    """The no-scipy active-set fallback must agree with scipy's
    lsq_linear on the fit shapes the trainer produces (scipy is not a
    declared dependency; a clean install still needs working fits)."""
    import builtins

    from mm2tpu.mapping.costmodel import _bounded_lstsq

    rng = np.random.default_rng(4)
    A = np.stack([np.arange(12.0) * 97, np.arange(12.0) * 791,
                  np.ones(12)], 1)
    y = A @ np.array([2.5e-3, 0.0, 60.0]) + rng.normal(0, 0.3, 12)
    lo = np.array([0.0, 0.0, 55.0])
    want = _bounded_lstsq(A, y, lo)

    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError("scipy unavailable")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_scipy)
    got = _bounded_lstsq(A, y, lo)
    assert np.allclose(want, got, rtol=1e-6, atol=1e-8)
