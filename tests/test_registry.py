"""Registry / dispatch-cache tests.

Models the reference's tests/threadsafety.c (same descriptor from many
threads -> same kernel object) and tests/registry.c (user key-value
registry), SURVEY.md §4.1.
"""

import concurrent.futures

import libxsmm_tpu as xt
from libxsmm_tpu.registry import Kernel, KernelInfo, Registry


def _builder(desc):
    return Kernel(fn=lambda: desc, descriptor=desc,
                  info=KernelInfo(kind="test"), name=str(desc))


def test_dispatch_caches():
    reg = Registry()
    k1 = reg.dispatch(("a", 1), _builder)
    k2 = reg.dispatch(("a", 1), _builder)
    assert k1 is k2
    k3 = reg.dispatch(("a", 2), _builder)
    assert k3 is not k1
    info = reg.get_registry_info()
    assert info["nkernels"] == 2
    assert info["hits"] == 1
    assert info["builds"] == 2


def test_dispatch_threadsafe():
    reg = Registry()
    descs = [("d", i % 7) for i in range(256)]
    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
        kernels = list(ex.map(lambda d: reg.dispatch(d, _builder), descs))
    # identical descriptors must resolve to the identical kernel object
    by_desc = {}
    for d, k in zip(descs, kernels):
        by_desc.setdefault(d, k)
        assert by_desc[d] is k
    assert reg.get_registry_info()["nkernels"] == 7


def test_release():
    reg = Registry()
    reg.dispatch(("x",), _builder)
    reg.release(("x",))
    assert reg.get_registry_info()["nkernels"] == 0


def test_user_registry_roundtrip():
    reg = Registry()
    reg.xregister(b"key1", {"v": 42})
    assert reg.xdispatch(b"key1") == {"v": 42}
    assert reg.xdispatch(b"missing") is None
    # duplicate registration is an error (libxsmm returns NULL/ error)
    try:
        reg.xregister(b"key1", 0)
        assert False, "expected KeyError"
    except KeyError:
        pass
    items = dict(reg.items())
    assert items == {b"key1": {"v": 42}}
    reg.xrelease(b"key1")
    assert reg.xdispatch(b"key1") is None


def test_global_api():
    xt.init()
    xt.xregister(b"gk", 7)
    assert xt.xdispatch(b"gk") == 7
    xt.xrelease(b"gk")
    info = xt.get_registry_info()
    assert info["capacity"] == 131072


def test_registry_lru_eviction():
    """Opt-in LRU eviction at capacity (XSMM_TPU_REGISTRY_EVICT):
    least-recently-dispatched kernels are evicted first, and hits refresh
    recency."""
    from libxsmm_tpu.config import CONFIG
    from libxsmm_tpu.registry import Kernel, KernelInfo, Registry

    old_cap, old_evict = CONFIG.registry_capacity, CONFIG.registry_evict
    CONFIG.registry_capacity, CONFIG.registry_evict = 3, True
    try:
        reg = Registry()

        def build(key):
            return Kernel(fn=lambda: key, descriptor=key,
                          info=KernelInfo(kind="test"), name=str(key))

        for key in ("a", "b", "c"):
            reg.dispatch(key, build)
        reg.dispatch("a", build)            # refresh 'a'
        reg.dispatch("d", build)            # evicts 'b' (LRU), not 'a'
        info = reg.get_registry_info()
        assert info["evictions"] == 1 and info["nkernels"] == 3
        hits0 = info["hits"]
        reg.dispatch("a", build)            # still cached
        reg.dispatch("c", build)
        assert reg.get_registry_info()["hits"] == hits0 + 2
        reg.dispatch("b", build)            # rebuilt (was evicted)
        assert reg.get_registry_info()["evictions"] == 2
    finally:
        CONFIG.registry_capacity, CONFIG.registry_evict = old_cap, old_evict


def test_dispatch_trace(tmp_path, monkeypatch):
    """XSMM_TPU_TRACE=<file>: dispatch-level call tracing (the reference's
    libxsmm_trace function-entry analogue, src/libxsmm_trace.c:106-111 —
    the meaningful call boundary on this stack is the dispatch)."""
    import importlib

    from libxsmm_tpu.utils import trace as tr
    import libxsmm_tpu as xt
    from libxsmm_tpu.descriptor import GemmFlags, GemmShape

    path = tmp_path / "trace.log"
    monkeypatch.setenv("XSMM_TPU_TRACE", str(path))
    monkeypatch.setattr(tr, "_TRACE_SINK", None)   # re-resolve the sink
    shape = GemmShape(19, 17, 13)
    xt.dispatch_gemm(shape, GemmFlags.BETA_0)      # build
    xt.dispatch_gemm(shape, GemmFlags.BETA_0)      # hit
    monkeypatch.setattr(tr, "_TRACE_SINK", None)
    txt = path.read_text()
    assert "dispatch_build" in txt and "build_ms=" in txt
    assert "dispatch_hit" in txt
    assert "xsmm_trace" in txt
