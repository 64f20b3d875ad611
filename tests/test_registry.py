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
