"""Native C++ runtime tests (registry hash table + mtx parser).

Reference analogs: tests/hash.c (CRC32 behavior), tests/threadsafety.c
(concurrent registry), the reader used by generator_spgemm CLI.
"""

import concurrent.futures
import os
import tempfile

import numpy as np
import pytest

from xsmm_tpu.core import native_bridge


@pytest.fixture(scope="module")
def lib():
    l = native_bridge.get_lib()
    if l is None:
        pytest.skip("native library not built and no compiler available")
    return l


def test_crc32_stable(lib):
    a = native_bridge.crc32(b"hello world")
    assert a == native_bridge.crc32(b"hello world")
    assert a != native_bridge.crc32(b"hello worlc")
    # crc32c("123456789") == 0xE3069283 (Castagnoli test vector)
    assert native_bridge.crc32(b"123456789") == 0xE3069283


def test_registry_find_insert(lib):
    reg = native_bridge.NativeRegistry(64)
    assert reg.find(b"key1") == -1
    assert reg.insert(b"key1", 7) == 7
    assert reg.find(b"key1") == 7
    assert reg.insert(b"key1", 99) == 7  # first writer wins
    assert len(reg) == 1
    reg.clear()
    assert reg.find(b"key1") == -1


def test_registry_many_keys(lib):
    reg = native_bridge.NativeRegistry(4096)
    keys = [os.urandom(32) for _ in range(1000)]
    for i, k in enumerate(keys):
        assert reg.insert(k, i) == i
    for i, k in enumerate(keys):
        assert reg.find(k) == i
    assert len(reg) == 1000


def test_registry_concurrent(lib):
    """Concurrent insert of the same keys: exactly one winner per key."""
    reg = native_bridge.NativeRegistry(1024)
    keys = [bytes([i]) * 16 for i in range(32)]

    def worker(tid):
        results = {}
        for i, k in enumerate(keys):
            results[k] = reg.insert(k, tid * 100 + i)
        return results

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        all_results = list(ex.map(worker, range(8)))
    for k in keys:
        winners = {r[k] for r in all_results}
        assert len(winners) == 1, f"multiple winners for {k!r}: {winners}"
        assert reg.find(k) in winners
    assert len(reg) == 32


def test_registry_full(lib):
    reg = native_bridge.NativeRegistry(4)  # rounds to 4 slots
    ok = 0
    with pytest.raises(RuntimeError):
        for i in range(100):
            reg.insert(os.urandom(16), i)
            ok += 1
    assert ok >= 3


def test_mtx_native_parse(lib, rng):
    from xsmm_tpu.utils.mtx import read_mtx, write_mtx
    a = np.where(rng.random((40, 30)) < 0.2, rng.standard_normal((40, 30)), 0)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.mtx")
        write_mtx(p, a)
        direct = native_bridge.read_mtx_native(p)
        assert direct is not None
        assert np.allclose(direct, a)
        assert np.allclose(read_mtx(p), a)


def test_python_registry_uses_native():
    from xsmm_tpu.core.config import get_config
    from xsmm_tpu.core.registry import Registry
    if not get_config().use_native:
        pytest.skip("native backend disabled (XSMM_NATIVE=0)")
    reg = Registry(capacity=128)
    if native_bridge.get_lib() is None:
        pytest.skip("no native lib")
    assert reg.info()["native"] is True
    from xsmm_tpu.core.descriptors import GemmDescriptor
    d = GemmDescriptor(m=3, n=3, k=3)
    reg.dispatch(d, lambda: "k")
    reg._tls = __import__("threading").local()  # defeat MRU
    assert reg.lookup(d.pack()) is not None


def test_ell_pack_row_exactly_full():
    """A row whose nonzero count equals the padded width r must keep its
    last value: rejected trailing elements may not clobber slot r-1
    (regression: the blind-store cursor wrote every post-full rejection
    at r-1)."""
    import numpy as np
    from xsmm_tpu.core import native_bridge
    if native_bridge.get_lib() is None or not getattr(
            native_bridge.get_lib(), "xsmm_has_ell", False):
        import pytest
        pytest.skip("native library unavailable")
    a = np.zeros((2, 16), np.float32)
    a[0, :8] = np.arange(1, 9)  # exactly rowmax=8 nonzeros, zeros after
    vals, cols, nnz, r = native_bridge.ell_pack_native(a, 0.0)
    assert r == 8 and nnz == 8
    assert vals[0, 7] == 8.0 and cols[0, 7] == 7
    assert (vals[1] == 0).all() and (cols[1] == 0).all()
