"""xcopy tests (reference: tests/matcopy.c, tests/otrans.c)."""

import numpy as np
import pytest

from xsmm_tpu.ops import xcopy


def test_matcopy_2d(rng):
    x = rng.standard_normal((64, 128)).astype(np.float32)
    y = np.asarray(xcopy.matcopy(x))
    assert np.array_equal(x, y)


def test_matcopy_large_aligned(rng):
    x = rng.standard_normal((1024, 256)).astype(np.float32)
    assert np.array_equal(x, np.asarray(xcopy.matcopy(x)))


def test_matcopy_odd_shape(rng):
    x = rng.standard_normal((23, 37)).astype(np.float32)
    assert np.array_equal(x, np.asarray(xcopy.matcopy(x)))


def test_matcopy_batched(rng):
    x = rng.standard_normal((4, 16, 32)).astype(np.float32)
    assert np.array_equal(x, np.asarray(xcopy.matcopy(x)))


def test_matcopy_zero(rng):
    x = rng.standard_normal((8, 16)).astype(np.float32)
    z = np.asarray(xcopy.matcopy(x, zero=True))
    assert z.shape == (8, 16)
    assert not z.any()


def test_otrans_2d(rng):
    x = rng.standard_normal((48, 96)).astype(np.float32)
    y = np.asarray(xcopy.otrans(x))
    assert np.array_equal(x.T, y)


def test_otrans_tiled_path(rng):
    # below the 512x512 Pallas gate -> XLA fallback path
    x = rng.standard_normal((512, 256)).astype(np.float32)
    assert np.array_equal(x.T, np.asarray(xcopy.otrans(x)))


def test_otrans_pallas_divisible(rng):
    # both dims >= the 512 tile, exact multiples -> tiled Pallas kernel
    x = rng.standard_normal((1024, 512)).astype(np.float32)
    assert np.array_equal(x.T, np.asarray(xcopy.otrans(x)))


def test_otrans_pallas_ragged(rng):
    # both dims >= 512 and NON-divisible -> ragged Pallas grid with masked
    # edge blocks (regression: this route previously had zero coverage)
    x = rng.standard_normal((520, 516)).astype(np.float32)
    assert np.array_equal(x.T, np.asarray(xcopy.otrans(x)))


def test_otrans_batched(rng):
    x = rng.standard_normal((3, 17, 29)).astype(np.float32)
    y = np.asarray(xcopy.otrans(x))
    assert np.array_equal(np.swapaxes(x, -1, -2), y)


def test_itrans(rng):
    x = rng.standard_normal((31, 15)).astype(np.float32)
    assert np.array_equal(x.T, np.asarray(xcopy.itrans(x)))


def test_dispatch_cached():
    k1 = xcopy.trans_dispatch(8, 8)
    k2 = xcopy.trans_dispatch(8, 8)
    assert k1 is k2


def test_matcopy_wide_rows_fallback(rng):
    """Rows too wide to tile under the VMEM cap route to XLA's copy."""
    x = rng.standard_normal((8, 1 << 17)).astype(np.float32)  # 512KB rows
    out = np.asarray(xcopy.matcopy(x))
    np.testing.assert_array_equal(out, x)
