"""matdiff harness tests (reference: tests/matdiff.c, src/libxsmm_math.c:48)."""

import numpy as np
import pytest

from xsmm_tpu.utils.matdiff import check, matdiff


def test_identical_is_zero(rng):
    a = rng.standard_normal((17, 31))
    info = matdiff(a, a)
    assert info.normf_rel == 0.0
    assert info.linf_abs == 0.0
    assert info.ok()


def test_known_difference():
    ref = np.eye(4)
    tst = ref.copy()
    tst[2, 3] = 1e-2
    info = matdiff(ref, tst)
    assert info.i == 2 and info.j == 3
    assert info.linf_abs == pytest.approx(1e-2)
    # normf_rel = 1e-2 / ||I||_F = 1e-2 / 2
    assert info.normf_rel == pytest.approx(5e-3)
    assert not info.ok(1e-3)


def test_gate(rng):
    a = rng.standard_normal((23, 23))
    b = a + 1e-7 * rng.standard_normal((23, 23))
    check(a, b)  # passes
    with pytest.raises(AssertionError):
        check(a, a + 0.1 * rng.standard_normal((23, 23)))


def test_shape_mismatch():
    with pytest.raises(ValueError):
        matdiff(np.zeros((2, 2)), np.zeros((3, 3)))


def test_batched_3d(rng):
    a = rng.standard_normal((5, 7, 9))
    info = matdiff(a, a + 1e-9)
    assert info.ok()
