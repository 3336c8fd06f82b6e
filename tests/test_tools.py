"""Generator-CLI analog tests (libxsmm_gemm_generator driver)."""

import os
import tempfile

import numpy as np
import pytest

from xsmm_tpu.tools.generator import generate_gemm, generate_spgemm, main
from xsmm_tpu.utils.mtx import write_mtx


def test_gemm_compiled_mode():
    out = generate_gemm(8, 8, 8, batch=256, code_type="compiled")
    assert "compiled gemm_float32_8x8x8_b256" in out


def test_gemm_text_modes():
    hlo = generate_gemm(8, 8, 8, batch=256, code_type="hlo")
    assert "custom-call" in hlo or "fusion" in hlo  # pallas or XLA path
    shlo = generate_gemm(8, 8, 8, batch=256, code_type="stablehlo")
    assert "module" in shlo and "func" in shlo


def test_spgemm_from_mtx():
    rng = np.random.default_rng(0)
    a = np.zeros((12, 16))
    a[rng.integers(0, 12, 20), rng.integers(0, 16, 20)] = \
        rng.standard_normal(20)
    p = os.path.join(tempfile.mkdtemp(), "op.mtx")
    write_mtx(p, a)
    out = generate_spgemm(p, 512, code_type="compiled")
    assert "spgemm" in out and "512" in out


def test_cli_main(tmp_path, capsys):
    out_file = str(tmp_path / "kern.txt")
    rc = main(["gemm", "8", "8", "8", "--batch", "256",
               "--code-type", "stablehlo", "--out", out_file])
    assert rc == 0
    assert os.path.getsize(out_file) > 100


def test_mnk_utilities():
    """scripts/libxsmm_utilities.py analog (tools/mnk.py)."""
    from xsmm_tpu.tools import mnk

    s = mnk.parse_mnk("2 3, 5")
    assert (2, 3, 2) in s and (3, 3, 3) in s and (5, 5, 5) in s
    assert (2, 5, 2) not in s  # cross products stay within groups

    axes = mnk.parse_axes("2 4", "3", "")
    assert (2, 3, 2) in axes and (4, 3, 4) in axes

    idx = mnk.parse_indexes("2_3_4 23_23_23")
    assert idx == {(2, 3, 4), (23, 23, 23)}

    small = mnk.threshold_filter({(23, 23, 23), (100, 100, 100)})
    assert small == [(23, 23, 23)]

    spec = mnk.to_aot_shapes([(23, 23, 23)], dtype="float64", batch=512)
    assert spec == "23x23x23:float64:512"
    # round-trips through the init-time AOT parser format
    parts = spec.split(":")
    m, n, k = (int(x) for x in parts[0].split("x"))
    assert (m, n, k) == (23, 23, 23) and parts[1] == "float64"
