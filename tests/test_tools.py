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
