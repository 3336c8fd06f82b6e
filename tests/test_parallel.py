"""Multi-device tests on the 8-way virtual CPU mesh.

The analog of the reference's noarch/cross-ISA trick for distribution
(SURVEY.md §4): validate sharding + collectives without N real chips.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import xsmm_tpu as xt
from xsmm_tpu.parallel.mesh import make_mesh
from xsmm_tpu.parallel import dist_spmm


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh((1, 8), ("dp", "mp"))


def test_mesh_shapes():
    m = make_mesh((2, 4), ("dp", "mp"))
    assert m.shape == {"dp": 2, "mp": 4}
    m2 = make_mesh((-1, 2), ("dp", "mp"))
    assert m2.shape["dp"] * m2.shape["mp"] == len(jax.devices())


def test_mesh_bad_shape():
    with pytest.raises(ValueError):
        make_mesh((3, 3), ("dp", "mp"))


def test_ring_spmm_matches_gold(rng, mesh8):
    m, k, n = 64, 64, 96
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    fn = dist_spmm.ring_spmm(mesh8)
    a_s = dist_spmm.shard_rows(mesh8, a)
    b_s = dist_spmm.shard_rows(mesh8, b)
    c = np.asarray(fn(a_s, b_s))
    xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64), c, 1e-3,
             what="ring spmm 8 devices")


def test_ring_spmm_sparse_operator(rng, mesh8):
    """Row-partitioned sparse operator (densified) x dense B over the ring."""
    m, k, n = 48, 64, 128
    a = np.where(rng.random((m, k)) < 0.15,
                 rng.standard_normal((m, k)), 0.0).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    fn = dist_spmm.ring_spmm(mesh8)
    c = np.asarray(fn(dist_spmm.shard_rows(mesh8, a),
                      dist_spmm.shard_rows(mesh8, b)))
    xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64),
             c[:m], 1e-3)


def test_ring_spmm_csr_unrolled(rng, mesh8):
    """The ring running the library's own trace-unrolled CSR kernels per
    block (VERDICT r1 #2): f32 and f64 against numpy gold, with M/K not
    multiples of the ring size."""
    m, k, n = 52, 44, 256
    a = np.where(rng.random((m, k)) < 0.15,
                 rng.standard_normal((m, k)), 0.0)
    b = rng.standard_normal((k, n))
    gold = a @ b
    d = 8
    kl = -(-k // d)
    bp = np.zeros((kl * d, n))
    bp[:k] = b

    fn = dist_spmm.ring_spmm_csr(mesh8, a.astype(np.float32), n,
                                 dtype="float32", strategy="unroll")
    c = np.asarray(fn(dist_spmm.shard_rows(
        mesh8, jnp.asarray(bp, jnp.float32))))[:m]
    xt.check(gold, c, 1e-3, what="ring csr f32 8 devices")

    fn64 = dist_spmm.ring_spmm_csr(mesh8, a, n, dtype="float64",
                                   strategy="unroll")
    bh = bp.astype(np.float32)
    bl = (bp - bh.astype(np.float64)).astype(np.float32)
    ch, cl = fn64(dist_spmm.shard_rows(mesh8, jnp.asarray(bh)),
                  dist_spmm.shard_rows(mesh8, jnp.asarray(bl)))
    c64 = (np.asarray(ch, np.float64) + np.asarray(cl, np.float64))[:m]
    xt.check(gold, c64, 1e-5, what="ring csr f64 8 devices")


def test_ring_spmm_csr_chunked(rng, mesh8):
    """Chunked sub-panel rotation (round-4 overlap schedule): identical
    results to the unchunked ring, f32 and the traffic-minimal f64 'fold'
    schedule."""
    m, k, n = 40, 48, 256
    a = np.where(rng.random((m, k)) < 0.2,
                 rng.standard_normal((m, k)), 0.0)
    b = rng.standard_normal((k, n))
    gold = a @ b
    kl = -(-k // 8)
    bp = np.zeros((kl * 8, n))
    bp[:k] = b

    fn = dist_spmm.ring_spmm_csr(mesh8, a.astype(np.float32), n,
                                 dtype="float32", chunks=4)
    c = np.asarray(fn(dist_spmm.shard_rows(
        mesh8, jnp.asarray(bp, jnp.float32))))[:m]
    xt.check(gold, c, 1e-3, what="ring csr f32 chunked")

    fn64 = dist_spmm.ring_spmm_csr(mesh8, a, n, dtype="float64", chunks=2,
                                   f64_schedule="fold")
    ch = fn64(dist_spmm.shard_rows(mesh8, jnp.asarray(bp, jnp.float32)))
    c64 = np.asarray(ch, np.float64)[:m]
    info = xt.matdiff(gold, c64)
    assert info.normf_rel < 1e-5, info.normf_rel


def test_col_sharded_spmm(rng, mesh8):
    m, k, n = 32, 40, 64
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    fn = dist_spmm.col_sharded_spmm(mesh8)
    c = np.asarray(fn(jnp.asarray(a), dist_spmm.shard_cols(mesh8, b)))
    xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64),
             c[:, :n], 1e-3)


def test_dp_batched_smm(rng, mesh8):
    mesh = make_mesh((8, 1), ("dp", "mp"))
    B, m, n, k = 1024, 8, 8, 8
    kern = xt.smmdispatch(m, n, k, batch=B, beta=0.0)
    a = rng.standard_normal((B, m, k)).astype(np.float32)
    b = rng.standard_normal((B, k, n)).astype(np.float32)
    fn = dist_spmm.dp_batched_smm(mesh, kern)
    ap, bp = kern.pack_a(a), kern.pack_b(b)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, None, "dp"))
    cp = fn(jax.device_put(ap, sh), jax.device_put(bp, sh))
    c = np.asarray(kern.unpack_c(cp, B))
    gold = np.einsum("bmk,bkn->bmn", a.astype(np.float64),
                     b.astype(np.float64))
    xt.check(gold, c, 1e-3, what="dp batched smm over 8 devices")


def test_dp_packed_getrf(rng, mesh8):
    """BASELINE config #5 machinery: batch-partitioned packed GETRF."""
    mesh = make_mesh((8, 1), ("dp", "mp"))
    B, mm = 2048, 8
    a = rng.standard_normal((B, mm, mm)).astype(np.float32)
    a += mm * np.eye(mm, dtype=np.float32)  # unpivoted LU needs dominance
    kern = xt.getrf_dispatch(mm, mm, batch=B)
    ap = jnp.transpose(jnp.asarray(a), (1, 2, 0))
    pad = (-B) % (kern.bt * 8)
    if pad:
        ap = jnp.pad(ap, ((0, 0), (0, 0), (0, pad)))
    from jax.sharding import NamedSharding, PartitionSpec as P
    fn = dist_spmm.dp_packed(mesh, kern.packed, 1)
    lu = np.asarray(fn(jax.device_put(
        ap, NamedSharding(mesh, P(None, None, "dp")))))
    lu = lu[:, :, :B].transpose(2, 0, 1)
    l = np.tril(lu, -1) + np.eye(mm)
    u = np.triu(lu)
    xt.check(a, l @ u, 1e-3, what="dp packed getrf over 8 devices")


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
