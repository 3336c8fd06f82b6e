"""Layer-graph builder tests (dnn/layers.py — the GxM Engine analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsmm_tpu.dnn import layers
from xsmm_tpu.dnn.layers import build_graph


def test_sequential_conv_bn_pool_fc():
    specs = [
        {"type": "conv", "k": 8, "r": 3, "stride": 1},
        {"type": "batchnorm", "relu": True},
        {"type": "pooling", "op": "max", "r": 2, "stride": 2,
         "pad": "valid"},
        {"type": "global_avg_pool"},
        {"type": "fc", "k": 5},
    ]
    params, g = build_graph(specs, (2, 16, 16, 3))
    assert g.out_shape == (2, 5)
    y = g(params, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 5) and bool(jnp.isfinite(y).all())
    # any batch size runs (handles are shape-polymorphic in fwd)
    assert g(params, jnp.ones((7, 16, 16, 3))).shape == (7, 5)


def test_branch_add_residual():
    """branch+add = the GxM Split+Eltwise residual pattern."""
    specs = [
        {"type": "conv", "k": 4, "r": 3},
        {"type": "branch", "combine": "add", "relu": True, "paths": [
            [{"type": "conv", "k": 4, "r": 3}, {"type": "batchnorm"}],
            [],  # identity shortcut
        ]},
    ]
    params, g = build_graph(specs, (1, 8, 8, 3))
    y = g(params, jnp.ones((1, 8, 8, 3)))
    assert y.shape == (1, 8, 8, 4)
    assert bool((np.asarray(y) >= 0).all())  # fused relu applied


def test_branch_concat():
    specs = [{"type": "branch", "combine": "concat", "paths": [
        [{"type": "conv", "k": 4, "r": 1}],
        [{"type": "conv", "k": 6, "r": 3}],
        [{"type": "pooling", "op": "avg", "r": 3, "stride": 1,
          "pad": "same"}],
    ]}]
    params, g = build_graph(specs, (2, 8, 8, 5))
    assert g.out_shape == (2, 8, 8, 4 + 6 + 5)
    assert g(params, jnp.ones((2, 8, 8, 5))).shape == (2, 8, 8, 15)


def test_dropout_train_vs_eval():
    specs = [{"type": "dropout", "rate": 0.5}]
    params, g = build_graph(specs, (4, 4, 4, 2))
    x = jnp.ones((4, 4, 4, 2))
    assert np.array_equal(np.asarray(g(params, x)), np.asarray(x))  # eval
    y = g(params, x, train=True, rng=jax.random.PRNGKey(0))
    vals = set(np.unique(np.asarray(y)).tolist())
    assert vals <= {0.0, 2.0}  # inverted dropout at keep=0.5
    with pytest.raises(ValueError):
        g(params, x, train=True)  # rng required


def test_functional_nodes():
    a = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3) - 2)
    b = jnp.ones((2, 3), jnp.float32)
    y = layers.eltwise_add(a, b, relu=True)
    assert bool((np.asarray(y) >= 0).all())
    parts = layers.split(a, 3)
    assert len(parts) == 3
    cc = layers.concat([a, b])
    assert cc.shape == (2, 6)


def test_grad_through_graph():
    specs = [
        {"type": "conv", "k": 4, "r": 3, "bias": True, "relu": True},
        {"type": "global_avg_pool"},
        {"type": "fc", "k": 3},
    ]
    params, g = build_graph(specs, (2, 8, 8, 3))

    def loss(p, x):
        return jnp.sum(g(p, x) ** 2)

    grads = jax.grad(loss)(params, jnp.ones((2, 8, 8, 3)))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_fuse_conv_bn_equivalence():
    """FusedConvBN (VERDICT r2 #7): the opt-in conv+bn fusion must be
    numerically equivalent to the unfused graph — train mode, eval mode
    (running stats), and gradients."""
    import jax
    import numpy as np
    from xsmm_tpu.models import resnet

    p0, f0 = resnet(depth=18, num_classes=10, width=8,
                    input_shape=(4, 16, 16, 3), seed=3)
    p1, f1 = resnet(depth=18, num_classes=10, width=8,
                    input_shape=(4, 16, 16, 3), seed=3, fuse_conv_bn=True)
    # fewer nodes: conv+bn pairs merged
    assert len(f1.graph.nodes) < len(f0.graph.nodes)
    assert len(f1.init_state) == len(f0.init_state)  # same BN count
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))

    l0 = f0(p0, x)                       # train-mode batch stats
    l1 = f1(p1, x)
    assert np.allclose(np.asarray(l0), np.asarray(l1), atol=1e-4), \
        np.abs(np.asarray(l0) - np.asarray(l1)).max()

    # stateful: one train pass updates running stats identically
    _, s0 = f0(p0, x, train=True, state=dict(f0.init_state))
    _, s1 = f1(p1, x, train=True, state=dict(f1.init_state))
    for k in s0:
        assert np.allclose(np.asarray(s0[k].gmean), np.asarray(s1[k].gmean),
                           atol=1e-4), k
    e0, _ = f0(p0, x, state=s0)
    e1, _ = f1(p1, x, state=s1)
    assert np.allclose(np.asarray(e0), np.asarray(e1), atol=1e-4)

    # gradient equivalence through both builds
    g0 = jax.grad(lambda p: jnp.sum(f0({**p0, "layers": p}, x) ** 2))(
        p0["layers"])
    g1 = jax.grad(lambda p: jnp.sum(f1({**p1, "layers": p}, x) ** 2))(
        p1["layers"])
    n0 = sum(float(jnp.sum(jnp.abs(g)))
             for g in jax.tree_util.tree_leaves(g0))
    n1 = sum(float(jnp.sum(jnp.abs(g)))
             for g in jax.tree_util.tree_leaves(g1))
    assert abs(n0 - n1) / max(n0, 1e-9) < 1e-3, (n0, n1)
