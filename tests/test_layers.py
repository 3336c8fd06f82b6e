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
