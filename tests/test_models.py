"""GxM-analog engine + model zoo tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsmm_tpu.models import (MLEngine, SolverConfig, alexnet, cifar10net,
                             googlenet, inception_v3, lenet, resnet,
                             synthetic_batches)
from xsmm_tpu.models.engine import _schedule
from xsmm_tpu.parallel.mesh import make_mesh


def tiny_resnet():
    return resnet(depth=18, num_classes=10, width=8)


def test_resnet_forward_shapes():
    params, fwd = tiny_resnet()
    x = jnp.zeros((2, 32, 32, 3))
    logits = fwd(params, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.isfinite(logits).all())


def test_resnet50_builds():
    params, fwd = resnet(depth=50, num_classes=10, width=4)
    logits = fwd(params, jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, 10)


def test_alexnet_forward():
    params, fwd = alexnet(num_classes=10)
    logits = fwd(params, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 10)


def test_inception_v3_forward():
    params, fwd = inception_v3(num_classes=10, width=8)
    # topology check: 3A + RA + 4B + RB + 2C = 11 inception blocks
    assert len(params["_meta"]["kinds"]) == 11
    # graph check: 11 branch nodes + 1 aux tap = 12 list-param entries
    assert sum(isinstance(p, list) for p in params["layers"]) == 12
    assert fwd.aux_loss_weights == (0.4,)
    logits = fwd(params, jnp.zeros((2, 64, 64, 3)))
    assert logits.shape == (2, 10)   # eval: aux tap does not exist
    assert bool(jnp.isfinite(logits).all())


def test_inception_v3_trains():
    params, fwd = inception_v3(num_classes=10, width=8)
    mesh = make_mesh((8, 1), ("dp", "mp"))
    eng = MLEngine(params, fwd, SolverConfig(lr=0.05, lr_policy="fixed"),
                   mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
    y = rng.integers(0, 10, (8,)).astype(np.int32)
    losses = []
    for _ in range(3):
        out = eng.train_epoch(iter([(x, y)]), verbose=False)
        losses.append(out["loss"])
    assert losses[-1] < losses[0], losses


def test_googlenet_v1_forward():
    params, fwd = googlenet(num_classes=10, width=8)
    # topology: 9 inception modules + 2 aux taps = 11 list-param nodes
    assert sum(isinstance(p, list) for p in params["layers"]) == 11
    assert params["_meta"]["aux_heads"] == 2
    logits = fwd(params, jnp.zeros((2, 64, 64, 3)))
    # eval path: aux heads are phase-TRAIN only -> bare logits
    assert logits.shape == (2, 10)
    assert bool(jnp.isfinite(logits).all())


def test_googlenet_aux_heads_train():
    """The v1 aux classifiers (train_val_flat.prototxt loss1/loss2 taps,
    loss_weight 0.3): train forward yields (main, aux4a, aux4d); MLEngine's
    weighted multi-loss trains and gradients reach the aux-head params;
    eval excludes the taps entirely."""
    import jax
    params, fwd = googlenet(num_classes=10, width=8,
                            input_shape=(4, 64, 64, 3))
    assert fwd.aux_loss_weights == (0.3, 0.3)
    rng = jax.random.PRNGKey(0)
    out = fwd(params, jnp.zeros((4, 64, 64, 3)), train=True, rng=rng)
    assert isinstance(out, tuple) and len(out) == 3
    assert all(o.shape == (4, 10) for o in out)
    # aux-head params get gradients through the weighted loss
    from xsmm_tpu.models.engine import softmax_xent
    y = jnp.zeros((4,), jnp.int32)

    def loss(p):
        main, a1, a2 = fwd({**p, "_meta": params["_meta"]},
                           jnp.ones((4, 64, 64, 3)), train=True, rng=rng)
        return (softmax_xent(main, y) + 0.3 * softmax_xent(a1, y)
                + 0.3 * softmax_xent(a2, y))

    g = jax.grad(loss)({"layers": params["layers"]})
    # identify the two taps structurally: the list nodes whose final
    # leaf is a (*, classes) fc weight (inception modules end in conv w)
    tap_grads = [p for p in g["layers"] if isinstance(p, list)
                 and jax.tree_util.tree_leaves(p)[-1].shape[-1] == 10]
    assert len(tap_grads) == 2
    for tg in tap_grads:
        leaves = jax.tree_util.tree_leaves(tg)
        assert leaves and any(float(jnp.abs(l).max()) > 0 for l in leaves)
    # zero-init heads (the r5 convergence recipe): at init the loss
    # gradient reaches ONLY the classifier fcs (trunk grads are exactly
    # zero until the first update makes the heads nonzero — the
    # linear-probe-first warmup that lets un-normalized v1 train)
    trunk_grads = [p for p in g["layers"] if isinstance(p, list)
                   and jax.tree_util.tree_leaves(p)[-1].shape[-1] != 10]
    assert all(float(jnp.abs(l).max()) == 0
               for tg in trunk_grads for l in jax.tree_util.tree_leaves(tg))
    # engine trains end-to-end with the multi-loss
    mesh = make_mesh((8, 1), ("dp", "mp"))
    eng = MLEngine(params, fwd, SolverConfig(lr=0.01, lr_policy="fixed"),
                   mesh=mesh)
    x = np.random.default_rng(0).standard_normal(
        (8, 64, 64, 3)).astype(np.float32)
    yv = np.random.default_rng(1).integers(0, 10, (8,)).astype(np.int32)
    losses = [eng.train_epoch(iter([(x, yv)]), verbose=False)["loss"]
              for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_lenet_forward_and_trains():
    # LeNet exercises the valid-pad conv + flatten-fc path: 28x28x1 ->
    # 24 -> 12 -> 8 -> 4 -> fc (lenet_train_val.prototxt shapes)
    params, fwd = lenet(input_shape=(8, 28, 28, 1))
    logits = fwd(params, jnp.zeros((8, 28, 28, 1)))
    assert logits.shape == (8, 10)
    mesh = make_mesh((8, 1), ("dp", "mp"))
    # lr 0.002: no BN, so momentum-SGD on noise data oscillates at the
    # lenet_solver.prototxt base_lr 0.01 (swept: 0.002 is smooth)
    eng = MLEngine(params, fwd, SolverConfig(lr=0.002, lr_policy="fixed"),
                   mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 28, 28, 1)).astype(np.float32)
    y = rng.integers(0, 10, (8,)).astype(np.int32)
    losses = [eng.train_epoch(iter([(x, y)]), verbose=False)["loss"]
              for _ in range(3)]
    assert losses[-1] < losses[0], losses


def test_cifar10net_forward():
    params, fwd = cifar10net()
    logits = fwd(params, jnp.zeros((8, 32, 32, 3)))
    assert logits.shape == (8, 10)
    assert bool(jnp.isfinite(logits).all())


def test_lr_schedules():
    cfg = SolverConfig(lr=1.0, lr_policy="step", gamma=0.1,
                       step_epochs=(2, 4))
    assert _schedule(cfg, 0) == 1.0
    assert _schedule(cfg, 2) == pytest.approx(0.1)
    assert _schedule(cfg, 4) == pytest.approx(0.01)
    poly = SolverConfig(lr=1.0, lr_policy="poly", max_epochs=10, power=1.0)
    assert _schedule(poly, 5) == pytest.approx(0.5)
    inv = SolverConfig(lr=1.0, lr_policy="inv", gamma=0.5, power=2.0)
    assert _schedule(inv, 0) == pytest.approx(1.0)
    assert _schedule(inv, 2) == pytest.approx(0.25)
    # linear warmup ramps warmup_lr -> lr, then hands off to the policy
    warm = SolverConfig(lr=1.0, lr_policy="step", gamma=0.1,
                        step_epochs=(6,), warmup_epochs=4, warmup_lr=0.1)
    assert _schedule(warm, 0) == pytest.approx(0.1)
    assert _schedule(warm, 2) == pytest.approx(0.55)
    assert _schedule(warm, 4) == pytest.approx(1.0)   # policy takes over
    assert _schedule(warm, 6) == pytest.approx(0.1)   # step drop applies


def test_train_loss_decreases():
    params, fwd = tiny_resnet()
    mesh = make_mesh((8, 1), ("dp", "mp"))
    eng = MLEngine(params, fwd, SolverConfig(lr=0.05, lr_policy="fixed"),
                   mesh=mesh)
    # one fixed batch, overfit it
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, (16,)).astype(np.int32)
    losses = []
    for _ in range(6):
        out = eng.train_epoch(iter([(x, y)]), verbose=False)
        losses.append(out["loss"])
    assert losses[-1] < losses[0], losses


def test_train_epoch_scan_learns_and_shards():
    """Scan-fused epoch (one jit per epoch, VERDICT r4 item #3's noise
    fix): must learn the template task, advance step/epoch exactly like
    the per-batch loop, and run sharded on the 8-device dp mesh."""
    from xsmm_tpu.models import lenet
    from xsmm_tpu.models.engine import template_batch_fn
    params, fwd = lenet(num_classes=10)
    mesh = make_mesh((8, 1), ("dp", "mp"))
    eng = MLEngine(params, fwd, SolverConfig(lr=0.002), mesh=mesh)
    bf = template_batch_fn(16, hw=28, classes=10, chans=1)
    first = eng.train_epoch_scan(4, bf, 16, verbose=False)
    for _ in range(8):
        last = eng.train_epoch_scan(4, bf, 16, verbose=False)
    assert eng.step == 36 and eng.epoch == 9
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first["loss"], last["loss"])


def test_checkpoint_resume_roundtrip():
    params, fwd = tiny_resnet()
    mesh = make_mesh((8, 1), ("dp", "mp"))
    with tempfile.TemporaryDirectory() as d:
        eng = MLEngine(params, fwd, SolverConfig(lr=0.01), mesh=mesh,
                       checkpoint_dir=d)
        eng.train_epoch(synthetic_batches(2, 16), verbose=False)
        w0 = np.asarray(eng.params["layers"][-1]["w"])  # fc weights
        epoch0, step0 = eng.epoch, eng.step

        params2, _ = tiny_resnet()
        eng2 = MLEngine(params2, fwd, SolverConfig(lr=0.01), mesh=mesh,
                        checkpoint_dir=d)
        assert eng2.resume()
        assert eng2.epoch == epoch0 and eng2.step == step0
        assert np.allclose(np.asarray(eng2.params["layers"][-1]["w"]), w0)


def test_validate():
    params, fwd = tiny_resnet()
    eng = MLEngine(params, fwd, SolverConfig(),
                   mesh=make_mesh((8, 1), ("dp", "mp")))
    metrics = eng.validate(synthetic_batches(2, 16))
    assert 0.0 <= metrics["acc"] <= 1.0
    assert np.isfinite(metrics["loss"])


def test_engine_fires_dropout_nodes():
    """MLEngine must run graph forwards in train mode (dropout active) —
    regression: dropout nodes were inert because train/rng never flowed."""
    params, fwd = alexnet(num_classes=10, input_shape=(4, 64, 64, 3))
    eng = MLEngine(params, fwd, SolverConfig(lr=0.0, weight_decay=0.0,
                                             momentum=0.0),
                   mesh=make_mesh((8, 1), ("dp", "mp")))
    assert eng._train_kwargs  # graph forwards accept train/rng
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
    y = rng.integers(0, 10, (8,)).astype(np.int32)
    # lr=0: params unchanged; train loss (dropout on) must differ from
    # eval loss (dropout off) for the same batch
    out = eng.train_epoch(iter([(x, y)]), verbose=False)
    ev = eng.validate(iter([(x, y)]))
    assert not np.isclose(out["loss"], ev["loss"], rtol=1e-6), \
        (out["loss"], ev["loss"])


def test_bn_global_stats_eval(rng=None):
    """Engine eval must use BN running statistics (VERDICT r2 #1): a
    deployed model's per-example output cannot depend on what else is in
    the eval batch, and batch-1 eval must be well-defined."""
    params, fwd = tiny_resnet()
    assert getattr(fwd, "init_state", None), "graph must advertise state"
    mesh = make_mesh((8, 1), ("dp", "mp"))
    eng = MLEngine(params, fwd, SolverConfig(lr=0.05), mesh=mesh)
    s0 = jax.tree_util.tree_leaves(eng.state)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, (16,)).astype(np.int32)
    for _ in range(3):
        eng.train_epoch(iter([(x, y)]), verbose=False)
    s1 = jax.tree_util.tree_leaves(eng.state)
    assert any(float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 1e-6
               for a, b in zip(s0, s1)), "running stats never updated"

    # per-example invariance: logits of example 0 alone == in a batch of 8
    xa = x[:1]
    la, _ = fwd(eng.params, xa, state=eng.state)
    lb, _ = fwd(eng.params, x[:8], state=eng.state)
    assert np.allclose(np.asarray(la[0]), np.asarray(lb[0]), atol=1e-4), \
        "eval output depends on batch composition (batch-stat BN leak)"
    # validate reports top-1 and top-5 through the global-stats path
    m = eng.validate(iter([(x[:8], y[:8])]))
    assert 0.0 <= m["acc"] <= 1.0 and 0.0 <= m["acc5"] <= 1.0
    assert m["acc5"] >= m["acc"]


def test_training_converges():
    """End-to-end convergence (VERDICT r2 #2): the whole stack — conv
    custom_vjp, fused epilogues, BN running stats, SGD — must LEARN, not
    just step.  Template task: 3x chance accuracy in a few epochs."""
    from xsmm_tpu.models.engine import template_batches
    params, fwd = resnet(depth=18, num_classes=10, width=8,
                         input_shape=(32, 16, 16, 3))
    eng = MLEngine(params, fwd,
                   SolverConfig(lr=0.01, lr_policy="fixed"),
                   mesh=make_mesh((8, 1), ("dp", "mp")))
    losses = []
    for ep in range(2):
        out = eng.train_epoch(
            template_batches(10, 32, hw=16, sigma=0.3, epoch=ep),
            verbose=False)
        losses.append(out["loss"])
    # same templates (same seed), FRESH noise (unused epoch index):
    # a held-out set from the same task
    val = eng.validate(template_batches(2, 64, hw=16, sigma=0.3, epoch=99))
    assert losses[-1] < 0.6 * losses[0], losses
    assert val["acc"] >= 0.6, (val, losses)  # 6x chance, global-stats eval
