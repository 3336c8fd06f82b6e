"""MLEngine — the GxM training-framework analog.

Reference: samples/deeplearning/gxm/src/Engine.cpp — builds the layer graph
from prototxt, runs epoch/minibatch loops (run(TRAIN) :484, :516-531), does
MLSL data-parallel gradient allreduce per layer (Conv.cpp:350-352), SGD
solver with lr schedules, prints images/s per epoch (:600-602), checkpoints
every epoch + snapshot dirs (:245-365), resumes at startup (:488-500).

TPU-native: one jitted train_step over a dp-sharded mesh — gradients are
psum'd by XLA from the sharding annotations (no explicit comm layer); the
solver is momentum SGD with fixed/step/poly schedules (the GxM solver
surface); checkpoints are per-tensor .npz + JSON meta (epoch, lr, step) in
the same spirit as GxM's binary-per-tensor + text sidecar, with resume.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_mesh


@dataclasses.dataclass
class SolverConfig:
    """GxM solver surface (SGD + schedule)."""

    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # Policies mirror the zoo solver.prototxt surface: fixed | step
    # (= Caffe "multistep", explicit epoch list) | poly | inv
    # (lr * (1 + gamma*epoch)^-power, the lenet_solver.prototxt policy)
    lr_policy: str = "fixed"
    gamma: float = 0.1              # step decay factor / inv denominator
    step_epochs: Tuple[int, ...] = (30, 60, 80)
    power: float = 1.0              # poly / inv exponent
    max_epochs: int = 90
    # Linear warmup (Solver.hpp:157,171 warmup_lr/warmup_epochs): ramp
    # from warmup_lr to lr over warmup_epochs, then the main policy.
    warmup_epochs: int = 0
    warmup_lr: float = 0.0


def _schedule(cfg: SolverConfig, epoch: float) -> float:
    if cfg.warmup_epochs > 0 and epoch < cfg.warmup_epochs:
        frac = epoch / cfg.warmup_epochs
        return cfg.warmup_lr + (cfg.lr - cfg.warmup_lr) * frac
    if cfg.lr_policy == "step":
        drops = sum(1 for e in cfg.step_epochs if epoch >= e)
        return cfg.lr * (cfg.gamma ** drops)
    if cfg.lr_policy == "poly":
        return cfg.lr * (1.0 - epoch / cfg.max_epochs) ** cfg.power
    if cfg.lr_policy == "inv":
        return cfg.lr * (1.0 + cfg.gamma * epoch) ** -cfg.power
    return cfg.lr


def softmax_xent(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


class MLEngine:
    """Train/validate a functional model with DP over a device mesh."""

    def __init__(self, params, forward: Callable, solver: SolverConfig,
                 mesh: Optional[Mesh] = None,
                 loss_fn: Callable = softmax_xent,
                 checkpoint_dir: Optional[str] = None,
                 compute_dtype=jnp.float32):
        # NOTE: for graph-built models (dnn/layers.py) the compute dtype is
        # chosen at model build time (resnet(..., dtype="bfloat16")); the
        # compute_dtype kwarg is forwarded but those forwards ignore it.
        self.solver = solver
        self.forward = forward
        self.loss_fn = loss_fn
        self.mesh = mesh or make_mesh((len(jax.devices()), 1), ("dp", "mp"))
        self.checkpoint_dir = checkpoint_dir
        self.compute_dtype = compute_dtype
        self.epoch = 0
        self.step = 0

        # static metadata (strings etc.) cannot pass through jit: split it
        # out once and close over it
        self.meta = {k: v for k, v in params.items() if k.startswith("_")}
        self.params = self._trainable(params)
        self.momentum = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p) if isinstance(p, jax.Array) else None,
            self.params)

        self._data_sharding = NamedSharding(self.mesh, P("dp"))
        self._repl = NamedSharding(self.mesh, P())
        # graph-built forwards (dnn/layers.py) take train/rng so dropout
        # nodes fire during training; legacy forwards don't — detect once.
        # A **kwargs forward also qualifies, so wrapped forwards don't
        # silently lose dropout.
        import inspect
        try:
            params_ = inspect.signature(forward).parameters
            self._train_kwargs = (
                any(p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in params_.values())
                or {"train", "rng"} <= set(params_))
        except (TypeError, ValueError):
            self._train_kwargs = False
        # base key built once; folding happens INSIDE the jitted step (an
        # eager per-batch PRNGKey+fold_in costs two ~25ms tunnel round
        # trips per batch on remote-device setups)
        self._base_key = jax.random.PRNGKey(0xA6)
        # stateful models (graph-built nets with batchnorm) advertise
        # their running-statistics state; the engine threads it through
        # train (moving-sum update) and eval (use_global_stats path) —
        # the GxM TRAIN vs TEST/VAL execution-mode switch
        init_state = getattr(forward, "init_state", None)
        self._stateful = bool(init_state)
        self.state = dict(init_state) if self._stateful else None
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        # compiled scan-epoch cache: (id(batch_fn), n_batches) -> jitted fn
        self._scan_cache: Dict[Any, Callable] = {}

    @staticmethod
    def _trainable(params):
        return {k: v for k, v in params.items() if not k.startswith("_")}

    # -- jitted steps ----------------------------------------------------------
    def _train_step_impl(self, params, momentum, state, x, y, lr, step):
        meta = self.meta
        train = params
        rng = (jax.random.fold_in(self._base_key, step)
               if self._train_kwargs else None)

        def loss(tp):
            kw = ({"train": True, "rng": rng} if self._train_kwargs else {})
            if self._stateful:
                logits, new_state = self.forward(
                    {**tp, **meta}, x, compute_dtype=self.compute_dtype,
                    state=state, **kw)
            else:
                logits = self.forward({**tp, **meta}, x,
                                      compute_dtype=self.compute_dtype, **kw)
                new_state = state
            if isinstance(logits, tuple):
                # weighted multi-loss (GoogLeNet-v1 aux classifiers:
                # loss = main + sum(w_i * aux_i), prototxt loss_weight
                # semantics — Engine.cpp sums every loss node's weighted
                # output); weights come from the graph's aux taps
                main, auxs = logits[0], logits[1:]
                ws = getattr(self.forward, "aux_loss_weights",
                             (0.3,) * len(auxs))
                lval = self.loss_fn(main, y)
                for w, al in zip(ws, auxs):
                    lval = lval + w * self.loss_fn(al, y)
                return lval, new_state
            return self.loss_fn(logits, y), new_state

        (lval, new_state), grads = jax.value_and_grad(
            loss, has_aux=True)(train)
        cfg = self.solver

        def upd(p, m, g):
            g = g + cfg.weight_decay * p
            m2 = cfg.momentum * m + g
            return p - lr * m2, m2

        flat_p, treedef = jax.tree_util.tree_flatten(train)
        flat_m = jax.tree_util.tree_leaves(momentum)
        flat_g = jax.tree_util.tree_leaves(grads)
        new_p, new_m = [], []
        for p, m, g in zip(flat_p, flat_m, flat_g):
            p2, m2 = upd(p, m, g)
            new_p.append(p2)
            new_m.append(m2)
        train2 = jax.tree_util.tree_unflatten(treedef, new_p)
        mom2 = jax.tree_util.tree_unflatten(treedef, new_m)
        return train2, mom2, new_state, lval

    def _eval_step_impl(self, params, state, x, y):
        if self._stateful:
            # GxM TEST/VAL mode: global statistics, no state update
            logits, _ = self.forward({**params, **self.meta}, x,
                                     compute_dtype=self.compute_dtype,
                                     state=state)
        else:
            logits = self.forward({**params, **self.meta}, x,
                                  compute_dtype=self.compute_dtype)
        acc = jnp.mean((jnp.argmax(logits, axis=1) == y).astype(jnp.float32))
        # top-5 (Engine.cpp:642 validation / Accuracy.cpp analog)
        k = min(5, logits.shape[1])
        _, topk = jax.lax.top_k(logits, k)
        acc5 = jnp.mean(jnp.any(topk == y[:, None], axis=1)
                        .astype(jnp.float32))
        return self.loss_fn(logits, y), acc, acc5

    # -- public API --------------------------------------------------------------
    def train_epoch(self, batches: Iterator[Tuple[np.ndarray, np.ndarray]],
                    log_every: int = 50, verbose: bool = True):
        """One epoch over an iterator of (images NHWC, int labels)."""
        lr = _schedule(self.solver, self.epoch)
        n_images = 0
        t0 = time.perf_counter()
        loss_val = None
        for bi, (x, y) in enumerate(batches):
            x = jax.device_put(jnp.asarray(x), self._data_sharding)
            y = jax.device_put(jnp.asarray(y), self._data_sharding)
            with self.mesh:
                (self.params, self.momentum, self.state,
                 loss_val) = self._train_step(
                    self.params, self.momentum, self.state, x, y, lr,
                    jnp.uint32(self.step))
            n_images += x.shape[0]
            self.step += 1
            if verbose and bi % log_every == 0:
                print(f"epoch {self.epoch} batch {bi} "
                      f"loss {float(loss_val):.4f} lr {lr:.5f}")
        jax.block_until_ready(loss_val)
        dt = time.perf_counter() - t0
        ips = n_images / dt
        if verbose:
            print(f"epoch {self.epoch}: {ips:.1f} images/s "
                  f"({n_images} images, {dt:.2f}s)")  # Engine.cpp:600 analog
        self.epoch += 1
        if self.checkpoint_dir:
            self.checkpoint()
            # snapshot dirs at schedule boundaries (Engine.cpp writes
            # snapshots at epochs 30/60/80 alongside the rolling checkpoint)
            if self.epoch in self.solver.step_epochs:
                self.checkpoint(tag=f"epoch{self.epoch}")
        return {"images_per_s": ips, "loss": float(loss_val), "lr": lr}

    def train_epoch_scan(self, n_batches: int, batch_fn: Callable,
                         batch_size: int, verbose: bool = True,
                         data_seed: int = 0):
        """One epoch as a SINGLE jitted ``lax.scan`` over on-device batches.

        ``batch_fn(key) -> (x NHWC, y int32)`` must be traceable (device
        data generation; e.g. `synthetic_batch_fn`/`template_batch_fn`).
        Each scan step folds the step counter into the data key, builds
        its batch in-graph, and applies the train step — the whole epoch
        is ONE dispatch, so on tunneled setups the per-step ~25ms HTTP
        round trip (which dominated 40-dispatch epochs and produced the
        r4 zoo spreads of 0.17-0.20) is paid once per epoch instead of
        per batch.  The reference's epoch loop semantics are unchanged
        (Engine.cpp:516-531 runs minibatches back-to-back; the scan is
        the jit-native spelling).
        """
        lr = _schedule(self.solver, self.epoch)
        ckey = (id(batch_fn), n_batches)
        if ckey not in self._scan_cache:
            step_impl = self._train_step_impl
            dsh = self._data_sharding

            def make_body(lr_):
                def body(carry, _):
                    params, mom, state, step = carry
                    key = jax.random.fold_in(
                        jax.random.fold_in(jax.random.PRNGKey(0xDA7A),
                                           jnp.uint32(data_seed)), step)
                    x, y = batch_fn(key)
                    x = jax.lax.with_sharding_constraint(x, dsh)
                    y = jax.lax.with_sharding_constraint(y, dsh)
                    p2, m2, s2, lval = step_impl(params, mom, state, x, y,
                                                 lr_, step)
                    return (p2, m2, s2, step + 1), lval
                return body

            @jax.jit
            def epoch_fn(params, mom, state, step0, lr_):
                (p, m, s, _), losses = jax.lax.scan(
                    make_body(lr_), (params, mom, state, step0), None,
                    length=n_batches)
                return p, m, s, losses[-1]

            self._scan_cache[ckey] = epoch_fn
        epoch_fn = self._scan_cache[ckey]
        if not getattr(self, "_scan_placed", False):
            # pin train state to its steady-state placement BEFORE the
            # first trace: host-numpy inputs otherwise compile once, and
            # the returned committed device arrays trigger a second
            # ~80s compile on epoch 1 (measured: a "119 img/s" epoch in
            # an 80k img/s run)
            self.params = jax.device_put(self.params, self._repl)
            self.momentum = jax.device_put(self.momentum, self._repl)
            if self._stateful:
                self.state = jax.device_put(self.state, self._repl)
            self._scan_placed = True
        t0 = time.perf_counter()
        with self.mesh:
            out = epoch_fn(self.params, self.momentum, self.state,
                           jnp.uint32(self.step), jnp.float32(lr))
            self.params, self.momentum, self.state, loss_val = out
        jax.block_until_ready(loss_val)
        dt = time.perf_counter() - t0
        self.step += n_batches
        self.epoch += 1
        n_images = n_batches * batch_size
        ips = n_images / dt
        if verbose:
            print(f"epoch {self.epoch - 1}: {ips:.1f} images/s "
                  f"({n_images} images, {dt:.2f}s, scan-fused)")
        if self.checkpoint_dir:
            self.checkpoint()
        return {"images_per_s": ips, "loss": float(loss_val), "lr": lr}

    def validate(self, batches) -> Dict[str, float]:
        losses, accs, acc5s = [], [], []
        for x, y in batches:
            x = jax.device_put(jnp.asarray(x), self._data_sharding)
            y = jax.device_put(jnp.asarray(y), self._data_sharding)
            with self.mesh:
                l, a, a5 = self._eval_step(self.params, self.state, x, y)
            losses.append(float(l))
            accs.append(float(a))
            acc5s.append(float(a5))
        return {"loss": float(np.mean(losses)), "acc": float(np.mean(accs)),
                "acc5": float(np.mean(acc5s))}

    # -- checkpoint / resume (Engine.cpp:245-365, 488-500 analog) --------------
    def checkpoint(self, tag: Optional[str] = None):
        d = self.checkpoint_dir
        assert d, "no checkpoint_dir configured"
        os.makedirs(d, exist_ok=True)
        tag = tag or "latest"
        flat, _ = jax.tree_util.tree_flatten_with_path(self.params)
        arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
        np.savez(os.path.join(d, f"params_{tag}.npz"), **arrays)
        mflat, _ = jax.tree_util.tree_flatten_with_path(self.momentum)
        np.savez(os.path.join(d, f"momentum_{tag}.npz"),
                 **{jax.tree_util.keystr(k): np.asarray(v) for k, v in mflat})
        if self._stateful:
            sflat, _ = jax.tree_util.tree_flatten_with_path(self.state)
            np.savez(os.path.join(d, f"state_{tag}.npz"),
                     **{jax.tree_util.keystr(k): np.asarray(v)
                        for k, v in sflat})
        with open(os.path.join(d, f"meta_{tag}.json"), "w") as f:
            json.dump({"epoch": self.epoch, "step": self.step,
                       "lr": _schedule(self.solver, self.epoch)}, f)

    def resume(self, tag: str = "latest") -> bool:
        d = self.checkpoint_dir
        meta_p = os.path.join(d or "", f"meta_{tag}.json")
        if not d or not os.path.exists(meta_p):
            return False
        with open(meta_p) as f:
            meta = json.load(f)
        self.epoch = meta["epoch"]
        self.step = meta["step"]
        pz = np.load(os.path.join(d, f"params_{tag}.npz"))
        mz = np.load(os.path.join(d, f"momentum_{tag}.npz"))
        flat, treedef = jax.tree_util.tree_flatten_with_path(self.params)
        new = [jnp.asarray(pz[jax.tree_util.keystr(k)]) for k, _ in flat]
        self.params = jax.tree_util.tree_unflatten(treedef, new)
        mflat, mtree = jax.tree_util.tree_flatten_with_path(self.momentum)
        self.momentum = jax.tree_util.tree_unflatten(
            mtree, [jnp.asarray(mz[jax.tree_util.keystr(k)])
                    for k, _ in mflat])
        state_p = os.path.join(d, f"state_{tag}.npz")
        if self._stateful and os.path.exists(state_p):
            sz = np.load(state_p)
            sflat, stree = jax.tree_util.tree_flatten_with_path(self.state)
            self.state = jax.tree_util.tree_unflatten(
                stree, [jnp.asarray(sz[jax.tree_util.keystr(k)])
                        for k, _ in sflat])
        return True


def synthetic_batches(n_batches: int, batch: int, hw: int = 32,
                      classes: int = 10, seed: int = 0, chans: int = 3):
    """Synthetic data pipeline (LMDB-free input analog)."""
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield (rng.standard_normal(
                   (batch, hw, hw, chans)).astype(np.float32),
               rng.integers(0, classes, (batch,)).astype(np.int32))


def template_batches(n_batches: int, batch: int, hw: int = 32,
                     classes: int = 10, seed: int = 0, sigma: float = 0.6,
                     epoch: int = 0, chans: int = 3):
    """Deterministic LEARNABLE dataset: class templates + Gaussian noise.

    Each class is a fixed random template image (drawn once from the data
    seed); every sample is template[label] + sigma*noise.  A working
    training stack must drive the loss well below ln(classes) and the
    accuracy far above 1/classes — the convergence-proof dataset (GxM
    trains real nets to accuracy, Engine.cpp:600-665; with no image
    corpus in this environment a structured deterministic task plays
    that role)."""
    trng = np.random.default_rng(seed)  # templates: seed-stable
    templates = trng.standard_normal(
        (classes, hw, hw, chans)).astype(np.float32)
    rng = np.random.default_rng(seed + 1000 + epoch)
    for _ in range(n_batches):
        y = rng.integers(0, classes, (batch,)).astype(np.int32)
        x = templates[y] + sigma * rng.standard_normal(
            (batch, hw, hw, chans)).astype(np.float32)
        yield x, y


def device_template_batches(n_batches: int, batch: int, hw: int = 32,
                            classes: int = 10, seed: int = 0,
                            sigma: float = 0.6, epoch: int = 0,
                            chans: int = 3):
    """Device-generated template_batches (zero host->device transfer);
    same task family, jax.random-based (not numerically identical to the
    host version, but identically distributed)."""
    tkey = jax.random.PRNGKey(seed)
    templates = jax.random.normal(tkey, (classes, hw, hw, chans),
                                  jnp.float32)

    @jax.jit
    def make(key):
        kx, ky = jax.random.split(key)
        y = jax.random.randint(ky, (batch,), 0, classes, jnp.int32)
        x = templates[y] + sigma * jax.random.normal(
            kx, (batch, hw, hw, chans), jnp.float32)
        return x, y

    key = jax.random.PRNGKey(seed + 1000 + epoch)
    for i in range(n_batches):
        yield make(jax.random.fold_in(key, i))


def synthetic_batch_fn(batch: int, hw: int = 32, classes: int = 10,
                       chans: int = 3) -> Callable:
    """Traceable per-step batch maker for ``train_epoch_scan``:
    key -> (x NHWC, y int32), generated in-graph."""
    def make(key):
        kx, ky = jax.random.split(key)
        x = jax.random.normal(kx, (batch, hw, hw, chans), jnp.float32)
        y = jax.random.randint(ky, (batch,), 0, classes, jnp.int32)
        return x, y
    return make


def template_batch_fn(batch: int, hw: int = 32, classes: int = 10,
                      seed: int = 0, sigma: float = 0.6,
                      chans: int = 3) -> Callable:
    """Traceable LEARNABLE batch maker (template task) for
    ``train_epoch_scan``: the class templates are baked as constants."""
    templates = jax.random.normal(jax.random.PRNGKey(seed),
                                  (classes, hw, hw, chans), jnp.float32)

    def make(key):
        kx, ky = jax.random.split(key)
        y = jax.random.randint(ky, (batch,), 0, classes, jnp.int32)
        x = templates[y] + sigma * jax.random.normal(
            kx, (batch, hw, hw, chans), jnp.float32)
        return x, y
    return make


def device_synthetic_batches(n_batches: int, batch: int, hw: int = 32,
                             classes: int = 10, seed: int = 0,
                             sharding=None, chans: int = 3):
    """Device-generated synthetic batches: zero host->device transfer.

    On tunneled/remote-device setups the per-batch host transfer dominates
    (25ms+ round trips); generating with jax.random on device measures the
    training step itself.  Pass the engine's data sharding to generate
    directly into the dp layout.
    """
    import jax.numpy as jnp

    @jax.jit
    def make(key):
        kx, ky = jax.random.split(key)
        x = jax.random.normal(kx, (batch, hw, hw, chans), jnp.float32)
        y = jax.random.randint(ky, (batch,), 0, classes, jnp.int32)
        return x, y

    if sharding is not None:
        make = jax.jit(make.__wrapped__, out_shardings=(sharding, sharding))
    key = jax.random.PRNGKey(seed)
    for i in range(n_batches):
        yield make(jax.random.fold_in(key, i))
