"""Reusable layer nodes + graph-from-config builder — the GxM engine analog.

Reference: samples/deeplearning/gxm/src/Engine.cpp:484-665 builds networks
from prototxt NodeParameter lists out of reusable layer nodes (ConvXSMM,
FusedBNormXSMM, Pooling, FullyConnected, Dropout, Split, Eltwise, Concat —
gxm/src/*.cpp), and the model zoo (AlexNet / ResNet-50 / Inception-v3) is
expressed as such graphs.

TPU-native: a graph is a list of layer-spec dicts consumed by
``build_graph`` -> (params pytree, forward fn).  Every compute node runs
through the framework's OWN DNN layer handles (dnn/conv.py ConvLayer,
dnn/batchnorm.py FusedBatchNorm, dnn/pooling.py PoolingLayer,
dnn/fullyconnected.py FullyConnectedLayer) — fuse flags (BIAS/RELU/ELTWISE)
map onto the handles' fused epilogues.  The handles' forward methods are
shape-polymorphic (descriptor shapes bind the layer-level bwd/upd, not the
fwd trace), so a graph built with nominal shapes serves any batch size;
end-to-end training differentiates the whole forward with jax.grad while
the per-layer bwd/upd methods remain available for layer-level use.

Spec types (GxM node analog in parens):

  {"type": "conv", "k", "r"[, "s", "stride", "pad", "bias", "relu"]}  (ConvXSMM)
  {"type": "batchnorm"[, "relu"]}                                (FusedBNormXSMM)
  {"type": "pooling", "op": "max"|"avg", "r"[, "stride", "pad"]}      (Pooling)
  {"type": "fc", "k"[, "bias", "relu"]}                        (FullyConnected)
  {"type": "relu"}                                                     (ReLU)
  {"type": "dropout", "rate"}                                        (Dropout)
  {"type": "branch", "paths": [[...], ...], "combine": "concat"|"add"
      [, "relu"]}                                       (Split + Concat/Eltwise)
  {"type": "global_avg_pool"} / {"type": "flatten"}
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import (BnDesc, BnFuse, ConvDesc, FCDesc, Format, FuseOp,
                    PoolingDesc, PoolType)
from .conv import create_conv_layer
from .batchnorm import create_fusedbatchnorm
from .pooling import create_pooling_layer
from .fullyconnected import create_fullyconnected_layer


# ---------------------------------------------------------------------------
# Reusable functional layer nodes (the Dropout/Eltwise/Split/Concat fns)
# ---------------------------------------------------------------------------


def dropout(x, rate: float, *, key, train: bool):
    """GxM Dropout node: inverted dropout, identity at inference."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def eltwise_add(a, b, relu: bool = False):
    """GxM Eltwise node (ELTWISE_OP_SUM), optional fused ReLU."""
    y = a + b.astype(a.dtype)
    return jnp.maximum(y, 0.0) if relu else y


def concat(xs: Sequence[jax.Array], axis: int = -1):
    """GxM Concat node (channel concat in NHWC)."""
    return jnp.concatenate(list(xs), axis=axis)


def split(x, n: int = 2):
    """GxM Split node: fan a tensor out to n consumers (pure fan-out)."""
    return (x,) * n


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def flatten(x):
    return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# Graph builder
# ---------------------------------------------------------------------------


def _conv_init(rng: np.random.Generator, r, s, cin, cout, dtype,
               scheme: str = "he"):
    # numpy init: one eager jax.random compile per distinct shape costs
    # ~0.5s/layer on CPU; init determinism only needs the seeded Generator.
    # Master weights stay f32 regardless of compute dtype (the handles cast
    # to their descriptor dtype per call — mixed-precision training keeps
    # full-precision parameters, the reference's bf16 paths do the same).
    #
    # scheme="he" (default): N(0, 2/fan_in) — right for BN-normalized nets
    # (resnet).  scheme="xavier": the Caffe/GxM XavierFiller the reference
    # prototxts request for un-normalized nets (googlenet v1
    # train_val_flat.prototxt weight_filler {type:"XAVIER"}): uniform on
    # [-sqrt(3/fan_in), +sqrt(3/fan_in)], variance 1/fan_in.  Neither
    # scheme alone trains v1 at depth (measured, r5): He's factor-2
    # compounds through 20+ un-normalized conv+maxpool stages to initial
    # loss ~35 (logit blow-up -> the first SGD steps crush the weight
    # scale -> plateau at uniform logits), while xavier's activations
    # VANISH by the classifier (pooled-feature std ~0.01, gradients
    # ~1e-4 -> frozen).  The recipe that converges is He trunk +
    # zero-init classifier FCs (init:"zero" below) — loss starts exactly
    # at the weighted uniform ln(C) with no blow-up to recover from.
    fan_in = max(r * s * cin, 1)
    if scheme == "xavier":
        lim = np.sqrt(3.0 / fan_in)
        w = rng.uniform(-lim, lim, (r, s, cin, cout))
    else:
        w = rng.standard_normal((r, s, cin, cout)) * np.sqrt(2.0 / fan_in)
    return jnp.asarray(w.astype(np.float32))


class Graph:
    """A built layer graph: handles + init params + functional forward.

    Stateful layers (batchnorm running statistics — the GxM
    use_global_stats machinery, FusedBNormXSMM.cpp:427-467) keep their
    state in ``init_state``, a flat dict keyed by node id.  ``apply``
    threads it: train folds each step's batch stats into the moving sums,
    eval normalizes with the global stats (correct at batch size 1).
    Calling the graph directly (``__call__``) uses batch statistics
    unconditionally — the stateless legacy path.
    """

    def __init__(self, specs: List[Dict[str, Any]],
                 input_shape: Tuple[int, int, int, int],
                 dtype: str = "float32", seed: int = 0,
                 fuse_conv_bn: bool = False):
        self.specs = specs
        self.dtype = dtype
        self.fuse_conv_bn = fuse_conv_bn
        self._rng = np.random.default_rng(seed)
        self.init_state: Dict[str, Any] = {}
        self._n_stateful = 0
        # loss weights of aux_head taps, in trunk order (GoogLeNet v1's
        # two SoftmaxWithLoss branches at 4a/4d, loss_weight 0.3 —
        # model_zoo/googlenet/v1/train_val_flat.prototxt)
        self.aux_weights: List[float] = []
        self.nodes, self.init_params, self.out_shape = self._build(
            specs, tuple(input_shape))

    # -- recursive spec walk --------------------------------------------------
    def _build(self, specs, shape):
        nodes: List[Callable] = []
        params: List[Any] = []
        i = 0
        while i < len(specs):
            spec = specs[i]
            t = spec["type"]
            # FusedConvBN (gxm/src/FusedConvBNXSMM.cpp analog): a conv
            # without its own ReLU followed by a batchnorm becomes one
            # node — the conv's BATCH_STATS_FWD epilogue feeds the BN,
            # skipping the BN's two reduction passes over the activation
            if (self.fuse_conv_bn and t == "conv"
                    and not spec.get("relu") and i + 1 < len(specs)
                    and specs[i + 1]["type"] == "batchnorm"):
                node, p, shape = self._build_conv_bn(spec, specs[i + 1],
                                                     shape)
                nodes.append(node)
                params.append(p)
                i += 2
                continue
            build = getattr(self, f"_build_{t}", None)
            if build is None:
                raise ValueError(f"unknown layer type: {t!r}")
            node, p, shape = build(spec, shape)
            nodes.append(node)
            params.append(p)
            i += 1
        return nodes, params, shape

    @staticmethod
    def _parse_conv_spec(spec):
        """Shared conv-spec grammar (r/s/stride/pad/k) — used by both the
        plain conv build and the FusedConvBN build so they cannot
        diverge."""
        r = int(spec.get("r", 3))
        s = int(spec.get("s", r))
        u = int(spec.get("stride", 1))
        pad = spec.get("pad", "same")
        ph, pw = ((r - 1) // 2, (s - 1) // 2) if pad == "same" else \
            ((0, 0) if pad == "valid" else (int(pad), int(pad)))
        return r, s, u, ph, pw, int(spec["k"])

    def _build_conv(self, spec, shape):
        n, h, w, c = shape
        r, s, u, ph, pw, k = self._parse_conv_spec(spec)
        fuse = FuseOp.NONE
        if spec.get("bias"):
            fuse |= FuseOp.BIAS
        if spec.get("relu"):
            fuse |= FuseOp.RELU
        desc = ConvDesc(n=n, c=c, h=h, w=w, k=k, r=r, s=s, u=u, v=u,
                        pad_h=ph, pad_w=pw, in_dtype=self.dtype,
                        out_dtype=self.dtype, fuse_ops=fuse)
        layer = create_conv_layer(desc)
        p = {"w": _conv_init(self._rng, r, s, c, k, self.dtype,
                          spec.get("init", "he"))}
        if spec.get("bias"):
            p["b"] = jnp.zeros((k,), jnp.float32)

        def node(p, x, ctx, _l=layer):
            return _l.forward(x, p["w"], p.get("b"))

        return node, p, (n, desc.out_h, desc.out_w, k)

    def _build_conv_bn(self, spec, bn_spec, shape):
        """Fused conv+BN node: conv with BATCH_STATS_FWD feeding the BN's
        normalization directly (FusedConvBNXSMM analog; opt-in via
        Graph(fuse_conv_bn=True))."""
        n, h, w, c = shape
        r, s, u, ph, pw, k = self._parse_conv_spec(spec)
        fuse = FuseOp.BATCH_STATS_FWD
        if spec.get("bias"):
            fuse |= FuseOp.BIAS
        desc = ConvDesc(n=n, c=c, h=h, w=w, k=k, r=r, s=s, u=u, v=u,
                        pad_h=ph, pad_w=pw, in_dtype=self.dtype,
                        out_dtype=self.dtype, fuse_ops=fuse)
        conv = create_conv_layer(desc)
        bn_fuse = BnFuse.RELU if bn_spec.get("relu") else BnFuse.BN
        bdesc = BnDesc(n=n, c=k, h=desc.out_h, w=desc.out_w, fuse=bn_fuse,
                       dtype=self.dtype)
        bn = create_fusedbatchnorm(bdesc)
        p = {"w": _conv_init(self._rng, r, s, c, k, self.dtype,
                          spec.get("init", "he")),
             "gamma": jnp.ones((k,), jnp.float32),
             "beta": jnp.zeros((k,), jnp.float32)}
        if spec.get("bias"):
            p["b"] = jnp.zeros((k,), jnp.float32)
        key = f"bn{self._n_stateful}"
        self._n_stateful += 1
        self.init_state[key] = bn.init_running()

        def node(p, x, ctx, _c=conv, _bn=bn, _key=key):
            st = ctx.get("state")
            y, stats = _c.forward(x, p["w"], p.get("b"))
            if st is not None and not ctx["train"]:
                return _bn.forward_eval(y, p["gamma"], p["beta"], st[_key])
            nhw = y.shape[0] * y.shape[1] * y.shape[2]
            mean = stats.sum / nhw
            var = stats.sumsq / nhw - jnp.square(mean)
            out, bstate = _bn.forward_from_moments(
                y, p["gamma"], p["beta"], mean, var)
            if st is not None:
                ctx["new_state"][_key] = _bn.update_running(st[_key],
                                                            bstate)
            return out

        return node, p, (n, desc.out_h, desc.out_w, k)

    def _build_batchnorm(self, spec, shape):
        n, h, w, c = shape
        fuse = BnFuse.RELU if spec.get("relu") else BnFuse.BN
        desc = BnDesc(n=n, c=c, h=h, w=w, fuse=fuse, dtype=self.dtype)
        layer = create_fusedbatchnorm(desc)
        p = {"gamma": jnp.ones((c,), jnp.float32),
             "beta": jnp.zeros((c,), jnp.float32)}
        key = f"bn{self._n_stateful}"
        self._n_stateful += 1
        self.init_state[key] = layer.init_running()

        def node(p, x, ctx, _l=layer, _key=key):
            st = ctx.get("state")
            if st is not None and not ctx["train"]:
                return _l.forward_eval(x, p["gamma"], p["beta"], st[_key])
            y, bstate = _l.forward(x, p["gamma"], p["beta"])
            if st is not None:
                ctx["new_state"][_key] = _l.update_running(st[_key], bstate)
            return y

        return node, p, shape

    def _build_pooling(self, spec, shape):
        n, h, w, c = shape
        r = int(spec.get("r", 2))
        u = int(spec.get("stride", r))
        pad = spec.get("pad", "same" if u == 2 and r == 3 else "valid")
        ph = (r - 1) // 2 if pad == "same" else int(0 if pad == "valid"
                                                    else pad)
        op = PoolType.MAX if spec.get("op", "max") == "max" else PoolType.AVG
        desc = PoolingDesc(n=n, c=c, h=h, w=w, r=r, s=r, u=u, v=u,
                           pad_h=ph, pad_w=ph, pool_type=op,
                           dtype=self.dtype)
        layer = create_pooling_layer(desc)

        def node(p, x, ctx, _l=layer):
            return _l.forward(x)

        return node, None, (n, desc.out_h, desc.out_w, c)

    def _build_fc(self, spec, shape):
        n = shape[0]
        cin = int(np.prod(shape[1:]))
        k = int(spec["k"])
        fuse = FuseOp.BIAS if spec.get("bias", True) else FuseOp.NONE
        if spec.get("relu"):
            fuse |= FuseOp.RELU
        desc = FCDesc(n=n, c=cin, k=k, in_dtype=self.dtype,
                      out_dtype=self.dtype, fuse_ops=fuse)
        layer = create_fullyconnected_layer(desc)
        # init "zero" (classifier heads of un-normalized nets): logits
        # start exactly uniform, the head learns as a linear probe first,
        # and no early step has to crush an out-of-scale logit blow-up
        if spec.get("init") == "zero":
            w0 = np.zeros((cin, k))
        else:
            w0 = self._rng.standard_normal((cin, k)) * np.sqrt(1.0 / cin)
        p = {"w": jnp.asarray(w0.astype(np.float32))}  # f32 master
        # weights (see _conv_init)
        if spec.get("bias", True):
            p["b"] = jnp.zeros((k,), jnp.float32)
        relu = bool(spec.get("relu"))

        def node(p, x, ctx, _l=layer, _relu=relu):
            if x.ndim > 2:
                x = flatten(x)
            out = _l.forward(x, p["w"], p.get("b"))
            # fused-ReLU fwd returns (y, relu_mask) for the layer-level bwd
            return out[0] if _relu else out

        return node, p, (n, k)

    def _build_relu(self, spec, shape):
        def node(p, x, ctx):
            return jnp.maximum(x, 0.0)
        return node, None, shape

    def _build_dropout(self, spec, shape):
        rate = float(spec.get("rate", 0.5))

        def node(p, x, ctx, _rate=rate):
            if not ctx["train"]:
                return x
            if ctx["rng"] is None:
                raise ValueError("dropout in train mode requires rng")
            ctx["rng"], sub = jax.random.split(ctx["rng"])
            return dropout(x, _rate, key=sub, train=True)

        return node, None, shape

    def _build_branch(self, spec, shape):
        combine = spec.get("combine", "concat")
        paths = []
        out_shapes = []
        sub_params_init = []
        for path_specs in spec["paths"]:
            nodes, ps, out = self._build(path_specs, shape)
            paths.append(nodes)
            sub_params_init.append(ps)
            out_shapes.append(out)
        if combine == "concat":
            assert all(o[:-1] == out_shapes[0][:-1] for o in out_shapes), \
                f"concat branches must agree on N,H,W: {out_shapes}"
            out_shape = out_shapes[0][:-1] + (
                sum(o[-1] for o in out_shapes),)
        else:  # add (Eltwise): all shapes identical
            assert all(o == out_shapes[0] for o in out_shapes), \
                f"eltwise branches must agree: {out_shapes}"
            out_shape = out_shapes[0]
        relu = bool(spec.get("relu"))

        def node(p, x, ctx, _paths=paths, _combine=combine, _relu=relu):
            outs = []
            for path_nodes, path_params in zip(_paths, p):
                y = x
                for fn, fp in zip(path_nodes, path_params):
                    y = fn(fp, y, ctx)
                outs.append(y)
            if _combine == "concat":
                y = concat(outs)
            else:
                y = outs[0]
                for o in outs[1:]:
                    y = eltwise_add(y, o)
            return jnp.maximum(y, 0.0) if _relu else y

        return node, sub_params_init, out_shape

    def _build_aux_head(self, spec, shape):
        """Auxiliary classifier tap (GoogLeNet-v1 training recipe —
        train_val_flat.prototxt's avgpool5/3 -> conv1x1 -> fc -> dropout
        -> fc SoftmaxWithLoss branches at 4a/4d, loss_weight 0.3).

        TRAIN-ONLY, exactly the prototxt's include{phase:TRAIN} semantics:
        in train mode the branch computes aux logits appended to
        ctx["aux"] (consumed by MLEngine's weighted multi-loss) and passes
        the trunk activation through unchanged; in eval the branch does
        not exist — zero cost, identical topology to inference-time v1.
        """
        classes = int(spec["classes"])
        # clamp the prototxt's 5x5/3 tap pool to the trunk resolution so
        # width-scaled test builds (tiny H) keep the same topology
        pr = min(int(spec.get("pool_r", 5)), shape[1], shape[2])
        ps = min(int(spec.get("pool_stride", 3)), pr)
        sub_specs = spec.get("specs") or [
            {"type": "pooling", "op": "avg", "r": pr,
             "stride": ps, "pad": "valid"},
            {"type": "conv", "k": int(spec.get("conv_k", 128)), "r": 1,
             "bias": True, "relu": True,
             "init": spec.get("init", "he")},
            {"type": "fc", "k": int(spec.get("fc", 1024)), "relu": True},
            {"type": "dropout", "rate": float(spec.get("dropout", 0.7))},
            {"type": "fc", "k": classes,
             "init": spec.get("head_init", "he")},
        ]
        sub_nodes, sub_params, out = self._build(sub_specs, shape)
        assert out == (shape[0], classes), out
        self.aux_weights.append(float(spec.get("weight", 0.3)))

        def node(p, x, ctx, _nodes=sub_nodes):
            if not ctx["train"]:
                return x
            y = x
            for fn, fp in zip(_nodes, p):
                y = fn(fp, y, ctx)
            ctx.setdefault("aux", []).append(y)
            return x

        return node, sub_params, shape

    def _build_global_avg_pool(self, spec, shape):
        def node(p, x, ctx):
            return global_avg_pool(x)
        return node, None, (shape[0], shape[-1])

    def _build_flatten(self, spec, shape):
        def node(p, x, ctx):
            return flatten(x)
        return node, None, (shape[0], int(np.prod(shape[1:])))

    # -- execution -------------------------------------------------------------
    def _maybe_aux(self, y, ctx):
        """Train-mode output with aux taps becomes (main, *aux) — eval
        always returns the bare logits (aux heads are phase-TRAIN only)."""
        aux = ctx.get("aux")
        return (y, *aux) if aux else y

    def __call__(self, params, x, train: bool = False, rng=None):
        ctx = {"train": train, "rng": rng}
        y = x
        for fn, p in zip(self.nodes, params):
            y = fn(p, y, ctx)
        return self._maybe_aux(y, ctx)

    def apply(self, params, state: Dict[str, Any], x,
              train: bool = False, rng=None):
        """Stateful forward: returns (y, new_state).

        train=True: batch-stat normalization + moving-sum update (GxM
        TRAIN mode); train=False: global-stats normalization (GxM
        TEST/VAL mode — use_global_stats)."""
        ctx = {"train": train, "rng": rng, "state": state, "new_state": {}}
        y = x
        for fn, p in zip(self.nodes, params):
            y = fn(p, y, ctx)
        new_state = {**state, **ctx["new_state"]} if train else state
        return self._maybe_aux(y, ctx), new_state


def make_model_forward(graph: Graph, key: str = "layers"):
    """Wrap a Graph as a model-level forward for MLEngine.

    The returned callable has the legacy signature; the stateful path
    (running BN statistics) is exposed via ``state=`` and advertised to
    the engine through the attached ``init_state``.
    """

    def forward(params, x, compute_dtype=None, train=False, rng=None,
                state=None):
        del compute_dtype  # dtype is a build-time choice (dtype= kwarg)
        if state is not None:
            return graph.apply(params[key], state, x, train=train, rng=rng)
        return graph(params[key], x, train=train, rng=rng)

    forward.graph = graph
    forward.init_state = graph.init_state
    forward.aux_loss_weights = tuple(graph.aux_weights)
    return forward


def build_graph(specs: List[Dict[str, Any]],
                input_shape: Tuple[int, int, int, int],
                dtype: str = "float32", seed: int = 0,
                fuse_conv_bn: bool = False) -> Tuple[List[Any], Graph]:
    """Build a layer graph from specs: returns (init_params, graph).

    The graph object is the forward callable: graph(params, x, train, rng).
    fuse_conv_bn=True merges conv->batchnorm pairs into FusedConvBN nodes
    (the conv's BATCH_STATS_FWD epilogue feeds the BN; note the fused
    pair's params live in ONE dict, so the params tree differs from the
    unfused build).
    """
    g = Graph(specs, input_shape, dtype=dtype, seed=seed,
              fuse_conv_bn=fuse_conv_bn)
    return g.init_params, g
