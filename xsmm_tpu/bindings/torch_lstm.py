"""PyTorch custom op wrapping the framework's fused LSTM cell.

The tf_lstm_ops analog: the reference ships a TensorFlow custom op
(samples/deeplearning/tf_lstm_ops/xsmm_lstm_ops.cc) that routes LSTM
forward/backward through libxsmm's rnncell handles and validates against
the host framework's own LSTM.  Here the host framework is PyTorch:

* ``XsmmLSTMFunction`` — torch.autograd.Function whose forward runs the
  RnnCell scan (dnn/rnncell.py) on the JAX backend (TPU when present) and
  whose backward runs the cell's combined BWD+UPD.
* ``XsmmLSTM`` — an nn.Module-shaped wrapper holding torch parameters in
  this framework's (w [C,4K], r [K,4K], b [4K], gates i,c,f,o) layout.
* ``from_torch_lstm`` — converts a single-layer ``torch.nn.LSTM``'s weights
  (w_ih [4K,C], gate order i,f,g,o, two bias vectors) into that layout, the
  same weight-shuffle the TF op does on its inputs.

Data crosses frameworks through numpy (torch here is CPU-only; the JAX side
may be a TPU behind a transfer, so this path is an integration surface, not
a peak-throughput one).  torch imports are deferred so the core framework
never requires torch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..dnn.types import CellType, RnnDesc
from ..dnn.rnncell import create_rnncell


@functools.lru_cache(maxsize=64)
def _cell(t: int, n: int, c: int, k: int):
    # Memoized: one compiled cell (and its jit closures) is reused across
    # training steps, matching the TF op's cached-handle behavior — a fresh
    # RnnCell per forward() would retrace/recompile every step.
    desc = RnnDesc(n=n, c=c, k=k, max_t=t, cell_type=CellType.LSTM)
    return create_rnncell(desc)


def _np(x):
    return np.ascontiguousarray(x.detach().cpu().numpy(), dtype=np.float32)


class XsmmLSTMFunction:
    """torch.autograd.Function running LSTM fwd/bwd through the framework.

    Built lazily (class construction requires torch).
    """

    _impl = None

    @classmethod
    def _get(cls):
        if cls._impl is not None:
            return cls._impl
        import torch

        class _F(torch.autograd.Function):
            @staticmethod
            def forward(ctx, xt, w, r, b, h0, c0):
                t, n, c = xt.shape
                k = r.shape[0]
                cell = _cell(t, n, c, k)
                # forward_train keeps the backward residuals (the
                # reference handle's stored activations) so backward()
                # does NOT re-run the T-step forward scan
                (hs, h_t, c_t), saved = cell.forward_train(
                    _np(xt), _np(w), _np(r), _np(b), _np(h0), _np(c0))
                ctx.xsmm_saved = saved
                ctx.cell = cell
                # the JAX residuals can't go through save_for_backward,
                # but saving the torch inputs alongside keeps autograd's
                # version-counter check: mutating xt/w/r/b in place between
                # forward and backward raises instead of silently using the
                # forward-time snapshot (ADVICE r3)
                ctx.save_for_backward(xt, w, r, b)
                out = torch.from_numpy(np.array(hs))
                return (out,
                        torch.from_numpy(np.array(h_t)),
                        torch.from_numpy(np.array(c_t)))

            @staticmethod
            def backward(ctx, dhs, dh_t, dc_t):
                # touch saved_tensors so the version-counter check runs
                # (raises on in-place mutation since forward)
                _ = ctx.saved_tensors
                # dh_t feedback folds into dhs' last step (h_T IS hs[-1]).
                # dc_t is unsupported (as in the TF op, which differentiates
                # through hs only) — raise rather than silently dropping a
                # nonzero cell-state gradient.
                if dc_t is not None and bool((dc_t != 0).any()):
                    raise NotImplementedError(
                        "XsmmLSTM: gradients w.r.t. the final cell state c_T "
                        "are not supported; build the loss from hs/h_T only "
                        "(reference TF op differentiates through hs)")
                dhs = dhs.clone()
                dhs[-1] += dh_t
                grads = ctx.cell.backward_from_saved(ctx.xsmm_saved,
                                                     _np(dhs))
                dxt, dw, dr, db, dh0, dc0 = grads
                to_t = lambda a: torch.from_numpy(np.array(a))
                return (to_t(dxt), to_t(dw), to_t(dr), to_t(db),
                        to_t(dh0), to_t(dc0))

        cls._impl = _F
        return _F

    @classmethod
    def apply(cls, *args):
        return cls._get().apply(*args)


class XsmmLSTM:
    """nn.Module-shaped fused LSTM layer backed by the framework.

    Weights: w [C, 4K], r [K, 4K], b [4K]; gate order (i, c, f, o) —
    the rnncell layout (dnn/rnncell.py module docstring).
    """

    def __init__(self, input_size: int, hidden_size: int, seed: int = 0):
        import torch
        self.input_size = input_size
        self.hidden_size = hidden_size
        g = torch.Generator().manual_seed(seed)
        s = 1.0 / np.sqrt(hidden_size)
        self.w = torch.empty(input_size, 4 * hidden_size).uniform_(
            -s, s, generator=g).requires_grad_()
        self.r = torch.empty(hidden_size, 4 * hidden_size).uniform_(
            -s, s, generator=g).requires_grad_()
        self.b = torch.zeros(4 * hidden_size).requires_grad_()

    def parameters(self):
        return [self.w, self.r, self.b]

    def __call__(self, xt, h0=None, c0=None):
        """xt: [T, N, C] -> (hs [T,N,K], (h_T, c_T))."""
        import torch
        t, n, _ = xt.shape
        k = self.hidden_size
        if h0 is None:
            h0 = torch.zeros(n, k)
        if c0 is None:
            c0 = torch.zeros(n, k)
        hs, h_t, c_t = XsmmLSTMFunction.apply(xt, self.w, self.r, self.b,
                                              h0, c0)
        return hs, (h_t, c_t)


def from_torch_lstm(lstm) -> "XsmmLSTM":
    """Convert a 1-layer torch.nn.LSTM into an XsmmLSTM (weight shuffle).

    torch packs w_ih as [4K, C] with gate order (i, f, g, o) and uses two
    bias vectors; this framework packs [C, 4K] with gate order (i, c=g, f,
    o) and one bias — the same reordering the reference's TF op performs on
    its weight inputs.
    """
    import torch
    assert lstm.num_layers == 1 and not lstm.bidirectional
    k = lstm.hidden_size
    order = [0, 2, 1, 3]  # torch (i,f,g,o) -> ours (i,g,f,o)

    def regate(m):  # [4K, X] -> [X, 4K] reordered
        gates = m.reshape(4, k, -1)[order]
        return gates.reshape(4 * k, -1).T.contiguous()

    mod = XsmmLSTM(lstm.input_size, k)
    with torch.no_grad():
        mod.w = regate(lstm.weight_ih_l0).clone().requires_grad_()
        mod.r = regate(lstm.weight_hh_l0).clone().requires_grad_()
        bias = lstm.bias_ih_l0 + lstm.bias_hh_l0
        mod.b = bias.reshape(4, k)[order].reshape(-1).clone().requires_grad_()
    return mod
