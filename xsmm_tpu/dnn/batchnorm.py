"""Fused batch normalization (fwd + bwd) with eltwise-add / ReLU fusions.

Reference: src/libxsmm_dnn_fusedbatchnorm*.c with fuse flags BN / ELTWISE /
RELU combos (libxsmm_typedefs.h:378-391).  Running (global) statistics for
inference follow the GxM engine exactly (Caffe-style moving sums,
gxm/src/FusedBNormXSMM.cpp:427-467 and FusedBNorm.hpp:112-136):

  train:  gmean = gmean*mmf + batch_mean
          gvar  = gvar*mmf  + nhw/(nhw-1) * batch_var      (unbiased)
          scf   = scf*mmf + 1
  eval:   mean = gmean/scf;  var = gvar/scf   (use_global_stats path,
          FusedBNormXSMM.cpp:462-467)

TPU-native: the normalization, residual add, and ReLU are one fused VPU
epilogue under XLA; batch statistics are psum-able for the data-parallel
trainer (models/gxm) — pass axis_name to sync stats across the dp mesh axis
like a cross-replica BN.  Under jit with dp-sharded inputs the plain
reductions are already global (XLA inserts the collectives), so the running
sums are replica-consistent without explicit comms (the reference needs the
MLSL mean/var allreduce in FusedBNorm.cpp:774-798 for the same guarantee).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .types import BnDesc, BnFuse, Kind


class BnState(NamedTuple):
    mean: jax.Array
    var: jax.Array
    inv_std: jax.Array
    x_hat: jax.Array
    relu_mask: Optional[jax.Array]


class BnRunning(NamedTuple):
    """Global-statistics state (gmean/gvar moving sums + scaling factor).

    Mirrors GxM's (tenMeanData_, tenVarData_, scf_) triple: sums are scaled
    by 1/scf at use, so a fresh state (scf=0) has no history and the very
    first eval after one train step reproduces that step's batch stats.
    """

    gmean: jax.Array   # [C] moving sum of batch means
    gvar: jax.Array    # [C] moving sum of unbiased batch variances
    scf: jax.Array     # scalar normalizer: sum of mmf^i


class FusedBatchNorm:
    def __init__(self, desc: BnDesc, axis_name: Optional[str] = None):
        self.desc = desc
        d = desc
        red = (0, 1, 2)  # N, H, W of NHWC

        def fwd(x, gamma, beta, residual=None):
            x = x.astype(jnp.float32)
            mean = jnp.mean(x, axis=red)
            ex2 = jnp.mean(jnp.square(x), axis=red)
            if axis_name:
                # sync-BN: average the MOMENTS across replicas; averaging
                # per-shard variances would drop the between-shard variance
                mean = jax.lax.pmean(mean, axis_name)
                ex2 = jax.lax.pmean(ex2, axis_name)
            var = ex2 - jnp.square(mean)
            inv_std = jax.lax.rsqrt(var + d.eps)
            x_hat = (x - mean) * inv_std
            y = x_hat * gamma + beta
            if d.fuse & BnFuse.ELTWISE:
                if residual is None:
                    raise ValueError("ELTWISE fusion requires residual")
                y = y + residual.astype(jnp.float32)
            mask = None
            if d.fuse & BnFuse.RELU:
                mask = y > 0
                y = jnp.maximum(y, 0.0)
            return y.astype(jnp.dtype(d.dtype)), BnState(
                mean, var, inv_std, x_hat, mask)

        self._fwd = jax.jit(fwd)

        def bwd(dy, gamma, state: BnState):
            dy = dy.astype(jnp.float32)
            if state.relu_mask is not None:
                dy = jnp.where(state.relu_mask, dy, 0.0)
            dresidual = dy if d.fuse & BnFuse.ELTWISE else None
            nhw = d.n * d.h * d.w
            dgamma = jnp.sum(dy * state.x_hat, axis=red)
            dbeta = jnp.sum(dy, axis=red)
            if axis_name:
                dgamma = jax.lax.psum(dgamma, axis_name)
                dbeta = jax.lax.psum(dbeta, axis_name)
            dx_hat = dy * gamma
            s1 = jnp.sum(dx_hat, axis=red)
            s2 = jnp.sum(dx_hat * state.x_hat, axis=red)
            if axis_name:
                # cross-replica BN: the forward statistics were pmean'd, so
                # the mean-subtraction terms of dx must use the GLOBAL sums
                # and count or dx is not the gradient of the actual forward
                s1 = jax.lax.psum(s1, axis_name)
                s2 = jax.lax.psum(s2, axis_name)
                nhw = nhw * jax.lax.psum(1, axis_name)
            dx = (state.inv_std / nhw) * (
                nhw * dx_hat - s1 - state.x_hat * s2)
            out = (dx.astype(jnp.dtype(d.dtype)), dgamma, dbeta)
            return out + ((dresidual,) if dresidual is not None else ())

        self._bwd = jax.jit(bwd)

        def fwd_eval(x, gamma, beta, running: BnRunning, residual=None):
            # use_global_stats path (FusedBNormXSMM.cpp:462-467): normalize
            # with gmean/scf, gvar/scf — no batch reductions at all
            x = x.astype(jnp.float32)
            # scf==0 means no training history: normalize with the identity
            # stats (mean 0, var 1 — the standard running-stat init) so an
            # untrained model evaluates finitely instead of dividing by 0
            has = running.scf > 0
            scf = jnp.where(has, running.scf, 1.0)
            mean = running.gmean / scf
            var = jnp.where(has, running.gvar / scf, 1.0)
            inv_std = jax.lax.rsqrt(var + d.eps)
            y = (x - mean) * inv_std * gamma + beta
            if d.fuse & BnFuse.ELTWISE:
                if residual is None:
                    raise ValueError("ELTWISE fusion requires residual")
                y = y + residual.astype(jnp.float32)
            if d.fuse & BnFuse.RELU:
                y = jnp.maximum(y, 0.0)
            return y.astype(jnp.dtype(d.dtype))

        self._fwd_eval = jax.jit(fwd_eval)

        def fwd_from_moments(x, gamma, beta, mean, var, residual=None):
            # FusedConvBN train path: the producing conv's BATCH_STATS_FWD
            # epilogue already reduced sum/sumsq, so normalization is one
            # elementwise pass — no stat reductions here (the reference
            # fuses exactly this way, gxm/src/FusedConvBNXSMM.cpp)
            x = x.astype(jnp.float32)
            inv_std = jax.lax.rsqrt(var + d.eps)
            x_hat = (x - mean) * inv_std
            y = x_hat * gamma + beta
            if d.fuse & BnFuse.ELTWISE:
                if residual is None:
                    raise ValueError("ELTWISE fusion requires residual")
                y = y + residual.astype(jnp.float32)
            mask = None
            if d.fuse & BnFuse.RELU:
                mask = y > 0
                y = jnp.maximum(y, 0.0)
            return y.astype(jnp.dtype(d.dtype)), BnState(
                mean, var, inv_std, x_hat, mask)

        self._fwd_from_moments = jax.jit(fwd_from_moments)

    def init_running(self) -> BnRunning:
        """Fresh global-stats state (all-zero sums, scf=0)."""
        c = self.desc.c
        return BnRunning(jnp.zeros((c,), jnp.float32),
                         jnp.zeros((c,), jnp.float32),
                         jnp.zeros((), jnp.float32))

    def update_running(self, running: BnRunning, state: BnState
                       ) -> BnRunning:
        """Fold one train step's batch stats into the moving sums
        (FusedBNormXSMM.cpp:427-457; nhw_ratio is the unbiased-variance
        correction nhw/(nhw-1))."""
        d = self.desc
        nhw = d.n * d.h * d.w
        ratio = jnp.float32(nhw / max(nhw - 1, 1))
        return BnRunning(
            running.gmean * d.mmf + state.mean,
            running.gvar * d.mmf + ratio * state.var,
            running.scf * d.mmf + 1.0)

    def forward(self, x, gamma, beta, residual=None):
        if residual is not None:
            return self._fwd(x, gamma, beta, residual)
        return self._fwd(x, gamma, beta)

    def forward_eval(self, x, gamma, beta, running: BnRunning,
                     residual=None):
        """Inference forward using the global statistics."""
        if residual is not None:
            return self._fwd_eval(x, gamma, beta, running, residual)
        return self._fwd_eval(x, gamma, beta, running)

    def forward_from_moments(self, x, gamma, beta, mean, var,
                             residual=None):
        """Train forward with externally-computed batch moments (from a
        producing conv's BATCH_STATS_FWD fusion); skips the reduction
        passes.  Returns (y, BnState) like forward."""
        if residual is not None:
            return self._fwd_from_moments(x, gamma, beta, mean, var,
                                          residual)
        return self._fwd_from_moments(x, gamma, beta, mean, var)

    def backward(self, dy, gamma, state):
        return self._bwd(dy, gamma, state)

    def execute(self, kind: Kind, **t):
        if kind == Kind.FWD:
            if "running" in t:
                return self.forward_eval(t["input"], t["gamma"], t["beta"],
                                         t["running"], t.get("residual"))
            return self.forward(t["input"], t["gamma"], t["beta"],
                                t.get("residual"))
        if kind == Kind.BWD:
            return self.backward(t["grad_output"], t["gamma"], t["state"])
        raise ValueError(kind)


def create_fusedbatchnorm(desc: BnDesc, axis_name=None) -> FusedBatchNorm:
    return FusedBatchNorm(desc, axis_name)
