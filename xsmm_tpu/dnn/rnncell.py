"""RNN / LSTM / GRU cell handles.

Reference: src/libxsmm_dnn_rnncell*.c + templates (e.g.
libxsmm_dnn_rnncell_st_lstm_fwd_nc_kcck.tpl.c): per-timestep batch-reduce
GEMMs W.x_t and R.h_{t-1} feeding fused sigmoid/tanh gate elementwise code,
sequential T loop with a barrier per step; gate order i, c(=g), f, o.

TPU-native: all cells hoist the input projection x@W out of the T loop
as one flat [T*N, C] MXU GEMM (the reference's "diffused" W.x overlap);
the sequential h@R part runs as ONE scan-fused Pallas kernel with R
VMEM-resident across steps and the state in VMEM scratch (rnn_seq.py,
140.6 -> 171.6 TF for the LSTM forward — perf_notes "RNN forward
study").  Shapes outside the kernel's tiling envelope fall back to a
lax.scan (LSTM: fused [x_t, h] @ [W; R] per step).
Gate math is a fused VPU epilogue.  Backward is hand-scheduled via
custom_vjp for ALL cell types (the bwdupd-template structure): the reverse
scan does only gate-gradient elementwise + dh_prev = dz@R^T, and dx/dw/dr
are flat MXU GEMMs over T*N afterward — the autodiff VJP instead carried
the weight-gradient accumulator through the loop, which HBM-bound the
backward at ~49% of peak (perf_notes.md "LSTM backward study").

Weight layout: w [C, G*K], r [K, G*K], b [G*K] with G gates ordered
(i, c, f, o) for LSTM and (r, z, g) for GRU — matching the reference's
nc_kcck gate packing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .rnn_seq import (gru_seq, gru_seq_bwd, lstm_seq, lstm_seq_bwd,
                      rnn_seq, rnn_seq_bwd, seq_pallas_ok)
from .types import CellType, Kind, RnnDesc


def _prec(dt):
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dt) == jnp.float32 else None)


class RnnState(NamedTuple):
    h: jax.Array
    c: Optional[jax.Array]


class RnnCell:
    def __init__(self, desc: RnnDesc):
        self.desc = desc
        d = desc
        k = d.k
        act = {CellType.RNN_RELU: jax.nn.relu,
               CellType.RNN_SIGMOID: jax.nn.sigmoid,
               CellType.RNN_TANH: jnp.tanh}.get(d.cell_type)
        prec = _prec(d.in_dtype)

        # -- LSTM core with a hand-scheduled backward --------------------
        # The autodiff VJP of the forward scan accumulates dwr [C+K,4K]
        # f32 as a loop CARRY: 8MB of accumulator read+write per step
        # (measured: 512MB of HBM traffic at T=32 — the reason bwd+upd
        # sat at 97 TF ~ 49% peak, perf_notes.md "LSTM backward study").
        # The reference's bwdupd templates instead walk stored gate
        # activations and batch the weight-gradient GEMMs over T
        # (libxsmm_dnn_rnncell_st_lstm_bwdupd_*.tpl.c).  Same plan here:
        #   sequential scan: gate-grad elementwise + dh_prev = dz@R^T only
        #   after the scan:  dx  = dz_flat @ W^T         (one MXU GEMM)
        #                    dwr = [x,h_prev]^T @ dz_flat (one MXU GEMM,
        #                          contraction over T*N — MXU-sized)
        # Recurrent-weight storage dtype for the scan-fused Pallas path:
        # native bf16 MXU pass in bf16 mode (the XLA scan's default
        # precision truncates to bf16 anyway), f32 + HIGHEST otherwise.
        r_dt = (jnp.bfloat16 if jnp.dtype(d.in_dtype) == jnp.bfloat16
                else jnp.float32)

        def _lstm_core_fwd(xt_f, wr, b, h0, c0, train=True):
            t_, n_, c_in = xt_f.shape
            if seq_pallas_ok(n_, k, 4, jnp.dtype(r_dt).itemsize):
                # Scan-fused Pallas forward (rnn_seq.py): hoist x@W as one
                # flat MXU GEMM; the sequential h@R loop runs as ONE kernel
                # with R VMEM-resident across steps.  140.6 -> 171.6 TF
                # (perf_notes.md "RNN forward study").
                zx = (jnp.matmul(xt_f.reshape(t_ * n_, c_in), wr[:c_in],
                                 precision=prec,
                                 preferred_element_type=jnp.float32) + b
                      ).reshape(t_, n_, 4 * k)
                r_seq = wr[c_in:].astype(r_dt)
                out = lstm_seq(zx, r_seq, h0, c0, k=k, prec=prec,
                               train=train)
                if train:
                    hs, h_t, c_t, cs, is_, gs, fs, os_ = out
                    return (hs, h_t, c_t), (cs, is_, gs, fs, os_)
                return tuple(out), None

            def body(carry, x_t):
                h, c = carry
                z = jnp.matmul(jnp.concatenate([x_t, h], axis=1), wr,
                               precision=prec,
                               preferred_element_type=jnp.float32) + b
                i = jax.nn.sigmoid(z[:, 0 * k:1 * k])
                g = jnp.tanh(z[:, 1 * k:2 * k])
                f = jax.nn.sigmoid(z[:, 2 * k:3 * k])
                o = jax.nn.sigmoid(z[:, 3 * k:4 * k])
                c2 = f * c + i * g
                h2 = o * jnp.tanh(c2)
                return (h2, c2), (h2, c2, i, g, f, o)
            (h_t, c_t), (hs, cs, is_, gs, fs, os_) = jax.lax.scan(
                body, (h0, c0), xt_f)
            return (hs, h_t, c_t), (cs, is_, gs, fs, os_)

        @jax.custom_vjp
        def lstm_core(xt_f, wr, b, h0, c0):
            return _lstm_core_fwd(xt_f, wr, b, h0, c0, train=False)[0]

        def lstm_core_f(xt_f, wr, b, h0, c0):
            out, res = _lstm_core_fwd(xt_f, wr, b, h0, c0, train=True)
            hs = out[0]
            return out, (xt_f, wr, h0, c0, hs, res)

        def lstm_core_b(saved, cot):
            xt_f, wr, h0, c0, hs, (cs, is_, gs, fs, os_) = saved
            dhs, dh_t, dc_t = cot
            t_, n_, c_in = xt_f.shape
            if seq_pallas_ok(n_, k, 4, jnp.dtype(r_dt).itemsize):
                # Scan-fused Pallas reverse pass (rnn_seq.lstm_seq_bwd):
                # R^T VMEM-resident, (dh, dc) carried in scratch, tanh(cs)
                # in-kernel, c_prev a shifted block view — the lax.scan
                # path below ran at ~67 TF effective from per-step
                # overhead + the concat/tanh full-array HBM passes.
                dzs, dh0, dc0, db_k = lstm_seq_bwd(
                    dhs, is_, gs, fs, os_, cs, c0,
                    dh_t.astype(jnp.float32), dc_t.astype(jnp.float32),
                    wr[c_in:].T.astype(r_dt), k=k, prec=prec, dz_dt=r_dt)
                db = db_k.reshape(4 * k)
            else:
                c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
                tanh_cs = jnp.tanh(cs)
                r_t = wr[c_in:].T  # [4K, K]

                def body(carry, inp):
                    dh_next, dc_next = carry
                    dh_out, i, g, f, o, cp, tc = inp
                    dh = dh_out.astype(jnp.float32) + dh_next
                    do = dh * tc
                    dc = dc_next + dh * o * (1.0 - tc * tc)
                    dzi = dc * g * i * (1.0 - i)
                    dzg = dc * i * (1.0 - g * g)
                    dzf = dc * cp * f * (1.0 - f)
                    dzo = do * o * (1.0 - o)
                    dz = jnp.concatenate([dzi, dzg, dzf, dzo], axis=1)
                    dh_prev = jnp.matmul(dz, r_t, precision=prec,
                                         preferred_element_type=jnp.float32)
                    return (dh_prev, dc * f), dz

                (dh0, dc0), dzs = jax.lax.scan(
                    body, (dh_t.astype(jnp.float32),
                           dc_t.astype(jnp.float32)),
                    (dhs, is_, gs, fs, os_, c_prev, tanh_cs), reverse=True)
                db = jnp.sum(dzs.reshape(t_ * n_, 4 * k), axis=0)
            dz_flat = dzs.reshape(t_ * n_, 4 * k)
            dx = jnp.matmul(dz_flat, wr[:c_in].T, precision=prec,
                            preferred_element_type=jnp.float32
                            ).reshape(t_, n_, c_in)
            # dw and dr as separate flat GEMMs against x and hs views:
            # building concat([x, h_prev]) materialized T*N*(C+K) f32
            # twice (the shifted h_prev copy + the lane concat) — ~32MB
            # of pure HBM copy at the driver shape.  hs[:-1]/dz[n:] are
            # contiguous views; the t=0 term is a tiny [K,N]@[N,4K] GEMM.
            dw = jnp.matmul(xt_f.reshape(t_ * n_, c_in).T, dz_flat,
                            precision=prec,
                            preferred_element_type=jnp.float32)
            dr = (jnp.matmul(h0.T, dz_flat[:n_], precision=prec,
                             preferred_element_type=jnp.float32)
                  + jnp.matmul(
                      hs[:-1].reshape((t_ - 1) * n_, k).T,
                      dz_flat[n_:], precision=prec,
                      preferred_element_type=jnp.float32))
            dwr = jnp.concatenate([dw, dr], axis=0)
            return dx, dwr, db, dh0, dc0

        lstm_core.defvjp(lstm_core_f, lstm_core_b)

        # -- GRU / simple-RNN cores, same backward discipline ------------
        # Forward: the input projection x@W (+b) for ALL steps is ONE flat
        # MXU GEMM before the scan (the reference's "diffused" W.x overlap,
        # lstm/gru fwd templates); only h@R stays sequential.  Backward:
        # reverse scan emits per-step gate grads, then dx/dw/dr are flat
        # GEMMs over T*N — no weight-grad accumulator in the loop carry.
        def _mm(a, bm):
            return jnp.matmul(a, bm, precision=prec,
                              preferred_element_type=jnp.float32)

        def _gru_core_fwd(xt_f, w_, r_, b_, h0, train=True):
            t_, n_, c_in = xt_f.shape
            zx = (_mm(xt_f.reshape(t_ * n_, c_in), w_) + b_
                  ).reshape(t_, n_, 3 * k)
            if seq_pallas_ok(n_, k, 3, jnp.dtype(r_dt).itemsize):
                out = gru_seq(zx, r_.astype(r_dt), h0, k=k, prec=prec,
                              train=train)
                if train:
                    hs, h_t, ris, zis, gis, zrgs = out
                    return (hs, h_t), (ris, zis, gis, zrgs)
                return tuple(out), None

            def body(h, zx_t):
                zr = _mm(h, r_)
                ri = jax.nn.sigmoid(zx_t[:, :k] + zr[:, :k])
                zi = jax.nn.sigmoid(zx_t[:, k:2 * k] + zr[:, k:2 * k])
                zr_g = zr[:, 2 * k:]
                gi = jnp.tanh(zx_t[:, 2 * k:] + ri * zr_g)
                h2 = (1.0 - zi) * gi + zi * h
                return h2, (h2, ri, zi, gi, zr_g)

            h_t, (hs, ris, zis, gis, zrgs) = jax.lax.scan(body, h0, zx)
            return (hs, h_t), (ris, zis, gis, zrgs)

        @jax.custom_vjp
        def gru_core(xt_f, w_, r_, b_, h0):
            return _gru_core_fwd(xt_f, w_, r_, b_, h0, train=False)[0]

        def gru_core_f(xt_f, w_, r_, b_, h0):
            out, res = _gru_core_fwd(xt_f, w_, r_, b_, h0, train=True)
            return out, (xt_f, w_, r_, h0, out[0], res)

        def gru_core_b(saved, cot):
            xt_f, w_, r_, h0, hs, (ris, zis, gis, zrgs) = saved
            dhs, dh_t = cot
            t_, n_, c_in = xt_f.shape
            if seq_pallas_ok(n_, k, 3, jnp.dtype(r_dt).itemsize):
                # Scan-fused Pallas reverse pass (rnn_seq.gru_seq_bwd).
                dzxs, dgiris, dh0, db_k = gru_seq_bwd(
                    dhs, ris, zis, gis, zrgs, hs, h0,
                    dh_t.astype(jnp.float32), r_.T.astype(r_dt),
                    k=k, prec=prec, dz_dt=r_dt)
                db = db_k.reshape(3 * k)
            else:
                h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
                r_t = r_.T

                def body(dh_next, inp):
                    dh_out, ri, zi, gi, zr_g, hp = inp
                    dh = dh_out.astype(jnp.float32) + dh_next
                    dzi_pre = dh * (hp - gi) * zi * (1.0 - zi)
                    dgi_pre = dh * (1.0 - zi) * (1.0 - gi * gi)
                    dri_pre = dgi_pre * zr_g * ri * (1.0 - ri)
                    dzx = jnp.concatenate(
                        [dri_pre, dzi_pre, dgi_pre], axis=1)
                    dgiri = dgi_pre * ri
                    dzr = jnp.concatenate(
                        [dri_pre, dzi_pre, dgiri], axis=1)
                    dh_prev = dh * zi + _mm(dzr, r_t)
                    # emit dzx + only dzr's g-column: its r,z parts equal
                    # dzx's, so the full dzr is reassembled post-scan —
                    # 33% less residual emit traffic than stacking both
                    return dh_prev, (dzx, dgiri)

                dh0, (dzxs, dgiris) = jax.lax.scan(
                    body, dh_t.astype(jnp.float32),
                    (dhs, ris, zis, gis, zrgs, h_prev), reverse=True)
                db = jnp.sum(dzxs.reshape(t_ * n_, 3 * k), axis=0)
            dzx_flat = dzxs.reshape(t_ * n_, 3 * k)
            dzr_flat = jnp.concatenate(
                [dzx_flat[:, :2 * k], dgiris.reshape(t_ * n_, k)], axis=1)
            dx = _mm(dzx_flat, w_.T).reshape(t_, n_, c_in)
            dw = _mm(xt_f.reshape(t_ * n_, c_in).T, dzx_flat)
            # h_prev^T @ dzr without materializing the shifted h_prev
            # copy: hs[:-1]/dzr[n:] are contiguous views, plus a tiny
            # [K,N]@[N,3K] GEMM for the t=0 term.
            dr = (_mm(h0.T, dzr_flat[:n_])
                  + _mm(hs[:-1].reshape((t_ - 1) * n_, k).T,
                        dzr_flat[n_:]))
            return dx, dw, dr, db, dh0

        gru_core.defvjp(gru_core_f, gru_core_b)

        def _rnn_core_fwd(xt_f, w_, r_, b_, h0):
            t_, n_, c_in = xt_f.shape
            zx = (_mm(xt_f.reshape(t_ * n_, c_in), w_) + b_
                  ).reshape(t_, n_, k)
            if seq_pallas_ok(n_, k, 1, jnp.dtype(r_dt).itemsize):
                return tuple(rnn_seq(zx, r_.astype(r_dt), h0, k=k,
                                     prec=prec, act=act))

            def body(h, zx_t):
                h2 = act(zx_t + _mm(h, r_))
                return h2, h2

            h_t, hs = jax.lax.scan(body, h0, zx)
            return hs, h_t

        @jax.custom_vjp
        def rnn_core(xt_f, w_, r_, b_, h0):
            return _rnn_core_fwd(xt_f, w_, r_, b_, h0)

        def rnn_core_f(xt_f, w_, r_, b_, h0):
            out = _rnn_core_fwd(xt_f, w_, r_, b_, h0)
            return out, (xt_f, w_, r_, h0, out[0])

        def rnn_core_b(saved, cot):
            xt_f, w_, r_, h0, hs = saved
            dhs, dh_t = cot
            t_, n_, c_in = xt_f.shape
            r_t = r_.T
            ct = d.cell_type

            def dact(h2):
                # activation derivative from the OUTPUT (all three acts
                # admit it): relu' = 1[h2>0], sig' = h2(1-h2),
                # tanh' = 1-h2^2
                if ct == CellType.RNN_RELU:
                    return (h2 > 0).astype(jnp.float32)
                if ct == CellType.RNN_SIGMOID:
                    return h2 * (1.0 - h2)
                return 1.0 - h2 * h2

            if seq_pallas_ok(n_, k, 1, jnp.dtype(r_dt).itemsize):
                # Scan-fused Pallas reverse pass (rnn_seq.rnn_seq_bwd).
                dzs, dh0, db_k = rnn_seq_bwd(
                    dhs, hs, dh_t.astype(jnp.float32),
                    r_t.astype(r_dt), k=k, prec=prec, dact=dact,
                    dz_dt=r_dt)
                db = db_k.reshape(k)
            else:
                def body(dh_next, inp):
                    dh_out, h2 = inp
                    dz = (dh_out.astype(jnp.float32) + dh_next) * dact(h2)
                    return _mm(dz, r_t), dz

                dh0, dzs = jax.lax.scan(body, dh_t.astype(jnp.float32),
                                        (dhs, hs), reverse=True)
                db = jnp.sum(dzs.reshape(t_ * n_, k), axis=0)
            dz_flat = dzs.reshape(t_ * n_, k)
            dx = _mm(dz_flat, w_.T).reshape(t_, n_, c_in)
            dw = _mm(xt_f.reshape(t_ * n_, c_in).T, dz_flat)
            # h_prev^T @ dz without the shifted h_prev copy (see LSTM)
            dr = (_mm(h0.T, dz_flat[:n_])
                  + _mm(hs[:-1].reshape((t_ - 1) * n_, k).T,
                        dz_flat[n_:]))
            return dx, dw, dr, db, dh0

        rnn_core.defvjp(rnn_core_f, rnn_core_b)

        def fwd(xt, w, r, b, h0, c0):
            h0 = h0.astype(jnp.float32)
            c0 = (c0.astype(jnp.float32) if c0 is not None
                  else jnp.zeros_like(h0))
            out_dt = jnp.dtype(d.out_dtype)
            if d.cell_type == CellType.LSTM:
                wr = jnp.concatenate([w, r], axis=0)
                hs, h_t, c_t = lstm_core(xt.astype(jnp.float32), wr, b,
                                         h0, c0)
                return hs.astype(out_dt), h_t, c_t
            if d.cell_type == CellType.GRU:
                hs, h_t = gru_core(xt.astype(jnp.float32), w, r, b, h0)
                return hs.astype(out_dt), h_t, c0
            hs, h_t = rnn_core(xt.astype(jnp.float32), w, r, b, h0)
            return hs.astype(out_dt), h_t, c0

        self._fwd = jax.jit(fwd)

        def loss_free_fwd(xt, w, r, b, h0, c0):
            hs, h_t, c_t = fwd(xt, w, r, b, h0, c0)
            return hs, (h_t, c_t)

        @jax.jit
        def bwd(xt, w, r, b, h0, c0, dhs):
            _, vjp, _ = jax.vjp(loss_free_fwd, xt, w, r, b, h0, c0,
                                has_aux=True)
            # the cotangent must match the fwd output dtype (out_dtype)
            return vjp(dhs.astype(jnp.dtype(d.out_dtype)))

        self._bwd = bwd

        # -- saved-residual path (no forward recompute) ------------------
        # The reference handle KEEPS the per-step activations between
        # execute(FWD) and execute(BWD/UPD) calls (the 25+ scratch tensors
        # on libxsmm_dnn_rnncell, libxsmm_main.h:600-693) — the backward
        # never re-runs the forward.  backward_weight_update() above is
        # the stateless analog and pays one forward recompute inside
        # jax.vjp; these two entries expose the stored-activation
        # contract: forward_train returns the custom-vjp residuals,
        # backward_from_saved consumes them.
        def fwd_train(xt, w, r, b, h0, c0):
            h0 = h0.astype(jnp.float32)
            c0 = c0.astype(jnp.float32)
            out_dt = jnp.dtype(d.out_dtype)
            xt_f = xt.astype(jnp.float32)
            if d.cell_type == CellType.LSTM:
                wr = jnp.concatenate([w, r], axis=0)
                (hs, h_t, c_t), saved = lstm_core_f(xt_f, wr, b, h0, c0)
            elif d.cell_type == CellType.GRU:
                (hs, h_t), saved = gru_core_f(xt_f, w, r, b, h0)
                c_t = c0
            else:
                (hs, h_t), saved = rnn_core_f(xt_f, w, r, b, h0)
                c_t = c0
            return (hs.astype(out_dt), h_t, c_t), saved

        self._fwd_train = jax.jit(fwd_train)

        def bwd_saved(saved, dhs):
            # route the cotangent through out_dtype first so this path is
            # bit-identical to the stateless backward_weight_update (which
            # differentiates through the out_dtype cast) — ADVICE r3
            dhs = dhs.astype(jnp.dtype(d.out_dtype)).astype(jnp.float32)
            z = jnp.zeros((d.n, k), jnp.float32)
            if d.cell_type == CellType.LSTM:
                dx, dwr, db, dh0, dc0 = lstm_core_b(saved, (dhs, z, z))
                return dx, dwr[:d.c], dwr[d.c:], db, dh0, dc0
            if d.cell_type == CellType.GRU:
                dx, dw, dr, db, dh0 = gru_core_b(saved, (dhs, z))
            else:
                dx, dw, dr, db, dh0 = rnn_core_b(saved, (dhs, z))
            return dx, dw, dr, db, dh0, jnp.zeros_like(dh0)

        self._bwd_saved = jax.jit(bwd_saved)

    # -- API (libxsmm_dnn_rnncell_execute_st analog) ---------------------------
    def forward(self, xt, w, r, b, h0=None, c0=None):
        """xt: [T,N,C]; returns (hs [T,N,K], h_T, c_T).

        hs is cast to desc.out_dtype; the carried states h_T/c_T stay
        f32 (the cell's internal state precision, like the reference's
        f32 csp/hp state tensors even in the bf16 templates) so stacked
        layers can chain them without reconversion loss.
        """
        d = self.desc
        if h0 is None:
            h0 = jnp.zeros((d.n, d.k), jnp.float32)
        if c0 is None:
            c0 = jnp.zeros((d.n, d.k), jnp.float32)
        return self._fwd(xt, w, r, b, h0, c0)

    def backward_weight_update(self, xt, w, r, b, dhs, h0=None, c0=None):
        """Combined BWD+UPD: returns (dxt, dw, dr, db, dh0, dc0).

        Stateless: re-runs the forward inside jax.vjp to rebuild the
        residuals.  A fwd-then-bwd training step should use
        forward_train()/backward_from_saved() instead, which keep the
        stored activations between the two calls (the reference handle's
        contract) and skip the recompute.
        """
        d = self.desc
        if h0 is None:
            h0 = jnp.zeros((d.n, d.k), jnp.float32)
        if c0 is None:
            c0 = jnp.zeros((d.n, d.k), jnp.float32)
        return self._bwd(xt, w, r, b, h0, c0, dhs)

    def forward_train(self, xt, w, r, b, h0=None, c0=None):
        """FWD that also returns the backward residuals.

        Returns ((hs, h_T, c_T), saved); pass ``saved`` to
        backward_from_saved.  Analog of the reference handle keeping the
        per-step activations in its scratch tensors between
        execute(FWD) and execute(BWD/UPD) (libxsmm_main.h:600-693).
        """
        d = self.desc
        if h0 is None:
            h0 = jnp.zeros((d.n, d.k), jnp.float32)
        if c0 is None:
            c0 = jnp.zeros((d.n, d.k), jnp.float32)
        return self._fwd_train(xt, w, r, b, h0, c0)

    def backward_from_saved(self, saved, dhs):
        """Combined BWD+UPD from forward_train's residuals (no forward
        recompute): returns (dxt, dw, dr, db, dh0, dc0).  Gradients flow
        through hs only (as in backward_weight_update)."""
        return self._bwd_saved(saved, dhs)

    def execute(self, kind: Kind, **t):
        if kind == Kind.FWD:
            return self.forward(t["input"], t["weight"], t["recur_weight"],
                                t["bias"], t.get("h0"), t.get("c0"))
        if kind in (Kind.BWD, Kind.UPD):
            return self.backward_weight_update(
                t["input"], t["weight"], t["recur_weight"], t["bias"],
                t["grad_hidden"], t.get("h0"), t.get("c0"))
        raise ValueError(kind)

    @property
    def num_gates(self) -> int:
        return {CellType.LSTM: 4, CellType.GRU: 3}.get(self.desc.cell_type, 1)


def create_rnncell(desc: RnnDesc) -> RnnCell:
    """libxsmm_dnn_create_rnncell analog."""
    return RnnCell(desc)
