"""Torch-binding tests — the tf_lstm_ops validation analog.

The reference validates its TF custom op against the host framework's own
LSTM; here XsmmLSTM is validated against torch.nn.LSTM outputs and grads.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from xsmm_tpu.bindings import XsmmLSTM, from_torch_lstm


def _ref_lstm(t=5, n=4, c=6, k=8, seed=0):
    torch.manual_seed(seed)
    return torch.nn.LSTM(c, k, num_layers=1, batch_first=False)


def test_forward_matches_torch():
    t, n, c, k = 5, 4, 6, 8
    ref = _ref_lstm(t, n, c, k)
    mod = from_torch_lstm(ref)
    x = torch.randn(t, n, c)
    hs_ref, (h_ref, c_ref) = ref(x)
    hs, (h_t, c_t) = mod(x)
    np.testing.assert_allclose(hs.detach().numpy(), hs_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h_t.detach().numpy(),
                               h_ref[0].detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c_t.detach().numpy(),
                               c_ref[0].detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_backward_matches_torch():
    t, n, c, k = 4, 3, 5, 7
    ref = _ref_lstm(t, n, c, k)
    mod = from_torch_lstm(ref)
    x = torch.randn(t, n, c)

    x_ref = x.clone().requires_grad_()
    hs_ref, _ = ref(x_ref)
    hs_ref.sum().backward()

    x_mine = x.clone().requires_grad_()
    hs, _ = mod(x_mine)
    hs.sum().backward()

    np.testing.assert_allclose(x_mine.grad.numpy(), x_ref.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
    # weight grads: shuffle torch's back into our layout for comparison
    order = [0, 2, 1, 3]
    gw_ref = (ref.weight_ih_l0.grad.reshape(4, k, -1)[order]
              .reshape(4 * k, -1).T)
    np.testing.assert_allclose(mod.w.grad.numpy(), gw_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_module_trains():
    mod = XsmmLSTM(input_size=6, hidden_size=8)
    opt = torch.optim.SGD(mod.parameters(), lr=0.5)
    x = torch.randn(5, 4, 6)
    target = torch.randn(5, 4, 8)
    losses = []
    for _ in range(5):
        opt.zero_grad()
        hs, _ = mod(x)
        loss = ((hs - target) ** 2).mean()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert losses[-1] < losses[0], losses
