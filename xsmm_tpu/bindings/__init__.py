"""Foreign-framework bindings.

Reference: samples/deeplearning/tf_lstm_ops — a TensorFlow custom op that
routes LSTM cell compute through the library.  Here the host framework is
PyTorch (torch_lstm); the C ABI for non-Python hosts lives in native/.
"""

from .torch_lstm import XsmmLSTMFunction, XsmmLSTM, from_torch_lstm
