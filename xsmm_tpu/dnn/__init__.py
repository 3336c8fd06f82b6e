"""DNN layer handles — the libxsmm_dnn domain, TPU-native.

Layer handles are stateless and functional: create from a descriptor, then
execute(kind) / forward / backward / weight_update.  See types.py for the
layout policy (NHWC/HWIO native; NCHW/KCRS converted at the boundary).
"""

from .types import (BnDesc, BnFuse, CellType, ConvDesc, FCDesc, Format,
                    FuseOp, Kind, PoolingDesc, PoolType, RnnDesc)
from .conv import ConvLayer, create_conv_layer
from .fullyconnected import FullyConnectedLayer, create_fullyconnected_layer
from .pooling import PoolingLayer, create_pooling_layer
from .batchnorm import BnRunning, FusedBatchNorm, create_fusedbatchnorm
from .rnncell import RnnCell, create_rnncell
from .quant import (RoundMode, dequantize, quantize, quantize_act,
                    quantize_fil)
