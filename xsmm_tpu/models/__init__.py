"""Model zoo + training engine (the GxM framework analog).

Members mirror the reference zoo (samples/deeplearning/gxm/model_zoo):
AlexNet, ResNet {18,34,50}, Inception-v3, GoogLeNet (Inception-v1),
LeNet (mnist) and the CIFAR-10 net; MLEngine drives epoch/minibatch
training with data-parallel sharding, SGD solver schedules, checkpointing
and resume.
"""

from .engine import MLEngine, SolverConfig, softmax_xent, synthetic_batches
from .resnet import resnet
from .alexnet import alexnet
from .inception import inception_v3
from .googlenet import googlenet
from .toynets import lenet, cifar10net
