#!/usr/bin/env python
"""End-to-end training CLI — the GxM sample analog.

  python samples/gxm_train.py [model] [epochs] [batch] [--ckpt DIR]

model in {resnet18, resnet50, alexnet, inception}. Uses the synthetic input
pipeline;
prints images/s per epoch (Engine.cpp:600 analog), checkpoints per epoch
when --ckpt is given, and resumes automatically from an existing checkpoint.
"""

import sys

from _common import measure  # noqa: F401  (path setup)
import xsmm_tpu as xt
from xsmm_tpu.models import (MLEngine, SolverConfig, alexnet, inception_v3,
                             resnet, synthetic_batches)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ckpt = None
    if "--ckpt" in sys.argv:
        ckpt = sys.argv[sys.argv.index("--ckpt") + 1]
    model = args[0] if args else "resnet18"
    epochs = int(args[1]) if len(args) > 1 else 2
    batch = int(args[2]) if len(args) > 2 else \
        (256 if xt.platform.is_tpu() else 32)

    if model == "alexnet":
        params, fwd = alexnet(num_classes=100)
        hw = 64
    elif model == "inception":
        params, fwd = inception_v3(
            num_classes=100, width=32 if xt.platform.is_tpu() else 8)
        hw = 128 if xt.platform.is_tpu() else 64
    else:
        depth = int(model.replace("resnet", "") or 18)
        params, fwd = resnet(depth=depth, num_classes=100,
                             width=64 if xt.platform.is_tpu() else 16)
        hw = 32

    solver = SolverConfig(lr=0.1, lr_policy="poly", max_epochs=epochs)
    eng = MLEngine(params, fwd, solver, checkpoint_dir=ckpt)
    if ckpt and eng.resume():
        print(f"resumed at epoch {eng.epoch}")

    batches_per_epoch = 20
    while eng.epoch < epochs:
        eng.train_epoch(synthetic_batches(batches_per_epoch, batch, hw=hw,
                                          classes=100, seed=eng.epoch))
        metrics = eng.validate(synthetic_batches(4, batch, hw=hw,
                                                 classes=100, seed=999))
        print(f"validation: loss={metrics['loss']:.4f} acc={metrics['acc']:.3f}")


if __name__ == "__main__":
    main()
