#!/usr/bin/env python
"""End-to-end training CLI — the GxM sample analog.

  python samples/gxm_train.py [model] [epochs] [batch] [--ckpt DIR] \
      [--data FILE.xsd | --data IMAGE_DIR/] [--warmup EPOCHS]

model in {resnet18, resnet34, resnet50, alexnet, inception, googlenet,
lenet, cifar10}. Trains from a packed XSD1 dataset via the native
prefetching loader when --data is given (utils/dataset.py, the GxM LMDB
data-layer analog; a directory of class subfolders with ppm/pgm/bmp/mhd
images is ingested to XSD1 first), else the synthetic pipeline;
prints images/s per epoch (Engine.cpp:600 analog), checkpoints per epoch
when --ckpt is given, and resumes automatically from an existing checkpoint.
"""

import os
import sys

from _common import measure  # noqa: F401  (path setup)
import xsmm_tpu as xt
from xsmm_tpu.models import (MLEngine, SolverConfig, alexnet, inception_v3,
                             resnet, synthetic_batches)
from xsmm_tpu.models.engine import device_synthetic_batches


def main():
    flagvals = set()
    for flag in ("--ckpt", "--data", "--dtype", "--warmup"):
        if flag in sys.argv:
            flagvals.add(sys.argv[sys.argv.index(flag) + 1])
    args = [a for a in sys.argv[1:]
            if not a.startswith("--") and a not in flagvals]
    ckpt = data = None
    if "--ckpt" in sys.argv:
        ckpt = sys.argv[sys.argv.index("--ckpt") + 1]
    if "--data" in sys.argv:
        data = sys.argv[sys.argv.index("--data") + 1]
    # compute dtype: bfloat16 = the native MXU pass (the reference's
    # BF16 training path analog); float32 = HIGHEST-precision convs
    dtype = "float32"
    if "--dtype" in sys.argv:
        dtype = sys.argv[sys.argv.index("--dtype") + 1]
    model = args[0] if args else "resnet18"
    epochs = int(args[1]) if len(args) > 1 else 2
    batch = int(args[2]) if len(args) > 2 else \
        (256 if xt.platform.is_tpu() else 32)

    classes, chans = 100, 3
    if model == "alexnet":
        params, fwd = alexnet(num_classes=100, dtype=dtype)
        hw = 64
    elif model == "googlenet":
        from xsmm_tpu.models import googlenet
        params, fwd = googlenet(
            num_classes=100, width=64 if xt.platform.is_tpu() else 8,
            dtype=dtype)
        hw = 64
    elif model == "lenet":
        from xsmm_tpu.models import lenet
        params, fwd = lenet(num_classes=10, dtype=dtype)
        hw, classes, chans = 28, 10, 1
    elif model == "cifar10":
        from xsmm_tpu.models import cifar10net
        params, fwd = cifar10net(num_classes=10, dtype=dtype)
        hw, classes = 32, 10
    elif model == "inception":
        params, fwd = inception_v3(
            num_classes=100, width=32 if xt.platform.is_tpu() else 8,
            dtype=dtype)
        hw = 128 if xt.platform.is_tpu() else 64
    else:
        depth = int(model.replace("resnet", "") or 18)
        params, fwd = resnet(depth=depth, num_classes=100,
                             width=64 if xt.platform.is_tpu() else 16,
                             dtype=dtype)
        hw = 32

    # BN-less toy nets diverge at the resnet lr (see lenet_solver.prototxt
    # base_lr 0.01)
    lr = 0.01 if model in ("lenet", "cifar10") else 0.1
    # --warmup N: linear lr ramp over the first N epochs (the
    # resnet_solver.prototxt warmup_epochs/warmup_lr surface)
    warmup = int(sys.argv[sys.argv.index("--warmup") + 1]) \
        if "--warmup" in sys.argv else 0
    solver = SolverConfig(lr=lr, lr_policy="poly", max_epochs=epochs,
                          warmup_epochs=warmup, warmup_lr=lr * 0.1)
    eng = MLEngine(params, fwd, solver, checkpoint_dir=ckpt)
    if ckpt and eng.resume():
        print(f"resumed at epoch {eng.epoch}")

    # --augment: device-side JitterData analog (utils/augment.py) applied
    # to every training batch (pad-crop + mirror + brightness/contrast)
    aug = None
    if "--augment" in sys.argv:
        import jax
        from xsmm_tpu.utils.augment import make_augment
        aug = make_augment(crop=hw, pad=4, flip=True,
                           brightness=0.2, contrast=0.2)

    def with_aug(it, epoch):
        import jax
        key = jax.random.PRNGKey(1000 + epoch)
        for i, (x, y) in enumerate(it):
            yield aug(jax.random.fold_in(key, i), x), y

    # --data may be a DIRECTORY of class subdirectories with standard
    # image files (ppm/pgm/bmp/mhd): ingest to a packed XSD1 first — the
    # GxM JPEG-dir -> LMDB dataset-prep step (utils/images.py)
    if data and os.path.isdir(data):
        from xsmm_tpu.utils.images import ingest_image_dir
        out = data.rstrip("/") + ".xsd"
        if os.path.exists(out):
            print(f"using existing {out} (delete it to re-ingest)")
        else:
            man = ingest_image_dir(data, out, hw=(hw, hw), channels=chans)
            if len(man["classes"]) > classes:
                raise SystemExit(
                    f"dataset has {len(man['classes'])} classes but "
                    f"{model} was built with num_classes={classes}")
            print(f"ingested {man['n_images']} images, "
                  f"{len(man['classes'])} classes -> {out}")
        data = out

    batches_per_epoch = 20
    while eng.epoch < epochs:
        if data:
            from xsmm_tpu.utils.dataset import DataLoader
            train_iter = iter(DataLoader(data, batch=batch, epochs=1,
                                         seed=eng.epoch))
        elif xt.platform.is_tpu() and "--host-data" not in sys.argv:
            # device-generated data: measures the train step, not the
            # host->device tunnel (use --host-data for the full pipeline)
            train_iter = device_synthetic_batches(
                batches_per_epoch, batch, hw=hw, classes=classes,
                seed=eng.epoch, sharding=eng._data_sharding, chans=chans)
        else:
            train_iter = synthetic_batches(batches_per_epoch, batch, hw=hw,
                                           classes=classes, seed=eng.epoch,
                                           chans=chans)
        if aug is not None:
            train_iter = with_aug(train_iter, eng.epoch)
        eng.train_epoch(train_iter)
        metrics = eng.validate(synthetic_batches(4, batch, hw=hw,
                                                 classes=classes, seed=999,
                                                 chans=chans))
        print(f"validation: loss={metrics['loss']:.4f} acc={metrics['acc']:.3f}")


if __name__ == "__main__":
    main()
