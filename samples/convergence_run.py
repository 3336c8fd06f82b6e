#!/usr/bin/env python
"""Convergence proof: train a graph-built net to accuracy, record the curve.

  python samples/convergence_run.py [out.json] [--epochs N] [--width W]
      [--batch B] [--dtypes float32,bfloat16]

The GxM engine's whole point is training real nets to accuracy (top-1/top-5
per epoch, gxm/src/Engine.cpp:600-665).  This driver is the framework's
end-to-end evidence: a ResNet-18 built by the graph builder — conv fold,
custom_vjp backward, fused epilogues, BN running statistics, SGD+momentum,
bf16 master-weight handling — trained on the deterministic template task
(models/engine.template_batches) for several epochs, in BOTH f32 and bf16.

Success criteria (asserted, not just printed): final-epoch training loss
below 60% of the first epoch's, and validation top-1 at least 3x chance
through the global-stats (use_global_stats) eval path.

Writes a JSON artifact: per-epoch loss / train-acc / val top-1 / top-5 /
images-s per dtype.  CI runs the same path at toy scale
(tests/test_models.py::test_training_converges).
"""

import json
import sys
import time

from _common import np  # noqa: F401  (path setup)
import jax

import xsmm_tpu as xt
from xsmm_tpu.models import MLEngine, SolverConfig, googlenet, lenet, resnet
from xsmm_tpu.models.engine import (device_template_batches,
                                    template_batch_fn, template_batches)
from xsmm_tpu.parallel.mesh import make_mesh

# model builders for the convergence zoo (VERDICT r3 #7: more than one
# member with a captured accuracy curve).  Each entry: name ->
# (build(dtype, width, batch, hw, classes), hw, chans, classes, lr)
MODEL_ZOO = {
    "resnet18": (lambda dt, w, b, hw, cl: resnet(
        depth=18, num_classes=cl, width=w, input_shape=(b, hw, hw, 3),
        dtype=dt), 32, 3, 100, 0.02),
    # LeNet on MNIST shapes (28x28x1, lenet_train_val.prototxt); lr 0.002:
    # no BN, so momentum-SGD diverges at lenet_solver.prototxt's base 0.01
    # on the template task (swept in tests/test_models.py)
    "lenet": (lambda dt, w, b, hw, cl: lenet(
        num_classes=cl, input_shape=(b, hw, hw, 1), dtype=dt),
        28, 1, 10, 0.002),
    # GoogLeNet v1 WITH the aux-loss taps (multi-loss training path)
    "googlenet": (lambda dt, w, b, hw, cl: googlenet(
        num_classes=cl, width=w, input_shape=(b, hw, hw, 3), dtype=dt),
        64, 3, 100, 5e-3),
}

# Un-normalized v1 needs the slow-start protocol (the reference trains it
# ~100k ImageNet iterations, googlenet/v1/solver.prototxt): many short
# scan-fused epochs at lr 5e-3/poly.  Swept on-chip (r5): loss
# 7.38 -> 0.73 over 100x40 batches; per-batch dispatch at this epoch
# count would be all tunnel latency, so these models train via
# train_epoch_scan and validate every val_every epochs with
# device_template_batches (the SAME PRNGKey templates template_batch_fn
# bakes — the host numpy generator is a different task).
SCAN_PROTOCOL = {
    "googlenet": {"epochs": 100, "batches_per_epoch": 40, "val_every": 10},
}


def run_one(dtype: str, epochs: int, width: int, batch: int,
            model: str = "resnet18", sigma: float = 1.5,
            batches_per_epoch: int = 20):
    build, hw, chans, classes, lr = MODEL_ZOO[model]
    if model in SCAN_PROTOCOL:
        return run_one_scan(dtype, width, batch, model, sigma)
    params, fwd = build(dtype, width, batch, hw, classes)
    solver = SolverConfig(lr=lr, lr_policy="poly", max_epochs=epochs,
                          weight_decay=1e-4)
    ndev = len(jax.devices())
    eng = MLEngine(params, fwd, solver, mesh=make_mesh((ndev, 1),
                                                       ("dp", "mp")))
    on_tpu = xt.platform.is_tpu()
    epochs_out = []
    for ep in range(epochs):
        gen = device_template_batches if on_tpu else template_batches
        it = gen(batches_per_epoch, batch, hw=hw, classes=classes,
                 sigma=sigma, epoch=ep, chans=chans)
        stats = eng.train_epoch(it, verbose=False)
        # validation through the global-stats eval path (epoch-end VAL
        # network pass, Engine.cpp:642)
        # same template seed (same task!), fresh noise via unused epoch
        # indices — a held-out validation set
        vit = gen(4, batch, hw=hw, classes=classes, sigma=sigma,
                  epoch=1000 + ep, chans=chans)
        val = eng.validate(vit)
        row = {"epoch": ep, "loss": stats["loss"],
               "images_per_s": stats["images_per_s"],
               "val_top1": val["acc"], "val_top5": val["acc5"],
               "val_loss": val["loss"]}
        epochs_out.append(row)
        print(f"[{dtype}] epoch {ep}: loss {row['loss']:.4f} "
              f"val top1 {row['val_top1']:.3f} top5 {row['val_top5']:.3f} "
              f"{row['images_per_s']:.0f} img/s")
    first, last = epochs_out[0], epochs_out[-1]
    ok = (last["loss"] < 0.6 * first["loss"]
          and last["val_top1"] >= 3.0 / classes)
    return {"dtype": dtype, "epochs": epochs_out, "converged": bool(ok),
            "model": f"{model}/width{width}", "batch": batch,
            "classes": classes, "platform": xt.platform.backend()}


def run_one_scan(dtype: str, width: int, batch: int, model: str,
                 sigma: float = 1.5):
    """Slow-start protocol: many scan-fused epochs (SCAN_PROTOCOL)."""
    proto = SCAN_PROTOCOL[model]
    build, hw, chans, classes, lr = MODEL_ZOO[model]
    epochs, bpe = proto["epochs"], proto["batches_per_epoch"]
    params, fwd = build(dtype, width, batch, hw, classes)
    solver = SolverConfig(lr=lr, lr_policy="poly", max_epochs=epochs,
                          weight_decay=1e-4)
    ndev = len(jax.devices())
    eng = MLEngine(params, fwd, solver, mesh=make_mesh((ndev, 1),
                                                       ("dp", "mp")))
    bf = template_batch_fn(batch, hw=hw, classes=classes, sigma=sigma,
                           chans=chans)
    epochs_out = []
    for ep in range(epochs):
        stats = eng.train_epoch_scan(bpe, bf, batch, verbose=False,
                                     data_seed=ep)
        row = {"epoch": ep, "loss": stats["loss"],
               "images_per_s": stats["images_per_s"]}
        if ep % proto["val_every"] == 0 or ep == epochs - 1:
            # held-out noise + SAME PRNGKey templates as the batch fn
            vit = device_template_batches(
                4, batch, hw=hw, classes=classes, sigma=sigma,
                epoch=5000 + ep, chans=chans)
            val = eng.validate(vit)
            row.update(val_top1=val["acc"], val_top5=val["acc5"],
                       val_loss=val["loss"])
            print(f"[{dtype}] epoch {ep}: loss {row['loss']:.4f} "
                  f"val top1 {row['val_top1']:.3f} "
                  f"top5 {row['val_top5']:.3f} "
                  f"{row['images_per_s']:.0f} img/s", flush=True)
        epochs_out.append(row)
    first, last = epochs_out[0], epochs_out[-1]
    ok = (last["loss"] < 0.6 * first["loss"]
          and last["val_top1"] >= 3.0 / classes)
    return {"dtype": dtype, "epochs": epochs_out, "converged": bool(ok),
            "model": f"{model}/width{width}", "batch": batch,
            "classes": classes, "protocol": "scan_fused",
            "platform": xt.platform.backend()}


def main():
    argv = sys.argv[1:]

    def opt(flag, default, cast=int):
        if flag in argv:
            return cast(argv[argv.index(flag) + 1])
        return default

    out_path = argv[0] if argv and not argv[0].startswith("--") else \
        "CONVERGENCE.json"
    epochs = opt("--epochs", 8)
    width = opt("--width", 16 if xt.platform.is_tpu() else 8)
    batch = opt("--batch", 256 if xt.platform.is_tpu() else 32)
    dtypes = opt("--dtypes", "float32,bfloat16", str).split(",")
    models = opt("--models", "resnet18", str).split(",")

    results = []
    t0 = time.time()
    for model in models:
        for dt in dtypes:
            results.append(run_one(dt, epochs, width, batch, model=model))
    doc = {"results": results, "wall_s": round(time.time() - t0, 1),
           "all_converged": all(r["converged"] for r in results)}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"all_converged": doc["all_converged"],
                      "out": out_path}))
    if not doc["all_converged"]:
        raise SystemExit("convergence criteria NOT met — see " + out_path)


if __name__ == "__main__":
    main()
