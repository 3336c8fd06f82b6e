"""Multi-process multi-host simulation — the noarch trick for DCN paths.

SURVEY.md §4: the reference has no multi-node CI; the TPU build must do
better by simulating multi-host with ``jax.distributed`` multi-process CPU
jobs (each process = one "host" with its own virtual devices).  This module
provides:

* ``worker_main`` — the per-process body: initializes jax.distributed,
  builds a GLOBAL mesh spanning all processes, and runs (a) the sharded
  model train step (dp x mp, tensor-parallel classifier) and (b) the
  ring-ppermute CSR SpMM — both therefore crossing PROCESS boundaries,
  which is where per-host data feeding and non-addressable shardings
  actually differ from the single-process virtual mesh.
* ``launch_dryrun`` — spawns N such processes (one coordinator) and fails
  loudly if any worker fails.

Run directly:  python -m xsmm_tpu.parallel.multihost [n_procs] [local_devs]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def worker_main(process_id: int, num_processes: int, coordinator: str,
                local_devices: int) -> None:
    # force the CPU platform with per-process virtual devices BEFORE any
    # backend initialization (same trick as tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count"
                    f"={local_devices}").strip()
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, (
        f"global device count {len(jax.devices())} != {n_global}")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import resnet
    from ..models.engine import softmax_xent
    from .mesh import make_mesh
    from . import dist_spmm

    # ---- (a) sharded train step across process boundaries ----------------
    dp = max(1, n_global // 2)
    mp = n_global // dp
    mesh = make_mesh((dp, mp), ("dp", "mp"))

    classes = 32
    params, forward = resnet(depth=18, num_classes=classes, width=8)
    meta = {k: v for k, v in params.items() if k.startswith("_")}
    train = {k: v for k, v in params.items() if not k.startswith("_")}
    repl = NamedSharding(mesh, P())
    # replicated device_put is multi-process-safe (same value everywhere)
    train = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), train)
    fc = train["layers"][-1]
    fc["w"] = jax.device_put(fc["w"], NamedSharding(mesh, P(None, "mp")))
    fc["b"] = jax.device_put(fc["b"], NamedSharding(mesh, P("mp")))

    batch = 2 * dp
    data_sh = NamedSharding(mesh, P("dp"))

    @jax.jit
    def make_batch(key):
        kx, ky = jax.random.split(key)
        x = jax.random.normal(kx, (batch, 32, 32, 3), jnp.float32)
        y = jax.random.randint(ky, (batch,), 0, classes, jnp.int32)
        return jax.lax.with_sharding_constraint(x, data_sh), \
            jax.lax.with_sharding_constraint(y, data_sh)

    def loss_fn(p, xb, yb):
        return softmax_xent(forward({**p, **meta}, xb), yb)

    @jax.jit
    def train_step(p, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        p2 = jax.tree_util.tree_map(lambda w, g: w - 0.01 * g, p, grads)
        return p2, loss

    with mesh:
        x, y = make_batch(jax.random.PRNGKey(0))
        new_params, loss = train_step(train, x, y)
        loss_val = float(jax.device_get(loss))  # replicated scalar
    assert np.isfinite(loss_val), f"non-finite loss {loss_val}"

    # ---- (b) ring CSR SpMM over the cross-process ring -------------------
    ring = make_mesh((1, n_global), ("dp", "mp"))
    rng = np.random.default_rng(0)
    m, k, n = 48, 8 * n_global, 128
    a = np.where(rng.random((m, k)) < 0.2,
                 rng.standard_normal((m, k)), 0.0).astype(np.float32)
    fn = dist_spmm.ring_spmm_csr(ring, a, n, dtype="float32")
    b_sh = NamedSharding(ring, P("mp", None))

    @jax.jit
    def make_b(key):
        b = jax.random.normal(key, (k, n), jnp.float32)
        return jax.lax.with_sharding_constraint(b, b_sh)

    with ring:
        b = make_b(jax.random.PRNGKey(1))
        c = fn(b)

        # on-device gate vs a densified reference (c is not addressable
        # from one process, so the comparison is computed as a replicated
        # scalar under the same mesh)
        a_dev = jax.device_put(jnp.asarray(a), NamedSharding(ring, P()))

        @jax.jit
        def rel_err(c_, b_, a_):
            ref = jnp.matmul(a_, b_, precision=jax.lax.Precision.HIGHEST)
            return (jnp.linalg.norm(c_[:m] - ref)
                    / jnp.linalg.norm(ref))
        err = float(jax.device_get(rel_err(c, b, a_dev)))
    assert err < 1e-3, f"ring CSR SpMM err {err}"

    print(f"[proc {process_id}] multihost dryrun OK: "
          f"{num_processes} processes x {local_devices} devices, "
          f"loss={loss_val:.4f}, ring_err={err:.2e}", flush=True)
    jax.distributed.shutdown()


def launch_dryrun(n_processes: int = 2, local_devices: int = 4,
                  timeout_s: float = 600.0, port: int = 0) -> None:
    """Spawn n_processes workers (this module as __main__) and join them."""
    import socket
    if not port:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the axon TPU plugin out of the workers (one tunnel chip cannot
    # be shared by N processes)
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = []
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for pid in range(n_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "xsmm_tpu.parallel.multihost",
             str(pid), str(n_processes), coordinator, str(local_devices)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    deadline = time.time() + timeout_s
    outs = []
    for p in procs:
        remaining = max(1.0, deadline - time.time())
        try:
            out, _ = p.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multihost dryrun timed out")
        outs.append(out.decode(errors="replace"))
    bad = [i for i, p in enumerate(procs) if p.returncode != 0]
    if bad:
        raise RuntimeError(
            "multihost dryrun failed in process(es) "
            f"{bad}:\n" + "\n".join(outs[i][-2000:] for i in bad))
    for o in outs:
        for line in o.splitlines():
            if "multihost dryrun OK" in line:
                print(line)


if __name__ == "__main__":
    _pid, _np, _coord, _ld = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], int(sys.argv[4]))
    worker_main(_pid, _np, _coord, _ld)
