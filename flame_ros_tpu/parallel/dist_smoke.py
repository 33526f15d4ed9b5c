"""Multi-process (multi-host analog) smoke worker.

Runs ONE full multi-stream engine step over a jax.distributed mesh whose
"feat" axis pairs devices from DIFFERENT processes, so the feature-axis
all-gathers of the graph step cross the process boundary — the CPU
analog of a multi-host TPU pod where model-sharding collectives ride DCN
(SURVEY §5.8). The reference has no distributed story at all (single
process, OpenMP); this is the scale-out path the TPU design adds.

Launched by tests/test_distributed.py as N worker subprocesses:

    python -m flame_ros_tpu.parallel.dist_smoke <pid> <nproc> <port>

Each worker must see a clean JAX environment: JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<local>, and no
remote-TPU plugin on PYTHONPATH (a single remote chip cannot host a
multi-process mesh).
"""
from __future__ import annotations

import sys

import numpy as np

LOCAL_DEVICES = 4  # per process


def main(pid: int, nproc: int, port: int) -> None:
    import jax
    jax.distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from flame_ros_tpu.parallel import multi_stream as ms

    n_global = nproc * LOCAL_DEVICES
    assert jax.device_count() == n_global, jax.device_count()
    devs = jax.devices()

    # Mesh rows pair one device from each process along "feat", so the
    # graph step's feature-axis collectives cross processes (DCN analog).
    arr = np.array(devs).reshape(nproc, LOCAL_DEVICES).T  # [local, nproc]
    mesh = Mesh(arr, ("stream", "feat"))
    n_stream = mesh.shape["stream"]

    # Identical tiny setup in every process (deterministic seed).
    params, cam, state, pyr, q, t = g._tiny_setup()

    def to_global(x, spec):
        sh = NamedSharding(mesh, spec)
        full = np.asarray(x)
        full = np.broadcast_to(full[None], (n_stream,) + full.shape)
        return jax.make_array_from_callback(full.shape, sh,
                                            lambda idx: full[idx])

    shardings = ms.state_shardings(mesh)
    batched = jax.tree.map(lambda x, s: to_global(x, s.spec), state,
                           shardings)
    img_pyrs = to_global(pyr, P("stream", None, None, None))
    qs = to_global(q, P("stream", None))
    ts = to_global(t, P("stream", None))
    fids = to_global(np.int32(1), P("stream"))

    with mesh:
        out_state, idepth, cov = ms.batched_frame_step(
            batched, img_pyrs, qs, ts, fids, cam=cam, params=params)

    # Every process checks its addressable coverage shards: finite,
    # positive, and identical across streams (identical inputs).
    vals = [float(np.asarray(s.data).ravel()[0])
            for s in cov.addressable_shards]
    assert vals, "no addressable coverage shards"
    assert all(np.isfinite(v) and v > 0.05 for v in vals), vals
    assert max(vals) - min(vals) < 1e-5, vals

    # Cross-process value exchange: reduce coverage over the stream axis
    # into a fully-replicated scalar (an explicit cross-process collective)
    # and check every process sees the same total.
    total = jax.jit(lambda c: c.sum(),
                    out_shardings=NamedSharding(mesh, P()))(cov)
    total = float(np.asarray(total.addressable_shards[0].data))
    assert abs(total - n_stream * vals[0]) < 1e-4, (total, vals)

    print(f"DIST_OK pid={pid} nproc={nproc} mesh={dict(mesh.shape)} "
          f"cov={vals[0]:.4f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
