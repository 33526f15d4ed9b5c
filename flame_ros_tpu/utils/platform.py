"""Make the JAX_PLATFORMS request authoritative.

Environments that attach remote TPUs through a PJRT plugin registered
from `sitecustomize` (e.g. the axon relay in this container) can
OVERRIDE the platform the caller asked for: a process started with
`JAX_PLATFORMS=cpu` but an inherited PYTHONPATH silently initializes
the remote-TPU backend instead. That is not a crash — it is worse: the
run completes with the other backend's numerics. Measured here on the
VGA/200 acceptance protocol, identical code and inputs: idepth_rmse
0.0300 on the CPU backend vs 0.0480 on the hijacked TPU backend (the
rotation regime reads 0.029 vs 0.135) — a silently mislabeled result.

Call `pin_requested_platform()` before the first JAX operation in any
CLI entry point. Library code does not call it (embedders own their
backend choice); the test suite does the equivalent in conftest.py.
"""
import os


def pin_requested_platform() -> None:
    """If JAX_PLATFORMS requests cpu (and not axon), drop the axon
    backend factory so the request actually holds. No-op when the
    backend is already initialized or JAX_PLATFORMS is unset/non-cpu."""
    want = os.environ.get("JAX_PLATFORMS", "")
    # Pin only when cpu is the FIRST (preferred) platform in the
    # comma-separated list: "cpu" or "cpu,tpu" means a cpu-only intent,
    # while "tpu,cpu" (accelerator first, cpu fallback) must keep the
    # accelerator path (ADVICE r4).
    entries = [e.strip().lower() for e in want.split(",") if e.strip()]
    if not entries or entries[0] != "cpu" or "axon" in entries:
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
