"""Multi-stream scaling benchmark.

Measures aggregate engine throughput when N video streams are batched
through the vmapped multi-stream step (`parallel/multi_stream.py`) on the
available devices. On a single chip this quantifies batching efficiency
(fixed-cost amortization); on a pod slice the same code path shards the
stream axis over ICI (BASELINE scaling-efficiency metric).

Prints one JSON line per stream count plus a summary line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from flame_ros_tpu.parallel import multi_stream as ms

    params, cam, state, pyr, q, t = g._tiny_setup(
        height=240, width=320, max_features=1024)
    results = {}
    for S in (1, 2, 4, 8):
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), state)
        img_pyrs = jnp.broadcast_to(pyr[None], (S,) + pyr.shape)
        qs = jnp.broadcast_to(q[None], (S, 4))
        ts = jnp.broadcast_to(t[None], (S, 3))
        fids = jnp.ones((S,), jnp.int32)

        out = ms.batched_frame_step(batched, img_pyrs, qs, ts, fids,
                                    cam=cam, params=params)
        np.asarray(jax.tree.leaves(out[0])[0])[:1]
        n = 30
        t0 = time.perf_counter()
        st = batched
        for _ in range(n):
            st, idepth, cov = ms.batched_frame_step(
                st, img_pyrs, qs, ts, fids, cam=cam, params=params)
        np.asarray(idepth[:1, :1, :1])
        dt = time.perf_counter() - t0
        fps = S * n / dt
        results[S] = fps
        print(json.dumps({"metric": f"multistream_fps_{S}",
                          "value": round(fps, 2),
                          "unit": "frames/s aggregate"}))

    eff = results[8] / (8 * results[1]) if results.get(1) else 0.0
    print(json.dumps({"metric": "batching_efficiency_8_streams",
                      "value": round(eff, 3), "unit": "ratio",
                      "vs_baseline": round(eff / 0.8, 3)}))


if __name__ == "__main__":
    main()
