"""Do concurrent device->host syncs overlap on the axon tunnel, or do
they serialise? Decides whether an adaptive pending-frame queue can make
the frame loop host-bound (overlap) or is capped at ~1/45ms (serial)."""

import json
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def prog(x, s):
    return x * 1.0001 + s


def timed_fetch(out, res, i):
    t0 = time.perf_counter()
    a = np.asarray(out)
    res[i] = time.perf_counter() - t0


def main():
    x = jnp.zeros(4096, jnp.float32)
    jax.block_until_ready(prog(x, 1.0))

    # 1 sync alone
    for trial in range(3):
        out = prog(x, 2.0)
        t0 = time.perf_counter()
        np.asarray(out)
        print(json.dumps({"exp": "one_sync", "ms":
                          round((time.perf_counter() - t0) * 1e3, 1)}))

    # K concurrent syncs from K threads
    for K in (2, 4, 8):
        outs = [prog(x, float(i)) for i in range(K)]
        res = [None] * K
        t0 = time.perf_counter()
        ths = [threading.Thread(target=timed_fetch, args=(o, res, i))
               for i, o in enumerate(outs)]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        total = time.perf_counter() - t0
        print(json.dumps({
            "exp": f"{K}_concurrent_syncs",
            "total_ms": round(total * 1e3, 1),
            "each_ms": [round(r * 1e3, 1) for r in res],
        }))

    # staggered: dispatch+fetch-thread per "frame", 20 ms apart — the
    # adaptive-queue shape
    times = []
    pend = []
    for i in range(20):
        t0 = time.perf_counter()
        out = prog(x, float(i))
        res = {}
        th = threading.Thread(
            target=lambda o=out, r=res: r.update(
                a=np.asarray(o), t=time.perf_counter()))
        th.start()
        pend.append((time.perf_counter(), th, res))
        while time.perf_counter() - t0 < 0.02:
            pass
        times.append(time.perf_counter() - t0)
    lat = []
    for t_start, th, res in pend:
        th.join()
        lat.append(res["t"] - t_start)
    print(json.dumps({
        "exp": "staggered_20ms",
        "fetch_latency_ms_p50": round(
            float(np.median(lat)) * 1e3, 1),
        "fetch_latency_ms_max": round(float(np.max(lat)) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
