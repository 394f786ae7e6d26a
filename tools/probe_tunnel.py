"""Measure axon-tunnel RPC behaviour that shapes the frame loop design.

Questions answered (run on the real TPU, nothing else on the host):
  1. Does an upload (jnp.asarray) block the main thread, and for how
     long, as a function of size?
  2. Do two back-to-back uploads cost two RTTs (serialised) or one?
  3. Does uploading from a background thread free the main thread?
  4. Link-ceiling loop at REALISTIC sizes: 722 KB image upload + 100 KB
     aux upload + dispatch + lagged background fetch, vs the same with
     ONE combined upload.

Prints one JSON line per experiment.
"""

import json
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


def t(fn, n=20, warm=3):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    a = np.asarray(ts) * 1e3
    return {"p50_ms": round(float(np.median(a)), 2),
            "mean_ms": round(float(a.mean()), 2),
            "min_ms": round(float(a.min()), 2)}


def main():
    dev = jax.devices()[0]
    print(json.dumps({"exp": "device", "dev": str(dev)}))

    sizes = [(1 << 10, "1KB"), (240 << 10, "240KB"),
             (722 << 10, "722KB"), (2 << 20, "2MB")]
    bufs = {name: np.zeros(n, np.uint8) for n, name in sizes}

    # 1. upload cost: call-return time (async part) vs completed time
    for name, b in bufs.items():
        r_call = t(lambda b=b: jnp.asarray(b))
        r_done = t(lambda b=b: jax.block_until_ready(jnp.asarray(b)))
        print(json.dumps({"exp": "upload", "size": name,
                          "call": r_call, "completed": r_done}))

    # 2. two uploads vs one combined of the same total bytes
    a7 = bufs["722KB"]
    a1 = np.zeros(100 << 10, np.uint8)
    comb = np.zeros((722 << 10) + (100 << 10), np.uint8)

    def two():
        x = jnp.asarray(a7); y = jnp.asarray(a1)
        jax.block_until_ready((x, y))

    def one():
        jax.block_until_ready(jnp.asarray(comb))

    print(json.dumps({"exp": "two_uploads_822KB", **t(two)}))
    print(json.dumps({"exp": "one_upload_822KB", **t(one)}))

    # 3. upload in a background thread: does the main thread stay free?
    def bg_upload():
        out = {}

        def w():
            out["x"] = jax.block_until_ready(jnp.asarray(a7))

        th = threading.Thread(target=w)
        t0 = time.perf_counter()
        th.start()
        # busy host work (what bookkeeping would do meanwhile)
        s = 0
        while time.perf_counter() - t0 < 0.001:
            s += 1
        t_free = time.perf_counter() - t0  # main thread got here fast?
        th.join()
        return time.perf_counter() - t0, t_free

    totals, frees = [], []
    for _ in range(20):
        tot, fr = bg_upload()
        totals.append(tot); frees.append(fr)
    print(json.dumps({
        "exp": "bg_upload_722KB",
        "total_p50_ms": round(float(np.median(totals)) * 1e3, 2),
        "main_free_after_p50_ms": round(float(np.median(frees)) * 1e3, 2),
    }))

    # 4. realistic frame loop: uploads + dispatch + lagged bg fetch
    imgs = np.zeros((2, 480, 752), np.uint8)
    aux = np.zeros(100 << 10, np.uint8)
    combo = np.zeros(imgs.size + aux.size, np.uint8)
    nimg = imgs.size

    @jax.jit
    def step2(im, ax):
        x = im.astype(jnp.float32).sum() + ax.astype(jnp.float32).sum()
        return jnp.zeros(4096, jnp.float32) + x

    @jax.jit
    def step1(c):
        im = c[:nimg].astype(jnp.float32)
        ax = c[nimg:].astype(jnp.float32)
        return jnp.zeros(4096, jnp.float32) + im.sum() + ax.sum()

    def loop(stepfn, mk):
        pending = None
        times = []
        for _ in range(30):
            t0 = time.perf_counter()
            if pending is not None:
                pending[0].join()
            out = stepfn(*mk())
            fut = {}
            th = threading.Thread(
                target=lambda o=out, f=fut: f.update(a=np.asarray(o)),
                daemon=True)
            th.start()
            pending = (th, fut)
            times.append(time.perf_counter() - t0)
        pending[0].join()
        a = np.asarray(times[5:]) * 1e3
        return {"p50_ms": round(float(np.median(a)), 2),
                "fps": round(1e3 / float(np.median(a)), 1)}

    jax.block_until_ready(step2(jnp.asarray(imgs), jnp.asarray(aux)))
    jax.block_until_ready(step1(jnp.asarray(combo)))
    print(json.dumps({"exp": "loop_two_uploads",
                      **loop(step2, lambda: (jnp.asarray(imgs),
                                             jnp.asarray(aux)))}))
    print(json.dumps({"exp": "loop_one_upload",
                      **loop(step1, lambda: (jnp.asarray(combo),))}))

    # 4b. one upload + TWO dispatches reading slices of it (the real
    # frame shape: frontend program + solve program share the carrier)
    @jax.jit
    def stepA(c):
        return c[:nimg].astype(jnp.float32).sum() + jnp.zeros(8)

    @jax.jit
    def stepB(c, prev):
        return jnp.zeros(4096, jnp.float32) + prev[0] \
            + c[nimg:].astype(jnp.float32).sum()

    def mk_two_dispatch():
        c = jnp.asarray(combo)
        a = stepA(c)
        return (c, a)

    @jax.jit
    def stepAB(c, prev):
        return stepB(c, stepA(c) + prev[:8])

    jax.block_until_ready(stepB(*mk_two_dispatch()))

    def loop2():
        pending = None
        times = []
        for _ in range(30):
            t0 = time.perf_counter()
            if pending is not None:
                pending[0].join()
            c = jnp.asarray(combo)
            a = stepA(c)
            out = stepB(c, a)
            fut = {}
            th = threading.Thread(
                target=lambda o=out, f=fut: f.update(a=np.asarray(o)),
                daemon=True)
            th.start()
            pending = (th, fut)
            times.append(time.perf_counter() - t0)
        pending[0].join()
        a = np.asarray(times[5:]) * 1e3
        return {"p50_ms": round(float(np.median(a)), 2),
                "fps": round(1e3 / float(np.median(a)), 1)}

    print(json.dumps({"exp": "loop_one_upload_two_dispatch", **loop2()}))


if __name__ == "__main__":
    main()
