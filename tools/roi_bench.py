#!/usr/bin/env python
"""Isolated RoIAlign-path benchmark on real hardware: compare kernel
variants (rois_per_step, hybrid vs windowed-only, XLA windowed) at
production Mask R-CNN shapes without paying the full-graph compile."""

import argparse
import functools
import time

import numpy as np

import _init_paths  # noqa: F401

print = functools.partial(print, flush=True)


def timeit(fn, args, n=8):
    import jax.numpy as jnp  # noqa: F401
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from detectron_tpu.ops import windowed_roi as wr

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--rois", type=int, default=1000)
    p.add_argument("--pooled", type=int, default=7)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    B, R, P = args.batch, args.rois, args.pooled
    H, W = 832, 1344
    C = 256
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    # P2..P5 pyramid at the production canvas — generated ON DEVICE (the
    # tunnel uploads at ~100 MB/s; 1.5 GB of host arrays would dominate).
    key = jax.random.PRNGKey(0)
    pyr = [jax.jit(lambda k, s=s: jax.random.normal(
        k, (B, H // s, W // s, C), dtype=dtype))(key)
        for s in (4, 8, 16, 32)]
    scales = (0.25, 0.125, 0.0625, 0.03125)

    # RoIs with realistic level mix: areas log-uniform in [32^2, 800^2]
    s = np.exp(rng.uniform(np.log(32.0), np.log(800.0), (B, R)))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (B, R)))
    w = s * np.sqrt(ar)
    h = s / np.sqrt(ar)
    x1 = rng.uniform(0, 1333 - 1, (B, R)) * (1 - w / 1333)
    y1 = rng.uniform(0, 800 - 1, (B, R)) * (1 - h / 800)
    rois = np.stack([x1, y1, np.minimum(x1 + w, 1332),
                     np.minimum(y1 + h, 799)], -1).astype(np.float32)
    rois = jnp.asarray(rois)

    floor = timeit(jax.jit(lambda x: x + 1.0),
                   (jnp.zeros((8,), jnp.float32),), n=16)
    print("floor {:.1f} ms".format(floor))

    # NB: the pyramid must be an ARGUMENT of every jitted fn — closing over
    # it embeds 1.5 GB of constants into the program, which the tunnel's
    # AOT compiler then tries to ship (hangs for minutes).
    def sumf(f):
        return jax.jit(lambda pyr, rois: jnp.sum(
            f(pyr, rois).astype(jnp.float32)))

    for rps in (8, 16, 24, 32):
        fn = sumf(lambda pyr, rois, rps=rps:
                  wr.multilevel_roi_align_pallas_hybrid(
                      pyr, scales, rois, pooled=P, sampling_ratio=2,
                      k_min=2, k_max=5, window=32, rois_per_step=rps))
        try:
            t = timeit(fn, (pyr, rois), n=args.iters)
            print("pallas_hybrid rps={:<3} {:.1f} ms".format(rps, t - floor))
        except Exception as e:
            print("pallas_hybrid rps={:<3} FAIL {}".format(
                rps, str(e)[:160]))

    for w, name in ((40, "w=40"), (32, "w=32")):
        fn = sumf(lambda pyr, rois, w=w:
                  wr.multilevel_roi_align_pallas(
                      pyr, scales, rois, P, 2, 2, 5, window=w,
                      rois_per_step=8))
        t = timeit(fn, (pyr, rois), n=args.iters)
        print("pallas_only  {}     {:.1f} ms".format(name, t - floor))

    from detectron_tpu.ops import roi_align as ra
    fn = sumf(lambda pyr, rois: jax.vmap(
        lambda f, rr: ra.roi_align(f, rr, scales[-1], P, P, 2)
    )(pyr[-1], rois))
    t = timeit(fn, (pyr, rois), n=args.iters)
    print("dense top P5          {:.1f} ms".format(t - floor))

    fn = sumf(lambda pyr, rois: jax.vmap(
        lambda im_pyr, rr: wr.multilevel_roi_align_windowed(
            im_pyr, scales, rr, P, 2, 2, 5, window=40)
    )(pyr, rois))
    t = timeit(fn, (pyr, rois), n=args.iters)
    print("xla windowed w=40     {:.1f} ms".format(t - floor))


if __name__ == "__main__":
    main()
