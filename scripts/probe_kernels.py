"""Kernel superlinearity probe — the round-5c audit harness.

Times every pure-numpy kernel family at size S and 2S (4x the content)
and prints the wall-clock ratio; ratios well above the expected growth
flag a content-complexity wall that toy benchmarks and sf0.01 gates
never see. Round 5c caught six this way: the polygonize dict walk
(superquadratic tombstone scan), the generic dissolve assembler,
the Delaunay insertion passes, grid-linear's tris x nodes loop,
fillnodata's never-firing early exit, and the O(points x segments)
ray cast behind the overlay.

Informational (not a test): run on a QUIET host and read ratios, not
absolute walls. `python scripts/probe_kernels.py`
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def best(f, reps=2):
    w = 1e9
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        f()
        w = min(w, time.perf_counter() - t0)
    return w


def main():
    rng = np.random.default_rng(0)
    rows = []

    from godal_spark.operators import fill as FL
    from godal_spark.operators import polygonize as PZ
    from godal_spark.functions import resampling as RS
    from godal_spark.functions import tiff as T
    from godal_spark.functions import jpeg as J
    import godal_spark.functions.geom as G

    def probe(name, sizes, make, run, expect):
        walls = []
        for s in sizes:
            arg = make(s)
            walls.append(best(lambda: run(arg)))
        rows.append((name, sizes, walls, expect))

    probe("trace_rings perc0.6", (256, 512),
          lambda n: rng.random((n, n)) < 0.6,
          PZ._trace_rings, "4x")
    probe("label_components", (512, 1024),
          lambda n: (rng.random((n, n)) < 0.5).astype(np.uint8),
          FL.__dict__.get("label_components", PZ.label_components), "4x")
    probe("fillnodata 30% holes", (256, 512),
          lambda n: ((rng.random((n, n)).astype(np.float32)),
                     rng.random((n, n)) >= 0.3),
          lambda a: FL.fillnodata(a[0], a[1], max_distance=50), "4x")
    probe("dem_hillshade", (512, 1024),
          lambda n: np.cumsum(rng.standard_normal((n, n)), 0),
          FL.dem_hillshade, "4x")
    probe("viewshed", (257, 513),
          lambda n: (rng.random((n, n)) * 10, n // 2),
          lambda a: FL.viewshed(a[0], a[1], a[1], oz=2.0), "4x")
    probe("grid linear", (1000, 2000),
          lambda n: rng.random((n, 3)) * 100,
          lambda p: FL.grid_create("linear", p[:, 0], p[:, 1], p[:, 2],
                                   128, 128, 0, 100, 0, 100), "~2-4x")
    probe("grid invdist", (1000, 2000),
          lambda n: rng.random((n, 3)) * 100,
          lambda p: FL.grid_create("invdist", p[:, 0], p[:, 1], p[:, 2],
                                   128, 128, 0, 100, 0, 100), "2x")
    probe("mode resample ->n/3", (512, 1024),
          lambda n: rng.integers(0, 256, (n, n), dtype=np.uint8),
          lambda a: RS.resample(a, a.shape[1] // 3, a.shape[0] // 3,
                                alg="mode"), "4x")

    def star(nv):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        ring = np.column_stack([np.cos(ang) * (1 + 0.3 * rng.random(nv)),
                                np.sin(ang) * (1 + 0.3 * rng.random(nv))])
        return np.vstack([ring, ring[:1]])

    probe("overlay jagged", (1000, 2000),
          lambda nv: (G.Geom("Polygon", [star(nv)]),
                      G.Geom("Polygon", [star(nv) * 0.95 + 0.02])),
          lambda p: G.intersection(p[0], p[1]), "crossings-bound")
    probe("lzw encode smooth", (1 << 17, 1 << 18),
          lambda n: bytes(np.repeat(rng.integers(0, 40, n // 4), 4)
                          .astype(np.uint8)),
          T._lzw_encode, "2x")
    probe("jpeg encode rgb", (256, 512),
          lambda n: rng.integers(0, 256, (n, n, 3), dtype=np.uint8),
          lambda a: J.encode_jpeg(a, quality=90), "4x")
    probe("jpeg decode rgb", (256, 512),
          lambda n: J.encode_jpeg(
              rng.integers(0, 256, (n, n, 3), dtype=np.uint8), quality=90),
          J.decode_jpeg_real, "4x")
    probe("jpeg decode progressive", (256, 512),
          lambda n: J.encode_jpeg(
              rng.integers(0, 256, (n, n, 3), dtype=np.uint8), quality=90,
              progressive=True),
          J.decode_jpeg_real, "4x")

    print(f"{'kernel':26s} {'sizes':>12s} {'walls (ms)':>20s} ratio expect")
    for name, sizes, walls, expect in rows:
        ratio = walls[1] / max(walls[0], 1e-9)
        print(f"{name:26s} {str(sizes):>12s} "
              f"{1000 * walls[0]:9.1f} {1000 * walls[1]:9.1f} "
              f"{ratio:5.1f}x {expect}")


if __name__ == "__main__":
    main()
