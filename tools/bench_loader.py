#!/usr/bin/env python
"""Host input-pipeline feed rate: native C++ libjpeg pool vs PIL.

The stage-1 device rate is 138.9 images/s at batch 32 (docs/PERF.md);
this measures whether the HOST side can keep that fed. Protocol: write N
synthetic 512x512 JPEGs once, then time (a) the per-file PIL fallback
path (decode + resize-512 + crop-448 + grayscale normalize — what
ops/image.py does), (b) native/loader.preprocess_file (the C++ single
call), (c) the threaded CxrLoader pool at 1/2/4 workers, and (d) the
full data/prefetch.py stage-1 iterator (pool + tokenize + device
staging). Prints one JSON line per row.

NOTE this container exposes ONE CPU core (verify skill), so pool threads
mostly measure decode efficiency + overlap, not parallel scaling — quote
the numbers with the core count attached. Usage:
  python tools/bench_loader.py [--n 128] [--repeat 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--size", type=int, default=512, help="source jpeg side")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from radialog_tpu.native.loader import (CxrLoader, native_available,
                                            preprocess_file)

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="cxr_bench_")
    paths = []
    for i in range(args.n):
        arr = (rng.random((args.size, args.size)) * 255).astype(np.uint8)
        p = os.path.join(tmp, f"img_{i:04d}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)

    ncpu = len(os.sched_getaffinity(0))

    def timed(fn):
        fn()                                    # warm (page cache, lib init)
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return args.n / best

    def pil_loop():
        # the PIL fallback path: ops/image.py decode+remap, then the
        # numpy/PIL resize-512 / crop-448 / normalize — one file at a time
        from radialog_tpu.ops.image import (load_image_grayscale,
                                            preprocess_cxr_np)
        for p in paths:
            preprocess_cxr_np(load_image_grayscale(p), resize=512, crop=448)

    rows = [{"mode": "pil_loop", "images_s": round(timed(pil_loop), 1)}]

    if native_available():
        def native_loop():
            for p in paths:
                preprocess_file(p, resize=512, crop=448)

        rows.append({"mode": "native_single",
                     "images_s": round(timed(native_loop), 1)})
        for threads in (1, 2, 4):
            def pool(th=threads):
                with CxrLoader(paths, batch=32, resize=512, crop=448,
                               threads=th) as ld:
                    for _ in ld.epoch(seed=0):
                        pass

            rows.append({"mode": f"native_pool_t{threads}",
                         "images_s": round(timed(pool), 1)})
    else:
        rows.append({"mode": "native", "images_s": None,
                     "note": "native build unavailable"})

    print(json.dumps({"n": args.n, "jpeg_side": args.size,
                      "host_cores": ncpu,
                      "device_rate_to_beat": "138.9 img/s (stage-1 b32)"}))
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
