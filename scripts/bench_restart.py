"""Warm-restart decomposition microbench (VERDICT round-5 item 1).

Round 4 reported a 460 s warm restart and asserted the 12 GB weight stream
was "host->HBM link-bound" (26 MB/s). This harness measures each term so the
bottleneck is named, not asserted — with READBACK-FORCED syncs throughout:
over the axon tunnel, block_until_ready returns when the local proxy has
queued the bytes, not when they are resident (it measured this ~20 MB/s
link at 925 MB/s in round 4; see _force / serving.py module docstring).

  1. raw host->HBM bandwidth of a FLAT buffer (the true link speed),
  2. the OLD path: device_put(leaf, Format) — host-side tiling conversion,
  3. the NEW path: device_put_retile (flat DMA + on-device retile),
  4. cold-cache disk read bandwidth of the on-disk leaf store,
  5. the full restart: deserialize AOT executables + stream_params_dir +
     first stage-1/stage-2 queries, with cold page caches when root,
     judged against the step-1 link floor.

Run on the real chip:  python scripts/bench_restart.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drop_caches() -> bool:
    """Best-effort page-cache drop (root only) so disk reads are truly cold."""
    try:
        os.system("sync")
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def _force(x) -> None:
    """Residency-forcing sync: block_until_ready over a buffering transport
    (the axon tunnel) acks bytes the local proxy has merely queued — it
    measured a ~20 MB/s link at 925 MB/s in round 4. A one-element readback
    cannot return before every byte of the put has landed in HBM."""
    np.asarray(x.reshape(-1)[:1])


def measure_link(dev, mb: int = 256) -> float:
    """Raw host->HBM MB/s for a flat int8 buffer, readback-forced."""
    a = np.random.default_rng(0).integers(-127, 128, (mb << 20,), dtype=np.int8)
    x = jax.device_put(a[: 4 << 20], dev)
    _force(x)
    del x
    t0 = time.perf_counter()
    x = jax.device_put(a, dev)
    _force(x)
    dt = time.perf_counter() - t0
    del x
    return mb / dt


def measure_host_retile(dev) -> tuple[float, float]:
    """(old_path_MBps, new_path_MBps) for a qkv-shaped int8 leaf."""
    from visualcloze_tpu.pipeline.serving import device_put_retile

    a = np.random.default_rng(1).integers(-127, 128, (19, 3072, 9216), dtype=np.int8)
    mb = a.nbytes / 1e6
    compiled = (
        jax.jit(lambda w: w.astype(jnp.bfloat16).sum())
        .lower(jax.ShapeDtypeStruct(a.shape, a.dtype))
        .compile()
    )
    fmt = compiled.input_formats[0][0]
    t0 = time.perf_counter()
    x = jax.device_put(a, fmt)
    _force(x)
    old = mb / (time.perf_counter() - t0)
    del x
    # warm the retile program so the new-path number is steady-state
    _force(device_put_retile(a, fmt))
    t0 = time.perf_counter()
    x = device_put_retile(a, fmt)
    _force(x)
    new = mb / (time.perf_counter() - t0)
    del x
    return old, new


def measure_disk(ckpt: str, budget_bytes: int = 2 << 30) -> float:
    """Sequential buffered-read MB/s over the leaf store (cold if root)."""
    import glob

    total = 0
    t0 = time.perf_counter()
    for f in sorted(glob.glob(os.path.join(ckpt, "0*.npy"))):
        with open(f, "rb", buffering=0) as fh:
            while True:
                b = fh.read(8 << 20)
                if not b:
                    break
                total += len(b)
        if total >= budget_bytes:
            break
    return total / 1e6 / (time.perf_counter() - t0)


def main() -> None:
    global jnp
    import jax.numpy as jnp

    from visualcloze_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    ckpt = os.environ.get("BENCH_INT8_CKPT", "build/bench_int8_ckpt")

    link = measure_link(dev)
    print(f"1) host->HBM link (flat 256 MB put, readback-forced): {link:.0f} MB/s")
    old, new = measure_host_retile(dev)
    print(f"2) OLD put path (host tiling, 538 MB leaf): {old:.0f} MB/s")
    print(f"3) NEW put path (flat DMA + device retile): {new:.0f} MB/s")

    cold = drop_caches()
    disk = measure_disk(ckpt)
    print(f"4) disk sequential read ({'cold' if cold else 'WARM'} cache): {disk:.0f} MB/s")

    if not os.path.exists(os.path.join(ckpt, "manifest.json")):
        print("5) skipped: no on-disk checkpoint (run bench.py once)")
        return

    # full restart: executables + weight stream + first queries, cold cache
    import bench
    from visualcloze_tpu.pipeline.aot import load_executable
    from visualcloze_tpu.pipeline.serving import stream_params_dir

    aot_dir = os.environ.get("VISUALCLOZE_AOT_DIR", "build/aot")
    import glob

    paths = {tag: sorted(glob.glob(os.path.join(aot_dir, f"{tag}-*.jaxexec")))
             for tag in ("stage1_int8", "stage2_int8")}
    if not (paths["stage1_int8"] and paths["stage2_int8"]):
        print("5) skipped: no AOT executables (run bench.py once)")
        return
    drop_caches()
    t0 = time.perf_counter()
    ex1 = load_executable(paths["stage1_int8"][-1])
    ex2 = load_executable(paths["stage2_int8"][-1])
    t_deser = time.perf_counter() - t0
    wf1, wf2 = ex1.input_formats[0], ex2.input_formats[0]
    tw0 = time.perf_counter()
    tree, stats = stream_params_dir(ckpt, wf1[0])
    t_stream = time.perf_counter() - tw0

    from visualcloze_tpu.config import FluxConfig
    from visualcloze_tpu.ops.schedule import ode_timesteps

    cfg = FluxConfig()
    ts1 = np.asarray(ode_timesteps(bench.STEPS, bench.L_IMG, do_shift=True))
    ts2 = np.asarray(ode_timesteps(bench.STEPS2, bench.L2, do_shift=False,
                                   strength=bench.NOISE2, time_shifting_factor=1.0))
    inp1, inp2 = bench.make_inputs(cfg), bench.make_inputs(cfg, l_img=bench.L2)
    x1, x2 = np.asarray(inp1["x"]), np.asarray(inp2["x"])
    tq0 = time.perf_counter()
    a1 = [jax.device_put(v, f) for v, f in zip((x1, ts1), wf1[1:])]
    a2 = [jax.device_put(v, f) for v, f in zip((x2, ts2), wf2[1:])]
    bench._sync(ex1(tree, *a1))
    bench._sync(ex2(tree, *a2))
    t_q = time.perf_counter() - tq0
    total = time.perf_counter() - t0
    link = measure_link(jax.devices()[0], mb=128)
    floor = stats["bytes"] / 1e6 / link
    print(
        f"5) restart total {total:.1f}s = deserialize {t_deser:.1f}s + "
        f"weight stream ENQUEUE {t_stream:.1f}s ({stats['bytes']/1e9:.1f} GB; "
        f"disk-thread {stats['disk_s']:.1f}s, overlapped) + "
        f"first queries {t_q:.1f}s (absorbs the transfer drain) "
        f"[{'cold' if cold else 'WARM'} page cache]; "
        f"link floor {floor:.0f}s at {link:.0f} MB/s readback-forced -> "
        f"{floor / max(total - t_deser, 1e-9):.0%} of link speed"
    )


if __name__ == "__main__":
    main()
