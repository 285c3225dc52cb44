"""Sweep the phase-kernel stripe size Bi on the attached chip.

Usage: python tools/phasetune.py [--size 256] [--kb 31] [--bi 32,48,64]

Monkeypatches pallas.phases.effective_block to each candidate and times
the scanned segment (bench configuration).  Mosaic OOM -> reported as
'oom'.  Used to pick the effective_block model constants.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_extpom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(size, kb, bi, n=50, out_double=True):
    from extpom_tpu.pallas import phases
    from extpom_tpu.cases.seamount import seamount_model

    orig = phases.phase_geometry
    phases.phase_geometry = lambda cfg, lanes=0: (bi, out_double)
    try:
        m = seamount_model(im=size, jm=size, kb=kb, donate=False,
                           phase_out_double=out_double)
        m.run_segment(n)
        jax.block_until_ready(m.state.el)
        m.run_segment(n)
        jax.block_until_ready(m.state.el)
        t0 = time.perf_counter()
        m.run_segment(n)
        jax.block_until_ready(m.state.el)
        dt = (time.perf_counter() - t0) / n
        return size * size * kb / dt, dt
    finally:
        phases.phase_geometry = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kb", type=int, default=31)
    ap.add_argument("--bi", default="24,32,40,48,64")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--no-out-double", action="store_true",
                    help="single-slot output windows (trades write-back "
                         "overlap for VMEM -> larger Bi on wide grids)")
    args = ap.parse_args()

    od = not args.no_out_double
    for bi in (int(x) for x in args.bi.split(",")):
        try:
            gps, dt = measure(args.size, args.kb, bi, args.steps,
                              out_double=od)
            print(f"Bi={bi:4d} out2={od}: {gps/1e6:8.1f} Mpt-steps/s "
                  f"({dt*1e3:.2f} ms/step)", flush=True)
        except Exception as e:                              # noqa: BLE001
            print(f"Bi={bi:4d} out2={od}: failed ({type(e).__name__}): "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
