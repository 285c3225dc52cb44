"""Sweep per-phase window plans (Bi, in2, out2) on the attached chip.

Usage:
  python tools/phasetune.py [--size 256] [--kb 31] \
      [--phase tke] [--bi 32,40,48] [--in2 1] [--out2 0] [--steps 50]

Overrides ONE phase's :class:`extpom_tpu.pallas.phases.PhasePlan` to each
candidate (the other phases keep their model plans) and times the scanned
segment (bench configuration).  Mosaic OOM -> reported as failed.  Used to
anchor the per-phase VMEM model constants (_PHASE_TMP3, _SCRATCH_BUDGET).
With no --phase, prints the model's plans for the geometry and exits.
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


def measure(size, kb, phase, plan, n=50, block=64, base=None, jm=0):
    """Time the bench segment with ``phase`` forced to ``plan``; ``base``
    optionally forces every OTHER phase to one plan too (None = model)."""
    from extpom_tpu.pallas import phases
    from extpom_tpu.cases.seamount import seamount_model

    orig = phases.runner._exact_plan

    def patched(self, p, *a, **k):
        if p == phase:
            return phases.PhasePlan(*plan)
        if base is not None:
            return phases.PhasePlan(*base)
        return orig(self, p, *a, **k)

    phases.runner._exact_plan = patched
    jm = jm or size
    try:
        m = seamount_model(im=size, jm=jm, kb=kb, donate=False,
                           phase_block=block)
        m.run_segment(n)
        jax.block_until_ready(m.state.el)
        m.run_segment(n)
        jax.block_until_ready(m.state.el)
        t0 = time.perf_counter()
        m.run_segment(n)
        jax.block_until_ready(m.state.el)
        dt = (time.perf_counter() - t0) / n
        return size * jm * kb / dt, dt
    finally:
        phases.runner._exact_plan = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--jm", type=int, default=0)
    ap.add_argument("--kb", type=int, default=31)
    ap.add_argument("--phase", default=None,
                    help="phase to override (lat/uvw/tke/tracer/mom); "
                         "omit to print the model's plans")
    ap.add_argument("--bi", default="24,32,40,48,64")
    ap.add_argument("--in2", type=int, default=1)
    ap.add_argument("--out2", type=int, default=0)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--vmem", type=int, default=0,
                    help="override the phase kernels' vmem_limit_bytes "
                         "(MiB)")
    ap.add_argument("--base", default=None,
                    help="force every non-target phase to 'bi,in2,out2' "
                         "instead of the model plan")
    args = ap.parse_args()
    base = None
    if args.base:
        b = args.base.split(",")
        base = (int(b[0]), bool(int(b[1])), bool(int(b[2])))

    from extpom_tpu.pallas import phases
    from extpom_tpu.core.config import Config

    if args.vmem:
        phases.VMEM_LIMIT = args.vmem * 2 ** 20
        phases.VMEM_LIMIT_PLAIN = args.vmem * 2 ** 20
    if args.phase is None:
        cfg = Config(im=args.size, jm=args.jm or args.size, kb=args.kb,
                     phase_block=args.block)
        for p in phases.PHASES:
            print(p, tuple(phases.phase_plan(cfg, p)), flush=True)
        return

    for bi in (int(x) for x in args.bi.split(",")):
        plan = (bi, bool(args.in2), bool(args.out2))
        try:
            gps, dt = measure(args.size, args.kb, args.phase, plan,
                              args.steps, block=args.block, base=base,
                              jm=args.jm)
            print(f"{args.phase} {plan}: {gps/1e6:8.1f} Mpt-steps/s "
                  f"({dt*1e3:.2f} ms/step)", flush=True)
        except Exception as e:                              # noqa: BLE001
            print(f"{args.phase} {plan}: failed ({type(e).__name__}): "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
