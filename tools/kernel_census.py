"""Per-kernel census of a model segment from a real device trace.

Runs a scanned segment on the attached chip under ``jax.profiler.trace``,
parses the resulting xplane with ``jax.profiler.ProfileData``, and
aggregates device-side kernel executions by name: count, total time, mean.
This is the ground truth for the launch-bound analysis in ROOFLINE.md
(the reference has no analogue — its only timer is the master-rank
wall-clock print, pom.f:24-33).

Usage: python tools/kernel_census.py [--size 256] [--kb 31] [--steps 30]
                                     [--mode2] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_extpom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_traced(im, jm, kb, steps, mode2=False, trace_dir="/tmp/extpom_trace"):
    from extpom_tpu.cases.seamount import seamount_model

    kw = dict(mode=2, isplit=30, lramp=False) if mode2 else {}
    m = seamount_model(im=im, jm=jm, kb=kb, donate=False, **kw)
    m.run_segment(steps)                      # compile first variant
    jax.block_until_ready(m.state.el)
    m.run_segment(steps)                      # compile steady variant
    jax.block_until_ready(m.state.el)
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        m.run_segment(steps)
        jax.block_until_ready(m.state.el)
    return trace_dir


def device_kernel_stats(trace_dir):
    """Aggregate device-plane events by kernel name -> (count, total_ns)."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])
    stats = collections.defaultdict(lambda: [0, 0])
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # XLA op lines duplicate kernel-level events; keep launch lines
            if "XLA" in line.name and "Ops" in line.name:
                continue
            for ev in line.events:
                d = ev.duration_ns
                if d <= 0:
                    continue
                stats[ev.name][0] += 1
                stats[ev.name][1] += d
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kb", type=int, default=31)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mode2", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    trace_dir = run_traced(args.size, args.size, args.kb, args.steps,
                           mode2=args.mode2)
    stats = device_kernel_stats(trace_dir)
    rows = sorted(stats.items(), key=lambda kv: -kv[1][1])
    tot_ns = sum(v[1] for v in stats.values())
    tot_n = sum(v[0] for v in stats.values())
    print(f"\ndevice kernels over {args.steps} steps: {tot_n} executions, "
          f"{tot_ns/1e6:.2f} ms total "
          f"({tot_n/args.steps:.0f} launches/step, "
          f"{tot_ns/1e6/args.steps:.3f} ms/step)\n")
    print("| kernel | n | n/step | total ms | mean us | % |")
    print("|---|---|---|---|---|---|")
    for name, (n, ns) in rows[:args.top]:
        print(f"| {name[:72]} | {n} | {n/args.steps:.1f} | {ns/1e6:.2f} "
              f"| {ns/1e3/n:.1f} | {100*ns/tot_ns:.1f}% |")


if __name__ == "__main__":
    main()
