"""On-chip throughput of the shard_map path vs the plain single-device
path — the round-4 "one machine" gate (VERDICT r3 #1: a shard_map(1x1)
TPU run within 10 % of the single-device bench).

Usage: python tools/meshbench.py [--im 256] [--jm 256] [--kb 31]
       [--steps 50] [--modes plain,shardmap]

--im 1024 --jm 512 --kb 41 measures the config-5 PER-CHIP tile (the
2048^2x41 run decomposed 2x4, configs/config5_2048.json) on one chip
under shard_map(1x1) — the reference's per-rank workload (pom.sh:1 +
pom.h_dist:22-28) with no analogue number in the repo before round 5.

Runs the seamount 3-D core (the bench.py configuration) twice on the
attached device: plain (global arrays, Pallas fast paths) and
shard_map(1x1) (explicit-path machinery: chunked halo-ring external loop
with the VMEM Pallas chunk kernel, mesh-composed Pallas phase kernels,
whole-segment scan inside the shard_map body).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_extpom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(im, jm, kb, n, mesh_mode, trivial="local"):
    from extpom_tpu.cases.seamount import seamount_model
    from extpom_tpu.mesh.sharding import make_mesh

    # trivial_shardmap="local" keeps the explicit local-ctx machinery at
    # the 1x1 mesh — this tool's purpose is to price the mesh-variant
    # overhead on one chip; the production default ("auto") dispatches
    # the global machine at 1x1 and measures ~1.0 by construction
    m = seamount_model(im=im, jm=jm, kb=kb, donate=False,
                       trivial_shardmap=trivial)
    if mesh_mode:
        m.shard(make_mesh(1, 1), mode=mesh_mode)
    m.run_segment(n)
    jax.block_until_ready(m.state.el)
    m.run_segment(n)
    jax.block_until_ready(m.state.el)
    t0 = time.perf_counter()
    m.run_segment(n)
    jax.block_until_ready(m.state.el)
    dt = time.perf_counter() - t0
    return im * jm * kb * n / dt, dt / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--im", type=int, default=256)
    ap.add_argument("--jm", type=int, default=0)
    ap.add_argument("--kb", type=int, default=31)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--modes", default="plain,shardmap")
    ap.add_argument("--trivial", default="local", choices=("local", "auto"),
                    help="trivial_shardmap setting for the 1x1 mesh "
                         "(local = price the explicit machinery, the "
                         "tool's default; auto = production dispatch)")
    args = ap.parse_args()
    jm = args.jm or args.im

    from extpom_tpu.core.config import Config
    from extpom_tpu.core.dispatch import dispatch_report, format_report
    rows = {}
    for name in args.modes.split(","):
        mode = None if name == "plain" else name
        rep = dispatch_report(
            Config(im=args.im, jm=jm, kb=args.kb,
                   trivial_shardmap=args.trivial), mode=mode)
        print(f"{name} dispatch:\n{format_report(rep)}", flush=True)
        gps, spstep = measure(args.im, jm, args.kb, args.steps, mode,
                              trivial=args.trivial)
        rows[name] = dict(gps=gps, ms_per_step=spstep * 1e3)
        print(f"{name:9s}: {gps/1e6:8.1f} Mpt-steps/s "
              f"({spstep*1e3:.2f} ms/step)", flush=True)
    out = {"rows": rows}
    if "plain" in rows and "shardmap" in rows:
        ratio = rows["shardmap"]["gps"] / rows["plain"]["gps"]
        print(f"shardmap(1x1) / plain = {ratio:.3f}")
        out["ratio"] = round(ratio, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
