"""Halo/compute overlap evidence from the scheduled TPU executable.

AOT-compiles the explicit shard_map step (mesh.shardmap) for a REAL TPU
topology (default v5e 2x4 — 8 chips — via jax.experimental.topologies, no
hardware needed) and analyzes the scheduled HLO: on TPU every
``lax.ppermute`` halo exchange lowers to an async
``collective-permute-start`` / ``collective-permute-done`` pair, and any
instruction scheduled BETWEEN the pair executes while the ICI transfer is
in flight.

For every pair this reports how many instructions (and how many fusion
kernels) the latency-hiding scheduler placed inside the window — the
quantitative form of the interior-first/rim-last overlap the reference
cannot express with its blocking MPI sends (parallel_mpi.f:170-236).

Usage: python tools/halo_overlap.py [--size 256] [--kb 31] [--report out.md]
"""

import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compile_for_topology(im, jm, kb, px=2, py=4,
                         topology="v5e:2x4", chips=(2, 4, 1)):
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topology,
        chips_per_host_bounds=chips, num_slices=1)
    mesh = Mesh(np.array(topo.devices).reshape(px, py), ("x", "y"))

    from extpom_tpu.cases.seamount import seamount_model
    from extpom_tpu.mesh.shardmap import (make_shardmap_step, _spec_tree,
                                          _leaf_spec)

    # build the model on the HOST: only its SHAPES feed the AOT lower
    # below, and the true config-5 state (~20 GB at 2048^2x41) does not
    # fit the single attached chip this tool runs beside
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        m = seamount_model(im=im, jm=jm, kb=kb, donate=False)
    step_fn = make_shardmap_step(mesh, m.grid, m.cfg, m.base_forcing)

    def shaped(obj):
        if dataclasses.is_dataclass(obj):
            spec = _spec_tree(obj, m.cfg.im, m.cfg.jm, px, py)
            return type(obj)(**{
                f.name: jax.ShapeDtypeStruct(
                    getattr(obj, f.name).shape, getattr(obj, f.name).dtype,
                    sharding=NamedSharding(mesh, getattr(spec, f.name)))
                for f in dataclasses.fields(obj)})
        a = jnp.asarray(obj)
        return jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=NamedSharding(mesh, _leaf_spec(
                "", a, m.cfg.im, m.cfg.jm, px, py)))

    args = tuple(shaped(o) for o in (m.grid, m.state, m.base_forcing,
                                     m.rmean, m.tclim, m.sclim))
    return step_fn.lower(*args, first=False).compile()


_START = re.compile(r"%(collective-permute-start[\w.\-]*)\s*=")
_DONE = re.compile(r"=\s*\S+\s+collective-permute-done\("
                   r"%?(collective-permute-start[\w.\-]*)\)")
_COMPUTE = re.compile(r"=\s*\S+\s+(fusion|add|subtract|multiply|divide|"
                      r"convolution|dot|reduce|sqrt|rsqrt|exponential)")


_SHAPE = re.compile(r"(f32|f64|bf16|s32|u32)\[([\d,]*)\]")

_ITEM = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4}


def _line_bytes(ln):
    """Total bytes of the result shape(s) on an HLO line (first shape
    before the '=' covers the output; tuples contribute each member)."""
    lhs = ln.split(" = ", 1)
    target = lhs[1] if len(lhs) == 2 else ln
    total = 0
    for m in _SHAPE.finditer(target.split("(", 1)[0]):
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _ITEM[m.group(1)]
    return total


def analyze(txt):
    """Per scheduled computation, measure the start->done windows.

    Besides instruction counts, estimates TIME-WEIGHTED overlap: compute
    inside a window is costed at HBM bandwidth on its output bytes
    (elementwise/fusion kernels are bandwidth-bound), the transfer at ICI
    strip bytes — so 'hidden' = min(compute_time, transfer_time) per
    window (the portion of the transfer the schedule can actually cover).
    """
    windows = []
    for comp in txt.split("\n\n"):
        lines = comp.splitlines()
        open_at = {}
        n_compute_since = {}
        bytes_since = {}
        xfer_bytes = {}
        for idx, ln in enumerate(lines):
            mdone = _DONE.search(ln)
            if mdone:
                name = mdone.group(1)
                if name in open_at:
                    windows.append(
                        dict(span=idx - open_at.pop(name) - 1,
                             compute=n_compute_since.pop(name, 0),
                             compute_bytes=bytes_since.pop(name, 0),
                             xfer_bytes=xfer_bytes.pop(name, 0)))
                continue
            mstart = _START.search(ln)
            if mstart:
                name = mstart.group(1)
                open_at[name] = idx
                n_compute_since[name] = 0
                bytes_since[name] = 0
                # result is a tuple (send_buf, recv_buf, ...); the first
                # shape is the transferred strip
                msh = _SHAPE.search(ln)
                if msh:
                    n = 1
                    for d in msh.group(2).split(","):
                        if d:
                            n *= int(d)
                    xfer_bytes[name] = n * _ITEM[msh.group(1)]
                else:
                    xfer_bytes[name] = 0
                continue
            if _COMPUTE.search(ln):
                b = _line_bytes(ln)
                for k in n_compute_since:
                    n_compute_since[k] += 1
                    bytes_since[k] += b
    return windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kb", type=int, default=31)
    ap.add_argument("--report", default=None)
    ap.add_argument("--dump-hlo", default=None)
    args = ap.parse_args()

    compiled = compile_for_topology(args.size, args.size, args.kb)
    txt = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(txt)

    n_start = len(re.findall(r"collective-permute-start", txt))
    windows = analyze(txt)
    spans = np.array([w["span"] for w in windows]) if windows else np.zeros(1)
    comp = np.array([w["compute"] for w in windows]) if windows else np.zeros(1)
    overlapped = float((comp >= 1).mean()) * 100

    # time-weighted overlap estimate: compute at HBM bandwidth (819 GB/s,
    # elementwise kernels are bandwidth-bound) vs strip transfer at an
    # effective ICI rate (90 GB/s per direction, conservative for v5e);
    # the hidden share of each transfer is min(compute, transfer) time
    HBM, ICI = 819e9, 90e9
    t_xfer = np.array([w["xfer_bytes"] / ICI for w in windows]) \
        if windows else np.zeros(1)
    t_comp = np.array([w["compute_bytes"] / HBM for w in windows]) \
        if windows else np.zeros(1)
    hidden = np.minimum(t_comp, t_xfer)
    tw = 100.0 * hidden.sum() / max(t_xfer.sum(), 1e-30)

    lines = [
        f"- topology: v5e 2x4 (8 chips, AOT), grid "
        f"{args.size}x{args.size}x{args.kb} f32, shard_map explicit-halo "
        "step",
        f"- async collective-permute pairs analyzed: {len(windows)}",
        f"- pairs with >= 1 compute op inside the start->done window: "
        f"{overlapped:.0f}%",
        f"- instructions inside the window: mean {spans.mean():.1f}, "
        f"median {np.median(spans):.0f}, max {int(spans.max())}",
        f"- compute ops inside the window: mean {comp.mean():.1f}, "
        f"median {np.median(comp):.0f}, max {int(comp.max())}",
        f"- TIME-WEIGHTED overlap estimate (cost model: compute bytes at "
        f"{HBM/1e9:.0f} GB/s HBM vs strip bytes at {ICI/1e9:.0f} GB/s "
        f"ICI): {tw:.0f}% of total transfer time coverable by in-window "
        "compute",
        f"- total per-step estimate: transfers {1e6*t_xfer.sum():.1f} us, "
        f"in-window compute {1e6*t_comp.sum():.1f} us, hidden "
        f"{1e6*hidden.sum():.1f} us",
    ]
    out = "\n".join(lines)
    print(out)
    if args.report:
        with open(args.report, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
