"""Benchmark: seamount 3-D core throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is grid-points/s/chip on the full mode-split 3-D step
(BASELINE.json primary metric).  The reference publishes no numbers
("published": {}), so vs_baseline is the ratio to the PREVIOUS round's
recorded result (BENCH_r04: 9.354e8 grid-point-steps/s) — the only perf
comparison this project has; >1.0 means this round got faster.
"""

import json
import os
import time

import jax

# persistent compile cache: cold compiles through the TPU tunnel are slow
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_extpom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _run(tridiag: str) -> float:
    from extpom_tpu.cases.seamount import seamount_model

    im = jm = 256
    kb = 31
    # donate=False: whole-pytree donation hangs the compile on the axon
    # plugin (see cases/seamount.py note)
    m = seamount_model(im=im, jm=jm, kb=kb, donate=False,
                       pallas_tridiag=tridiag)

    # scanned segments amortize per-step dispatch (the production path);
    # keep one segment size so only two variants compile (first / steady).
    # n=200 ~ a half-day print interval at dti=180 s — the axon tunnel
    # costs ~20 ms of RPC per dispatch, so short segments understate the
    # chip (r4: 790 Mpt-steps/s at n=50 vs 929 at n=200, device-side
    # in-trace time 2.054 ms/step either way)
    n = 200
    m.run_segment(n)              # compiles the first-step variant
    jax.block_until_ready(m.state.el)
    m.run_segment(n)              # compiles + warms the steady variant
    jax.block_until_ready(m.state.el)

    t0 = time.perf_counter()
    m.run_segment(n)
    jax.block_until_ready(m.state.el)
    dt = time.perf_counter() - t0
    return im * jm * kb * n / dt


def main():
    # the axon TPU tunnel is flaky (opaque INVALID_ARGUMENT / hangs);
    # retry once, falling back to the scan-based vertical solves if the
    # Pallas tridiag variant is what fails to compile
    gps = None
    for attempt, tridiag in ((0, "auto"), (1, "auto"), (2, "off")):
        try:
            gps = _run(tridiag)
            break
        except Exception as e:                      # noqa: BLE001
            print(f"# bench attempt {attempt} (tridiag={tridiag}) failed: "
                  f"{type(e).__name__}", flush=True)
    if gps is None:
        raise SystemExit(1)
    prev_round = 9.354e8           # BENCH_r04 on the same chip/config
    print(json.dumps({
        "metric": "seamount3d_grid_points_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "grid-point-steps/s",
        "vs_baseline": round(gps / prev_round, 3),
    }))


if __name__ == "__main__":
    main()
