"""Benchmark: seamount 3-D core throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is grid-points/s/chip on the full mode-split 3-D step
(BASELINE.json primary metric).  The reference publishes no numbers
("published": {}), so vs_baseline is reported against the north-star
proxy of 1.0 (parity with itself); improvements show up round-over-round
in BENCH_r{N}.json.
"""

import json
import os
import time

import jax

# persistent compile cache: cold compiles through the TPU tunnel are slow
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_extpom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from extpom_tpu.cases.seamount import seamount_model

    im = jm = 256
    kb = 31
    # donate=False: whole-pytree donation fails to compile on the axon
    # plugin (see core/model.py fallback) and would double compile time
    m = seamount_model(im=im, jm=jm, kb=kb, donate=False)

    # scanned segments amortize per-step dispatch (the production path);
    # keep one segment size so only two variants compile (first / steady)
    n = 50
    m.run_segment(n)              # compiles the first-step variant
    jax.block_until_ready(m.state.el)
    m.run_segment(n)              # compiles + warms the steady variant
    jax.block_until_ready(m.state.el)

    t0 = time.perf_counter()
    m.run_segment(n)
    jax.block_until_ready(m.state.el)
    dt = time.perf_counter() - t0

    gps = im * jm * kb * n / dt
    print(json.dumps({
        "metric": "seamount3d_grid_points_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "grid-point-steps/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
