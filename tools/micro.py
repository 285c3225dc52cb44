"""Scratch microbench: decompose external-substep cost on the TPU."""
import os, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_extpom"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core import stepper
from extpom_tpu.ops import advection2d
from extpom_tpu.bc import bcond as bcf

m = seamount_model(im=256, jm=256, kb=31, mode=2, donate=False)
grid, cfg, st, fc = m.grid, m.cfg, m.state, m.forcing_at(1)

(adx2d, ady2d, drx2d, dry2d, aam2d, advua, advva, wubot, wvbot,
 egf, utf, vtf) = stepper.mode_interaction(grid, cfg, st, st.aam, None, None,
                                           None, None)
c0 = stepper.ExtCarry(el=st.el, elb=st.elb, ua=st.ua, uab=st.uab,
                      va=st.va, vab=st.vab, etf=st.etf, egf=egf,
                      utf=utf, vtf=vtf, advua=advua, advva=advva,
                      wubot=wubot, wvbot=wvbot)
aux = (adx2d, ady2d, drx2d, dry2d, aam2d)


def timeit(name, f, *args, n=50):
    r = f(*args); jax.block_until_ready(r)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e6:.1f} us", flush=True)


# 1. one full substep (XLA jit)
@jax.jit
def one_sub(c):
    return stepper.mode_external_substep(grid, cfg, c, jnp.int32(5), fc, aux)
timeit("substep(xla)", one_sub, c0)

# 2. advave alone
@jax.jit
def adv(c):
    d = grid.h + c.el
    return advection2d.advave(grid, cfg, d, c.ua, c.va, c.uab, c.vab, aam2d,
                              c.wubot, c.wvbot)
timeit("advave", adv, c0)

# 3. bc_el + bc_vel2d alone
@jax.jit
def bcs(c):
    elf = bcf.bc_el(grid, cfg, c.el, fc)
    d = grid.h + c.el
    uaf, vaf = bcf.bc_vel2d(grid, cfg, c.ua, c.va, c.el, d, fc, fc.ramp)
    return elf, uaf, vaf
timeit("bconds", bcs, c0)

# 4. 30 substeps under fori_loop (XLA)
@jax.jit
def loop30(c):
    return jax.lax.fori_loop(
        1, cfg.isplit + 1,
        lambda i, c: stepper.mode_external_substep(grid, cfg, c, i, fc, aux),
        c)
timeit("loop30(xla,rolled)", loop30, c0, n=10)

# 5. 30 substeps unrolled (XLA)
@jax.jit
def loop30u(c):
    for i in range(1, cfg.isplit + 1):
        c = stepper.mode_external_substep(grid, cfg, c, jnp.int32(i), fc, aux)
    return c
timeit("loop30(xla,unrolled)", loop30u, c0, n=10)

# 6. pallas kernel
from extpom_tpu.pallas import extloop
@jax.jit
def loop30p(c):
    return extloop.run_external_loop(grid, cfg, c, fc, aux)
timeit("loop30(pallas,rolled)", loop30p, c0, n=10)

cfgu = cfg.replace(ext_unroll=cfg.isplit)
@jax.jit
def loop30pu(c):
    return extloop.run_external_loop(grid, cfgu, c, fc, aux)
timeit("loop30(pallas,unrolled)", loop30pu, c0, n=10)
