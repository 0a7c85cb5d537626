"""Probe: stem maxpool-backward alternatives (measured-marginal; PERF.md r4).

The train-step profile (scripts/profile_forward.py --mode train) shows 6.6%
of device time in XLA's select-and-scatter — the maxpool backward on the
stem's f32[96,128,171,64] activation. Alternatives measured here on that
shape: s&s in bf16 (7.0 vs 10.9 ms) and an equality-mask custom-vjp
(dilate-max + compare, 10.3 ms — no better). Conclusion: the only lever is
grad dtype (~2-3% of the step) and it perturbs grads at bf16 rounding level
against the pinned training-parity envelopes; not taken.

Run on the real chip: python scripts/bench_maxpool_bwd.py
"""

import os, time
os.environ.setdefault("JAX_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])

N, H, W, C = 96, 128, 171, 64  # stem post-conv1 shape (batch 32 tuples)

def maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "SAME")

@jax.custom_vjp
def maxpool_mask(x):
    return maxpool(x)

def mm_fwd(x):
    y = maxpool(x)
    return y, (x, y)

def mm_bwd(res, g):
    x, y = res
    # route grad to ALL tied max positions (equality mask); ties matter only
    # where relu upstream kills them anyway
    # dilate g and y back to input positions per window: use
    # select_and_scatter-free formulation via gradient of sum(y * stopg)?
    # direct: for 3x3/2 SAME, each input position belongs to <=4 windows.
    # general approach: conv-transpose-like scatter of g at window positions
    # where x == y_window.
    # implement via reduce_window on shifted grids is messy; use the
    # standard trick: d/dx sum(where(x==dilated_max, dilated_g, 0))
    ymax = _dilate(y, x.shape)
    gd = _dilate(g, x.shape)
    return (jnp.where(x == ymax, gd, 0).astype(x.dtype),)

def _dilate(y, xshape):
    # max over the windows covering each input position == reduce_window on y
    # with transposed geometry: for stride 2 kernel 3 SAME, input pos (i,j)
    # is covered by windows (ceil((i-2)/2)..floor(i/2)) etc.
    # cheap approximation: upsample y by 2 then max over 2x2+1 neighborhood —
    # for the probe just measure the COST shape: one gather-free elementwise
    # over x plus a 2x upsample; cost model only.
    up = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)[:, :xshape[1], :xshape[2], :]
    return up

maxpool_mask.defvjp(mm_fwd, mm_bwd)

def bench(f, x, iters=10):
    g = jax.jit(jax.grad(lambda z: jnp.sum(f(z).astype(jnp.float32))))
    o = g(x); jax.block_until_ready(o)
    # chained to defeat async-timing issues
    @jax.jit
    def chain(z, c):
        o = g(z + c.astype(z.dtype) * 0)
        return jnp.sum(o.astype(jnp.float32))
    c = jnp.zeros(())
    for _ in range(3): c = chain(x, c)
    float(c)
    t0 = time.perf_counter(); c = jnp.zeros(())
    for _ in range(iters): c = chain(x, c)
    float(c)
    return (time.perf_counter() - t0) / iters * 1e3

x = jax.random.normal(jax.random.PRNGKey(0), (N, H, W, C), jnp.bfloat16)
xf = x.astype(jnp.float32)
print("s&s bwd f32 : %.2f ms" % bench(maxpool, xf))
print("s&s bwd bf16: %.2f ms" % bench(maxpool, x))
print("mask bwd bf16 (cost model): %.2f ms" % bench(maxpool_mask, x))
