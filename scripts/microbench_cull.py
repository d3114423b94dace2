"""Microbenchmark the culled broad phase's building blocks on the chip:
which op actually binds c5 (top_k compaction vs cone tests vs narrow phase
vs winner einsum)? Guides the r4 shadow-broad-phase attack (VERDICT r3 #3).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timeit(fn, *args, k=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def main():
    T, N, P, KP, KS = 4096, 4096, 1024, 72, 128
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (T, N)) < 0.02          # ~82 survivors/tile

    from openglraytracer_tpu.ops.accel import compact_mask, sphere_vs_cone

    f_compact = jax.jit(lambda m: compact_mask(m, KS))
    print(f"compact_mask (T={T}, N={N}, K={KS}):  {timeit(f_compact, mask):8.3f} ms")

    f_topk = jax.jit(lambda m: jax.lax.top_k(
        jnp.where(m, jnp.arange(N, 0, -1, dtype=jnp.int32)[None, :], 0), KS))
    print(f"lax.top_k alone:                      {timeit(f_topk, mask):8.3f} ms")

    f_sum = jax.jit(lambda m: jnp.sum(m, axis=-1, dtype=jnp.int32))
    print(f"mask row-sum alone:                   {timeit(f_sum, mask):8.3f} ms")

    # cumsum-based slot assignment (scatter-free part)
    f_cumsum = jax.jit(lambda m: jnp.cumsum(m, axis=-1, dtype=jnp.int32))
    print(f"cumsum over N:                        {timeit(f_cumsum, mask):8.3f} ms")

    # scatter-based compaction: idx[t, slot] = n
    def scatter_compact(m):
        slot = jnp.cumsum(m, -1, dtype=jnp.int32) - 1
        n_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (T, N))
        slot = jnp.where(m & (slot < KS), slot, KS)        # KS = drop bin
        out = jnp.zeros((T, KS + 1), jnp.int32)
        t_idx = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                                 (T, N))
        out = out.at[t_idx.reshape(-1), slot.reshape(-1)].max(
            n_idx.reshape(-1), mode="drop")
        return out[:, :KS]
    print(f"cumsum+scatter compaction:            {timeit(jax.jit(scatter_compact), mask):8.3f} ms")

    # cone test
    apex = jnp.zeros((3,))
    axis = jax.random.normal(key, (T, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos_half = jnp.full((T,), 0.99)
    centers = jax.random.normal(key, (N, 3)) * 50
    radii = jnp.abs(jax.random.normal(key, (N,))) + 0.5
    f_cone = jax.jit(lambda a, c: sphere_vs_cone(apex, a, cos_half, c, radii))
    print(f"sphere_vs_cone (T x N):               {timeit(f_cone, axis, centers):8.3f} ms")

    # narrow-phase shaped work: (T, K, P) elementwise chain
    rows = jax.random.normal(key, (T, KS, 4))
    dirs_t = jax.random.normal(key, (T, P, 3))

    def narrow(rows, dirs_t):
        cx = rows[..., 0][:, :, None]
        dx = dirs_t[..., 0][:, None, :]
        dy = dirs_t[..., 1][:, None, :]
        dz = dirs_t[..., 2][:, None, :]
        qb = dx * cx + dy * cx + dz * cx
        qd = qb * qb - cx
        t = jnp.where(qd >= 0, qb, 1e9)
        return jnp.min(t, axis=1)
    print(f"(T,Ks,P) elementwise chain + min:     {timeit(jax.jit(narrow), rows, dirs_t):8.3f} ms")

    # winner-fold einsum (T,Kp,P)x(T,Kp,6)
    sel = jax.random.uniform(key, (T, KP, P)) < 0.01
    rows6 = jax.random.normal(key, (T, KP, 6))

    def fold(sel, rows6):
        return jnp.einsum("tkp,tkf->tfp", sel.astype(jnp.float32), rows6,
                          precision=jax.lax.Precision.HIGHEST)
    print(f"winner einsum (T,Kp,P)x(T,Kp,6):      {timeit(jax.jit(fold), sel, rows6):8.3f} ms")


if __name__ == "__main__":
    main()
