"""Mosaic survivor-list compaction: the lossless replacement for lax.top_k.

The culled engines' broad phase compacts a (T tiles, N objects) conservative
cone mask into per-tile top-K survivor index lists. accel.compact_mask does
it by packing keys ``arange(N,0,-1) * mask`` and calling ``lax.top_k`` —
measured as THE c5 bottleneck (~23 ms of a 66 ms frame for a (4096, 4096)
mask, scripts/trace_c5.py; VERDICT r4 next #3). top_k pays for a partial
sort nobody needs: the output order is simply ascending object id.

This kernel extracts survivors by ITERATED MAX with the whole mask block
resident in VMEM — no sort, no HBM round-trips, and per-block DYNAMIC trip
counts (the same r4 machinery as pallas_culled): a block of tiles runs only
max(min(count, k)) extraction steps, so the median shadow tile (count 0 at
c5, accel.py's measured p50) costs nothing.

One extraction step, entirely vectorized:
  key   = N - n for survivors, 0 otherwise      (built in-kernel from iota)
  m     = rowmax(key)          -> the SMALLEST surviving n is N - m
  emit  pos = N - m into output slot j (one-hot lane select), valid = m > 0
  clear key at pos and repeat.
Ascending-id output order and the count contract (count = true survivor
total, count > k == overflow, never silent) are IDENTICAL to compact_mask —
equality is tested slot-for-slot on (idx * valid, valid, count).

Cost: steps x O(T x N) lane-ops, all on VMEM-resident data — ~(avg count)
passes instead of a (T, N) sort. At c5 primary (counts <= 46, N = 4096)
that is ~46 x 16.7M lane-ops = 0.8G, ~1-2 ms of VPU vs 23 ms of top_k.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_TB = 8              # tiles per grid block (f32/i32 sublane height)
_UNROLL = 8          # extraction steps per dynamic-trip chunk
# Below this mask width the top_k is already cheap and the kernel's fixed
# costs dominate; accel.compact_mask stays on the XLA path.
MIN_N_FOR_KERNEL = 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compact_kernel(n: int, kpad: int, *refs):
    """One grid block: Tb tiles x N mask columns -> Tb x Kpad survivor ids.

    refs: cnt_ref (SMEM, (nblocks,) i32 per-block trip counts),
    mask_ref (Tb, N) i32, idx_ref / val_ref (Tb, Kpad) i32 outputs."""
    cnt_ref, mask_ref, idx_ref, val_ref = refs
    bi = pl.program_id(0)
    trips = cnt_ref[bi]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, mask_ref.shape, 1)
    key0 = jnp.where(mask_ref[...] != 0, n - iota_n, 0)     # (Tb, N)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (mask_ref.shape[0], kpad), 1)
    idx0 = jnp.zeros((mask_ref.shape[0], kpad), jnp.int32)
    val0 = jnp.zeros((mask_ref.shape[0], kpad), jnp.int32)

    def step(j, carry):
        key, idx, val = carry
        m = jnp.max(key, axis=1, keepdims=True)             # (Tb, 1)
        found = m > 0
        pos = n - m                                         # smallest id
        sel = (k_iota == j) & found
        idx = jnp.where(sel, pos, idx)
        val = jnp.where(sel, 1, val)
        key = jnp.where(iota_n == pos, 0, key)
        return key, idx, val

    def chunk(c, carry):
        for i in range(_UNROLL):
            carry = step(c * _UNROLL + i, carry)
        return carry

    nchunks = jax.lax.div(trips + (_UNROLL - 1), _UNROLL)
    _, idx, val = jax.lax.fori_loop(0, nchunks, chunk, (key0, idx0, val0))
    idx_ref[...] = idx
    val_ref[...] = val


def compact_mask_pallas(mask, k: int, interpret: bool | None = None):
    """Mosaic drop-in for accel.compact_mask: (T, N) bool mask -> (idx
    (T, K) int32 ascending among survivors, valid (T, K) bool, count (T,)
    int32 true totals; count > K means overflow — same never-silent
    contract). idx is unspecified (zero) where ~valid, exactly as top_k's
    tie-filler is unspecified; consumers gate on valid."""
    if interpret is None:
        interpret = _use_interpret()
    t, n_in = mask.shape
    k_eff = min(k, n_in)
    count = jnp.sum(mask, axis=-1, dtype=jnp.int32)

    # pad: N to a lane multiple (padding columns are non-survivors), T to a
    # block multiple (padding tiles have count 0), K to a lane multiple
    n = -(-n_in // LANE) * LANE
    tp = -(-t // _TB) * _TB
    kpad = -(-k_eff // LANE) * LANE
    m = jnp.pad(mask.astype(jnp.int32), ((0, tp - t), (0, n - n_in)))

    nblocks = tp // _TB
    trips = jnp.max(
        jnp.pad(jnp.minimum(count, k_eff), (0, tp - t)).reshape(nblocks, _TB),
        axis=1)

    blk = pl.BlockSpec((_TB, n), lambda b: (b, 0), memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((_TB, kpad), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
    idx, val = pl.pallas_call(
        functools.partial(_compact_kernel, n, kpad),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk],
        out_specs=[out_blk, out_blk],
        out_shape=[jax.ShapeDtypeStruct((tp, kpad), jnp.int32)] * 2,
        interpret=interpret,
    )(trips, m)
    return idx[:t, :k_eff], val[:t, :k_eff] > 0, count


def compact_impl() -> str:
    """'pallas' | 'topk' | 'auto' (default): OGLRT_COMPACT overrides for
    ablation; auto routes masks of width >= MIN_N_FOR_KERNEL to the kernel."""
    return os.environ.get("OGLRT_COMPACT", "auto")
