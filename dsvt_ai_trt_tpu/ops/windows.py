"""Window partition + DSVT rotated-set partition, TPU-native.

The reference builds these with atomicAdd window registries plus per-window
iterative quicksorts on the GPU (plugins/src/windowPartition.cu:278-381 and
plugins/src/getSet.cu:293-609, including a cuda_sleep spin-wait race
workaround at windowPartition.cu:268-276).  Here the same partition is one
argsort over a composite (window, in-window) key per axis, a cumsum for set
allocation, and dense gathers for the DSVT Eq.(3) local-index spreading —
deterministic and entirely static-shaped.

Key algebraic facts used (verified against the CUDA semantics):
  * sort keys: sortY = cy*wx*wz + cx*wz + cz; sortX = cx*wy*wz + cy*wz + cz
    (getSet.cu:386-387, 461-462).  Keys are unique within a window, so the
    reference's unstable quicksort and our stable argsort agree exactly.
  * Eq.(3): local[j,k] = ((j*S+k) * N) // S // n_sets  with S=set_size
    (getSet.cu:346); two sequential floor-divides equal one by S*n_sets.
  * the duplicate mask depends only on local-index repeats, therefore the
    sortY and sortX masks are *identical* — which makes the reference's
    reuse of the axis-0 mask for axis-1 attention (dsvt-ai-trt.cpp:658,708,...)
    a provable no-op rather than an approximation.
  * scatter-back (MapSetFeature2VoxelPlugin, mapSetFeature2voxel.cu:258-275,
    nondeterministic last-writer-wins on duplicated slots) is replaced by a
    deterministic *gather* through each pillar's canonical slot
    m = ceil(rank * S*n_sets / N), the first slot Eq.(3) maps onto it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DSVTConfig, WindowSpec


class WindowPartition(NamedTuple):
    """Per-pillar window assignment for one window spec.

    win_id:      [P] linear window index (sentinel for invalid pillars).
    inwin_xyz:   [P, 3] integer coords inside the window (x, y, z order).
    xy_centered: [P, 2] float (x,y) in-window coords minus window/2
                 (windowPartition.cu:367-368) — pos-embed MLP input.
    """

    win_id: jax.Array
    inwin_xyz: jax.Array
    xy_centered: jax.Array


class SetPartition(NamedTuple):
    """Static [2, S, set_size] rotated-set decomposition for one window spec.

    inds:       [2, S, K] global pillar index per (axis, set, slot); dump row
                (== max_pillars) on invalid sets.
    key_mask:   [S, K] additive attention mask, -3.4e38 on duplicate-padded
                slots and on every slot of invalid sets (>= set_count), 0
                elsewhere (identical across axes, see module doc).
    set_count:  [] int32 number of valid sets.
    canon:      [2, P] flat canonical (set*K + slot) position of each pillar
                per axis, used to gather attention outputs back to pillars;
                S*K (dump) for invalid pillars.
    """

    inds: jax.Array
    key_mask: jax.Array
    set_count: jax.Array
    canon: jax.Array


def window_partition(coords: jax.Array, pillar_valid: jax.Array,
                     spec: WindowSpec, cfg: DSVTConfig) -> WindowPartition:
    """coords: [P, 2] (iy, ix).  Mirrors windowPartition.cu:278-381."""
    wx, wy, wz = spec.shape
    sx, sy, _sz = spec.shift
    nwx, nwy, _nwz = spec.num_windows(cfg.sparse_shape)

    shifted_x = coords[:, 1] + sx
    shifted_y = coords[:, 0] + sy
    wcx = shifted_x // wx
    wcy = shifted_y // wy
    win_id = jnp.where(pillar_valid, wcy * nwx + wcx, jnp.int32(nwx * nwy))

    cx = shifted_x % wx
    cy = shifted_y % wy
    cz = jnp.zeros_like(cx)
    inwin = jnp.stack([cx, cy, cz], axis=-1)
    xy_centered = jnp.stack([
        cx.astype(jnp.float32) - wx / 2.0,
        cy.astype(jnp.float32) - wy / 2.0,
    ], axis=-1)
    return WindowPartition(win_id=win_id, inwin_xyz=inwin, xy_centered=xy_centered)


def set_partition(part: WindowPartition, pillar_valid: jax.Array,
                  spec: WindowSpec, cfg: DSVTConfig) -> SetPartition:
    """Build the [2, S, K] set index tensors.  Mirrors getSet.cu:326-609."""
    P = part.win_id.shape[0]
    K = cfg.set_size
    S = cfg.max_sets
    wx, wy, wz = spec.shape
    cx = part.inwin_xyz[:, 0]
    cy = part.inwin_xyz[:, 1]
    cz = part.inwin_xyz[:, 2]

    # composite per-axis sort keys (unique per pillar within a window)
    key_y = cy * (wx * wz) + cx * wz + cz     # getSet.cu:386
    key_x = cx * (wy * wz) + cy * wz + cz     # getSet.cu:461
    inwin_cap = max(wx * wy * wz, wx * wz * wy) + 1
    big = jnp.int32(P * inwin_cap + inwin_cap)

    pos = jnp.arange(P, dtype=jnp.int32)

    def axis_order(axis_key):
        """Sorted composite keys AND the permutation from ONE lax.sort —
        argsort is this same sort with the sorted keys thrown away, and
        keeping them makes the sorted window ids a cheap division instead
        of a [P] gather by `order` (0.29 ms/frame, round-3 trace)."""
        composite = jnp.where(pillar_valid,
                              part.win_id * inwin_cap + axis_key, big)
        s_comp, order = jax.lax.sort_key_val(composite, pos, is_stable=True)
        return s_comp, order

    s_comp_y, order_y = axis_order(key_y)
    _, order_x = axis_order(key_x)

    # window segmentation over the sorted stream (same for both axes):
    # the sorted window id comes straight off the sorted composite key
    s_valid = s_comp_y < big
    s_win = jnp.where(s_valid, s_comp_y // inwin_cap, -1)
    prev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), s_win[:-1]])
    new_win = s_valid & (s_win != prev)
    win_rank = jnp.cumsum(new_win.astype(jnp.int32)) - 1          # [P]
    win_count = jnp.sum(new_win.astype(jnp.int32))

    W = min(P, spec.num_windows(cfg.sparse_shape)[0]
            * spec.num_windows(cfg.sparse_shape)[1])
    win_rank_safe = jnp.where(s_valid & (win_rank < W), win_rank, W)
    # (start, size) from segment EXTENTS, not a [W+1, 2] scatter-add: head
    # positions sort into window-rank order (heads ascend with position),
    # and a window's size is just the gap to the next head, clipped at the
    # valid-row count — the same sort-over-scatter + extent tricks as the
    # voxelizer's registry (TPU scatters are row-serial).  Ranks past
    # win_count get start = P (sort sentinel) and size 0; the one consumer
    # of out-of-count starts (src_pos for invalid sets) clamps and is
    # masked to the dump index anyway.
    # TWO trailing sentinels: the slices below reach starts_w[W + 1], and
    # W == P whenever the grid holds more windows than the pillar cap
    # (e.g. the flagship 468-row grid at a reduced-cap dryrun: 1600 windows
    # vs P = 1024) — one sentinel under-ran that case by a row
    starts_w = jnp.concatenate(
        [jnp.sort(jnp.where(new_win, pos, jnp.int32(P))),
         jnp.full((2,), P, jnp.int32)])                       # [P + 2]
    n_valid_rows = jnp.sum(s_valid.astype(jnp.int32))
    win_start = starts_w[:W + 1]
    nxt_start = starts_w[1:W + 2]
    win_size = jnp.maximum(
        jnp.minimum(nxt_start, n_valid_rows) - win_start, 0)

    # set allocation: ceil(N/K) sets per window, laid out window-major
    # (getLocalIndex_kernel, getSet.cu:335-349 — ours is deterministic where
    # the reference's atomicAdd ordering is not)
    sets_per_win = (win_size[:W] + (K - 1)) // K
    set_base = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(sets_per_win.astype(jnp.int32)),
    ])  # [W+1]; set_base[w] = first set of window-rank w
    set_count = jnp.minimum(set_base[jnp.minimum(win_count, W)], S)

    # window-rank of each set: scatter +1 at every window's base, cumsum
    set_ids = jnp.arange(S, dtype=jnp.int32)
    bump = jnp.zeros((S + 1,), jnp.int32).at[
        jnp.minimum(set_base[1:W + 1], S)].add(
        jnp.where(sets_per_win > 0, 1, 0), mode="drop")
    win_of_set = jnp.cumsum(bump[:S])                              # [S]
    set_valid = set_ids < set_count
    wos = jnp.minimum(win_of_set, W - 1)

    n_of_set = win_size[wos]                                        # N
    nsets_of_set = jnp.maximum(sets_per_win[wos], 1)
    j = set_ids - set_base[wos]                                     # set idx in window

    # Eq.(3) local index spreading (getSet.cu:346)
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    m = j[:, None] * K + k                                          # [S, K]
    local = (m * n_of_set[:, None]) // (K * nsets_of_set[:, None])
    local = jnp.minimum(local, jnp.maximum(n_of_set[:, None] - 1, 0))

    src_pos = win_start[wos][:, None] + local                       # [S, K]
    src_pos = jnp.where(set_valid[:, None], src_pos, P - 1)
    # both axes read the SAME positions (the window segmentation is axis-
    # independent), so one [P, 2] row gather replaces two 1-column gathers
    # (column gathers are latency-bound per op, ~0.2 ms each at [S, K])
    orders = jnp.stack([order_y, order_x], axis=1)                  # [P, 2]
    picked = orders[src_pos]                                        # [S, K, 2]
    inds = jnp.stack([
        jnp.where(set_valid[:, None], picked[..., 0], P),
        jnp.where(set_valid[:, None], picked[..., 1], P),
    ])                                                              # [2, S, K]

    # duplicate-slot mask: slot k>0 masked iff local[k]==local[k-1]
    # (useLocalIndexGetSortedGlobalIndex__kernel, getSet.cu:541-566).
    # Invalid sets (>= set_count) carry ALL-dead masks: the fused kernel's
    # occupancy gate (ops/attention_pallas.py) skips whole blocks of them
    # and writes zeros, which is exactly what the ungated dead-segment math
    # produces for an all-dead set — this line is what makes that contract
    # hold (a live mask there would let the clip-gathered rows compute
    # nonzero, unobserved-but-confusing values at invalid-set slots).
    dup = jnp.concatenate([
        jnp.zeros((local.shape[0], 1), bool),
        local[:, 1:] == local[:, :-1],
    ], axis=1)
    key_mask = jnp.where(dup | ~set_valid[:, None], jnp.float32(-3.4028235e38),
                         jnp.float32(0.0))

    # canonical inverse: pillar with in-window rank r maps to flat slot
    # m = ceil(r * K*n_sets / N); valid because Eq.(3) is nondecreasing in m.
    # per-window-rank lookup rows, so each canon_for pays ONE [P, 4] row
    # gather instead of four 1-column gathers.  Row W (invalid pillars) is
    # a dump row whose values are discarded by the final where; the
    # min(wr, W-1) clamps of the column formulation are unnecessary since
    # valid pillars always have wr < win_count <= W.
    win_tbl = jnp.stack([
        win_start[:W + 1],
        jnp.maximum(win_size[:W + 1], 1),
        K * jnp.maximum(jnp.pad(sets_per_win, (0, 1)), 1),
        jnp.pad(set_base[:W], (0, 1)),
    ], axis=1)                                                      # [W+1, 4]

    def canon_for(order):
        # inverse permutation via a payload-carrying sort, not a [P, 2] row
        # scatter: order is a permutation, so sorting (order, pos, wr)
        # lands each sorted position and window rank at its pillar's row —
        # TPU scatters are row-serial while the sort network is vectorized
        _, inv_rank, wr = jax.lax.sort((order, pos, win_rank_safe),
                                       num_keys=1)
        row = win_tbl[wr]                                           # [P, 4]
        r = inv_rank - row[:, 0]
        mflat = (r * row[:, 2] + row[:, 1] - 1) // row[:, 1]
        flat = row[:, 3] * K + mflat
        return jnp.where(pillar_valid & (flat < S * K), flat, S * K)

    canon = jnp.stack([canon_for(order_y), canon_for(order_x)])
    return SetPartition(inds=inds, key_mask=key_mask, set_count=set_count,
                        canon=canon)


@functools.partial(jax.jit, static_argnames=("spec", "cfg"))
def partition(coords: jax.Array, pillar_valid: jax.Array,
              spec: WindowSpec, cfg: DSVTConfig):
    wp = window_partition(coords, pillar_valid, spec, cfg)
    sp = set_partition(wp, pillar_valid, spec, cfg)
    return wp, sp
