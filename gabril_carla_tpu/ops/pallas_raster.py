"""Pallas TPU kernels for the camera rasterizer.

Three generations measured on v5e (128-world batch, 180x320):
  * XLA compositing materializes [n_actors, H, W] depth/mask tensors and a
    [n_pixels, route_view] distance matrix -> ~40 ms per 64 frames.
  * Fused kernel v1: whole frame per pixel block in VMEM registers — camera
    rays, ground hits, a streaming route-distance loop, terrain shading, a
    streaming actor depth-composite. One HBM write per frame; ~70 us/frame.
  * This version (~2x v1): pixels are laid out bottom-row-first so every
    ground pixel lands in the first 2 of 4 tiles and the 128-iteration
    route loop is skipped entirely for sky tiles; the route loop body drops
    from 13 to 10 vector ops by hoisting per-point scalars
    (c1,c2,c3,dx,dy,e3) host-side and deferring the lateral-distance solve
    to after the argmin; the actor list is compacted to the K_BOX nearest
    visible boxes before the kernel (raster._compact_boxes), bounding the
    composite loop.

Numerical note: the hoisted quadratic uses camera-relative coordinates —
comparing t = |g|^2 - 2 g.q + |q|^2 across route points cancels to ~meter^2
differences, so world-absolute coords (~1e3) would lose the argmin in f32.

Layout: pixels flattened BOTTOM row first and padded to [512, 128] lane
tiles; per-world scalars (camera basis, route window columns, actor screen
boxes) ride along as SMEM columns. vmap over worlds batches the grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 180, 320
FOV_DEG = 60.0
FX = (W / 2) / math.tan(math.radians(FOV_DEG) / 2)
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0
CAM_Z = 1.6
MAX_DEPTH = 120.0
SKY, GRASS, ROAD, MARK = 0.62, 0.42, 0.24, 0.85

BLOCK_ROWS = 128
LANES = 128
N_PIX = H * W  # 57600
ROWS_PAD = 512  # 512 * 128 = 65536 >= N_PIX
GRID = ROWS_PAD // BLOCK_ROWS
# ground rows are v in [91, 179] (89 rows); bottom-first they occupy
# flat < 89*320 = 28480 < 2 tiles of 16384 px
GROUND_TILES = -(-(H - 1 - 90) * W // (BLOCK_ROWS * LANES))

LANE_WIDTH = 3.5


def _render_kernel(cam_ref, route_ref, boxes_ref, img_ref, *, view: int,
                   n_actors: int, view_route: int):
    """One [BLOCK_ROWS, LANES] tile of the frame.

    cam_ref:   [16, 1]  camera basis + weather scalars (camera-relative frame)
    route_ref: [view, 8] columns: c1 c2 c3 dx dy e3 lo hi (hoisted quadratic
               + per-point road corridor); entries past view_route are
               scenario-flow points — crossing-road surfaces, no markings
    boxes_ref: [n_actors, 8] columns: u0 u1 v0 v1 depth color valid pad
    """
    i = pl.program_id(0)
    base = i * BLOCK_ROWS * LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1).astype(jnp.float32)
    flat = base + row * LANES + lane
    r = jnp.floor(flat / W)  # 0 = bottom image row
    u = flat - r * W
    v = (H - 1) - r
    in_frame = flat < N_PIX

    fwd_x = cam_ref[0, 0]
    fwd_y = cam_ref[1, 0]
    rgt_x = cam_ref[2, 0]
    rgt_y = cam_ref[3, 0]
    cloud = cam_ref[4, 0]
    start_s = cam_ref[5, 0]
    precip = cam_ref[6, 0]
    fog = cam_ref[7, 0]
    bright = cam_ref[8, 0]
    wet = cam_ref[9, 0]

    dv = jnp.maximum(v - CY, 1e-3)
    z = jnp.clip(CAM_Z * FX / dv, 0.0, MAX_DEPTH)
    on_ground = ((v - CY) > 0.5) & (z < MAX_DEPTH)
    x = (u - CX) / FX * z
    # camera-relative ground hit (see numerical note above)
    gx = z * fwd_x + x * rgt_x
    gy = z * fwd_y + x * rgt_y

    # ---- streaming terrain distance field (ground tiles only). The carry
    # tracks only what cannot be recovered post-loop: the road-corridor
    # bounds (columns 6/7) are constants split by is_route, so they are NOT
    # carried — two fewer selects in the hot loop.
    def rbody(k, carry):
        best_t, bdx, bdy, be3, bs = carry
        t = gx * route_ref[k, 0] + gy * route_ref[k, 1] + route_ref[k, 2]
        upd = t < best_t
        return (
            jnp.where(upd, t, best_t),
            jnp.where(upd, route_ref[k, 3], bdx),
            jnp.where(upd, route_ref[k, 4], bdy),
            jnp.where(upd, route_ref[k, 5], be3),
            jnp.where(upd, jnp.float32(k), bs),
        )

    zero = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
    init = (jnp.full((BLOCK_ROWS, LANES), 1e30, jnp.float32),
            zero, zero, zero, zero)
    has_flow = cam_ref[10, 0]

    def ground_loop(_):
        out = jax.lax.fori_loop(0, view_route, rbody, init, unroll=True)
        if view > view_route:
            # scenario-flow tail (crossing-road points): worlds without an
            # enabled crossing flow skip these iterations entirely — their
            # entries are 1e12-biased and can never win the argmin
            out = jax.lax.cond(
                has_flow > 0.5,
                lambda c: jax.lax.fori_loop(view_route, view, rbody, c, unroll=True),
                lambda c: c, out)
        return out[1:]

    def sky_loop(_):
        return zero, zero, zero, zero

    # sky-only tiles skip the route loop entirely (bottom-first layout packs
    # every ground pixel into the first GROUND_TILES tiles)
    bdx, bdy, be3, s_off = jax.lax.cond(i < GROUND_TILES, ground_loop, sky_loop, 0)
    # lateral solve deferred out of the loop: positive = driver's left
    signed = bdy * gx - bdx * gy + be3
    near_s = start_s + s_off
    # entries past view_route are scenario-flow points: road, but no markings
    is_route = s_off < jnp.float32(view_route)

    # ---- terrain shading (raster.py contract, incl. weather)
    lw = LANE_WIDTH
    # corridor bounds recovered from is_route (raster._pallas_inputs cols 6/7:
    # ego route keeps the own+opposite-lane corridor, flow entries one lane)
    hi = jnp.where(is_route, 1.5 * lw + 0.3, 0.5 * lw + 0.3)
    on_road = (signed > (-0.5 * lw - 0.3)) & (signed < hi)
    dash = jnp.mod(near_s, 4.0) < 2.0
    center_line = (jnp.abs(signed - 0.5 * lw) < 0.12) & dash & is_route
    edge = ((jnp.abs(signed + 0.5 * lw) < 0.15)
            | (jnp.abs(signed - 1.5 * lw) < 0.15)) & is_route
    road_col = ROAD * (1.0 - 0.30 * wet)
    terrain = jnp.where(on_road, road_col, GRASS)
    terrain = jnp.where(center_line | edge, MARK, terrain)
    vis = MAX_DEPTH * (1.0 - 0.85 * fog)
    fade_coef = 0.25 + 0.75 * fog
    fade = jnp.clip(z / vis, 0.0, 1.0) * fade_coef
    sky_col = SKY - 0.15 * cloud
    terrain = terrain * (1.0 - fade) + sky_col * fade

    sky = sky_col + 0.12 * (v / H)
    img = jnp.where(on_ground, terrain, sky)

    # ---- streaming actor composite (painter by min depth)
    def abody(a, carry):
        best_d, best_c = carry
        u0 = boxes_ref[a, 0]
        u1 = boxes_ref[a, 1]
        v0 = boxes_ref[a, 2]
        v1 = boxes_ref[a, 3]
        d = boxes_ref[a, 4]
        c = boxes_ref[a, 5]
        ok = boxes_ref[a, 6]
        inside = (u >= u0) & (u <= u1) & (v >= v0) & (v <= v1) & (ok > 0.5) & (d < best_d)
        return jnp.where(inside, d, best_d), jnp.where(inside, c, best_c)

    binit = (jnp.full((BLOCK_ROWS, LANES), 1e30, jnp.float32), zero)
    best_d, best_c = jax.lax.fori_loop(0, n_actors, abody, binit, unroll=True)
    hit = best_d < 1e29
    shade = 1.0 - jnp.clip(best_d / MAX_DEPTH, 0.0, 0.6)
    afog = jnp.clip(best_d / vis, 0.0, 1.0) * (0.8 * fog)
    img = jnp.where(hit, best_c * shade * (1.0 - afog) + sky_col * afog, img)
    img = img * (1.0 - 0.2 * precip) + 0.5 * (0.2 * precip)
    img = img * bright

    img_ref[:] = jnp.where(in_frame, jnp.clip(img, 0.0, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("view", "n_actors", "view_route", "interpret"))
def render_frame_pallas(cam_scalars, route_cols, actor_boxes, view: int, n_actors: int,
                        view_route: int = 128, interpret: bool = False):
    """cam_scalars [16], route_cols [view, 8], actor_boxes [n_actors, 8]
    -> grayscale frame [H, W] in [0, 1].

    Inputs are built by raster._pallas_inputs (camera-relative hoisted route
    + flow columns, compacted box list); view_route = number of leading
    ego-route entries (the rest are scenario-flow road points).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU CI
    parity tests vs the XLA oracle in raster.py)."""
    kernel = functools.partial(_render_kernel, view=view, n_actors=n_actors,
                               view_route=view_route)
    img = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(GRID,),
        in_specs=[
            # scalars in SMEM: the route/actor loops issue one scalar load per
            # iteration — VMEM scalar reads stall the VPU
            pl.BlockSpec((16, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((view, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_actors, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS_PAD, LANES), jnp.float32),
    )(
        cam_scalars.reshape(16, 1).astype(jnp.float32),
        route_cols.astype(jnp.float32),
        actor_boxes.astype(jnp.float32),
    )
    # rows were rendered bottom-first; restore top-first image order
    return img.reshape(-1)[:N_PIX].reshape(H, W)[::-1]
