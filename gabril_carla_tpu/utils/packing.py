"""Carry packing: collapse a many-leaf pytree into one array per dtype.

Why this exists: the fused eval loop carries SceneState — ~59 small leaves
after vmap — through lax.scan/while, and the round-4 profiler trace
(results_r4/trace_report.txt) attributed the step floor to XLA while-loop
copy-insertion over exactly those leaves (≈646 async copy-start DMA issues
per 256-world iteration). Packing the carry into one flattened array per
dtype cuts the carry to ≤4 leaves (+ the frame ring).

Measured outcome (docs/DESIGN.md §7b lever 1): **falsified as a lever** —
the on-chip A/B ran 22.6k packed vs 23.8k unpacked steps/s at 256 worlds
(reproduced twice) with ~3× the compile time. The interpretation that fits:
the insertion-copies were already fully overlapped with compute by the
async DMA engines, while the per-iteration pack concatenate serializes on
the critical path. Kept as an opt-in probe (GABRIL_PACK_CARRY=1) because
the trade-off is topology-dependent and the transform is provably free of
semantic risk.

pack/unpack is reshape+concatenate / slice+reshape only — no arithmetic —
so unpack(pack(x)) is bitwise identity and the transform cannot change
simulation semantics (regression-tested in tests/test_packing.py, including
bitwise equality of a packed vs unpacked rollout).

The packer is built from an UNBATCHED template (one world's state) and maps
each leaf to a 1-D segment; under vmap the packed arrays gain the leading
worlds axis and the concatenate/slice ops batch transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_carry_packer"]


def make_carry_packer(template):
    """Build (pack, unpack) for pytrees shaped like ``template``.

    pack(tree)  -> tuple of 1-D arrays, one per distinct leaf dtype
                   (deterministic dtype-name order).
    unpack(arrs) -> pytree with the template's structure/shapes/dtypes.

    Leaves may have any shape (including scalars); dtype groups are
    concatenated in leaf order. Both functions are jit/vmap-compatible.
    """
    leaves, treedef = jax.tree.flatten(template)
    if not leaves:
        empty = ()
        return (lambda tree: empty), (lambda packed: jax.tree.unflatten(treedef, []))

    offsets: dict[str, int] = {}
    meta = []  # per leaf: (dtype_name, start, size, shape, jnp_dtype)
    for leaf in leaves:
        dt = jnp.dtype(leaf.dtype)
        size = int(np.prod(np.asarray(leaf.shape, dtype=np.int64))) if leaf.ndim else 1
        start = offsets.get(dt.name, 0)
        offsets[dt.name] = start + size
        meta.append((dt.name, start, size, tuple(leaf.shape), dt))
    group_order = sorted(offsets)

    def pack(tree):
        ls, td = jax.tree.flatten(tree)
        if td != treedef:
            raise ValueError(
                f"pack: tree structure {td} does not match the packer template {treedef}"
            )
        groups: dict[str, list] = {g: [] for g in group_order}
        for leaf, (dt_name, _, _, shape, dt) in zip(ls, meta):
            if jnp.dtype(leaf.dtype) != dt:
                raise ValueError(
                    f"pack: leaf dtype {leaf.dtype} != template dtype {dt} (shape {shape})"
                )
            groups[dt_name].append(jnp.ravel(leaf))
        return tuple(
            g[0] if len(g) == 1 else jnp.concatenate(g)
            for g in (groups[name] for name in group_order)
        )

    def unpack(packed):
        by_group = dict(zip(group_order, packed))
        ls = []
        for dt_name, start, size, shape, _ in meta:
            seg = by_group[dt_name][start : start + size]  # static lax.slice
            ls.append(seg.reshape(shape))
        return jax.tree.unflatten(treedef, ls)

    return pack, unpack
