"""All-Pallas breadth-first (level-synchronous) BVH traversal.

The round-4 campaign established three facts (PERFORMANCE.md):

  1. The packet kernel sits on a serialization plateau: each superstep is a
     DEPENDENT chain (~5.6-8k cycles) and every structural variant measured
     dead. It pays packet-UNION work: ~86k node expansions + ~85k MT block
     matmuls per incoherent 262k wave.
  2. Breadth-first traversal of the same tree on the same waves needs only
     ~7-8k 128-lane expansions + ~7k block matmuls (perf/sim_raystream.py,
     fill >= 0.9) — every expansion serves only rays that want that node.
  3. The XLA-glue formulation of (2) is dead on this backend: wave-scale
     argsort/scatter/gather cost 10-100 ms/op and the composed program
     faults the TPU runtime (ops/raystream.py is kept as the CPU-only
     executable spec).

This module is the identified fix: the SAME level-synchronous traversal
with ZERO wave-scale XLA ops — every irregular step is a Pallas kernel.
The enabling observation is that a BVH is a TREE, so *no sorting is ever
needed*: pairs grouped by parent node, emitted slot-major, are grouped by
child BY CONSTRUCTION (each child has exactly one (parent, slot)).

Pipeline per level L (each phase one `pallas_call`, all chained inside the
caller's jit — buffers flow between phases as plain arrays):

  EXPAND  per unit (= one node x one 128-lane tile of its pairs): load the
          node row, slab-test 16 children x 128 lanes, store the per-lane
          16-bit hit mask and accumulate per-(node, slot) counts.
  PREFIX  one sequential scalar walk over the level's children: assign each
          child a 128-ALIGNED region in the next level's pair list (so
          every next-level tile is PURE — exactly one node per unit, which
          is what makes expansion fill match the simulation), build the
          next level's unit table and the MT unit table (leaf children),
          and dead-mark each region's tail lanes.
  EMIT    per unit x active slot: lane ranks via one lower-triangular MXU
          matmul, a shifted one-hot (128,128) selection matrix, and one
          exact (HIGHEST) payload matmul compacts the slot's survivors
          into the child's region (masked stores; a region row crossing a
          tile boundary uses two shifted one-hots).
  MT      per unit (= one leaf block x one tile of its rays): the classic
          MXU Moller-Trumbore block matmul (same math as the packet
          kernel), writing per-pair (t, slot-id, u, v).
  BWD     after the deepest level, walk levels bottom-up re-deriving the
          same one-hot matrices from the stored masks and route results UP
          through their transposes — an exact per-ray min reduction with
          no scatter. Level-0 pairs ARE the rays in order, so the final
          results land ray-major for free.

Waves are processed in segments (SEG rays) so the pair buffers fit VMEM
next to the resident BVH. Per-pair payload is one (8, 128) f32 tile row
set [ox,oy,oz,dx,dy,dz,tmin,tmax]; dead/padding lanes carry tmax < tmin.
Correctness contract matches ops/raystream.py: closest hits exact vs the
packet kernel on t; ties broken by smallest slot id.

Reference: this replaces Metal's hardware `intersector`
(kernel.metal:244-251, renderer_pt.cpp:223-294) like ops/pallas_trace.py,
with a breadth-first schedule instead of per-packet stacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from platinum_tpu.ops.intersect import INF, HitRecord
from platinum_tpu.ops.pallas_trace import _ray_sort_key

LANES = 128
DET_EPS = 1e-12
# static per-level pair-tile capacities as multiples of segment tiles
# (sim_raystream: level pair counts peak ~1.6R then decay; padded regions
# round each child up to 128 lanes)
PAIR_CAP_MULT = (1.0, 2.5, 2.5, 2.0, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5)
MT_CAP_MULT = 2.0
# extra tiles absorbing per-child round-up (<= 1 tile per active child)
CAP_SLACK_TILES = 192
SEG_RAYS = 65536          # rays per segment (VMEM budget)
B_EXPAND = 4              # units batched per expand loop iteration
B_MT = 4                  # units batched per MT loop iteration


def _tree_depth(meta: np.ndarray) -> int:
    depth = 0
    frontier = [0]
    seen = 0
    while frontier:
        nxt = []
        for n in frontier:
            for c in range(16):
                m = int(meta[n * 16 + c])
                if m >= 0:
                    nxt.append(m)
        seen += len(frontier)
        if nxt:
            depth += 1
        frontier = nxt
        if seen > len(meta):
            raise ValueError("cycle in wide-BVH meta table")
    return depth


def _all_leaves_single_block(meta: np.ndarray) -> bool:
    leaf = meta <= -2
    vals = -meta[leaf] - 2
    return bool(np.all((vals & 31) == 1))
