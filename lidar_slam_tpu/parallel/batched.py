"""Batched multi-sequence SLAM (config ladder #4: K sequences on one program).

The whole pipeline is pure over a SlamState pytree, so running K KITTI
sequences concurrently is a ``vmap`` of the per-scan step over a leading
batch axis — the reference, being a single ROS node, has no analog. With a
mesh, the batch axis is sharded over 'seq' (data parallelism) via
NamedSharding so XLA places each sequence's state on its own chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..models import pipeline as pipe


def stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_batched_fns(config: SlamConfig, mesh: Optional[Mesh] = None,
                     seq_axis: str = "seq"):
    """vmapped (init, step, loop, optimize, finalize) over a leading batch axis.

    With ``mesh``, inputs/outputs are constrained to batch-axis sharding over
    ``seq_axis``.
    """
    init = jax.vmap(pipe.make_init_fn(config))
    step = jax.vmap(pipe.make_step_fn(config))
    # host-triggered optimize: under vmap the in-graph lax.cond lowers to a
    # select that would run the optimizer on every detection pass
    loop = jax.vmap(pipe.make_loop_fn(config, in_graph_optimize=False))
    optimize = jax.vmap(pipe.make_optimize_fn(config))
    finalize = jax.vmap(pipe.make_finalize_fn(config))

    if mesh is not None:
        sharding = NamedSharding(mesh, P(seq_axis))

        def shard(f):
            def wrapped(*args):
                args = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, sharding), args
                )
                return f(*args)

            return jax.jit(wrapped)

        init, step, loop, optimize, finalize = map(
            shard, (init, step, loop, optimize, finalize)
        )
    return init, step, loop, optimize, finalize


class BatchedSlamEngine:
    """Run K sequences in lockstep as one batched XLA program."""

    def __init__(self, config: SlamConfig, batch: int, mesh: Optional[Mesh] = None):
        self.config = config
        self.batch = batch
        self.mesh = mesh
        (self._init, self._step, self._loop, self._optimize, self._finalize) = (
            make_batched_fns(config, mesh)
        )
        self.state = stack_states([pipe.init_state(config) for _ in range(batch)])
        self._frame = 0

    def pad_scans(self, scans):
        cap = self.config.max_raw_points
        pts = np.zeros((self.batch, cap, 3), np.float32)
        counts = np.zeros((self.batch,), np.int32)
        for b, s in enumerate(scans):
            n = min(len(s), cap)
            pts[b, :n] = s[:n]
            counts[b] = n
        return jnp.asarray(pts), jnp.asarray(counts)

    def push_scans(self, scans) -> Optional[int]:
        """One scan per sequence. Returns total loops found when a detection
        pass ran."""
        raw, counts = self.pad_scans(scans)
        found = None
        if self._frame == 0:
            self.state = self._init(self.state, raw, counts)
        else:
            frames = jnp.full((self.batch,), self._frame, jnp.int32)
            self.state = self._step(self.state, raw, counts, frames)
            cfg = self.config
            if (
                self._frame % cfg.loop_check_every == 0
                and self._frame > cfg.loop_start_frame
            ):
                self.state, det = self._loop(self.state)
                found = int(jnp.sum(det.accepted.astype(jnp.int32)))
                if found:
                    self.state, _ = self._optimize(self.state)
        self._frame += 1
        return found

    def finalize(self):
        self.state, res = self._finalize(self.state)
        return res

    def trajectories(self) -> np.ndarray:
        n = int(jnp.max(self.state.n_poses))
        return np.asarray(self.state.poses[:, :n])
