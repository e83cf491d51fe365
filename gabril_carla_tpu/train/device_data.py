"""Device-resident dataset + whole-epoch jitted training.

The reference streams batches host->GPU every step through a torch DataLoader
(SURVEY §3.1 'H2D copy per batch'). Through this machine's TPU tunnel that
costs ~0.5 s per 128-frame batch — 40x the compute. The TPU-native answer:
park the entire uint8 dataset in HBM once (55k grayscale frames = 3.2 GB of
16 GB), precompute the frame-stack window index map, and run a whole epoch as
one lax.scan whose body gathers batches on-device. One dispatch per epoch,
zero steady-state host traffic.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..data.dataset import EpisodeStore


class DeviceData:
    """Flat episode streams on device + window index maps."""

    def __init__(self, store: EpisodeStore, frame_stack: int, grayscale_store: bool = True):
        store.finalize()
        imgs = store.flat_images  # [T, H, W, C] uint8
        if grayscale_store and imgs.shape[-1] == 3:
            # store luma only: 3x less HBM; format_obs_stack skips conversion
            imgs = (0.299 * imgs[..., 0] + 0.587 * imgs[..., 1] + 0.114 * imgs[..., 2]).astype(np.uint8)[..., None]
        self.images = jax.device_put(imgs)
        self.gazes = jax.device_put(store.flat_gazes)
        self.actions = jax.device_put(store.flat_actions)

        # window map: sample i (demo d, step t) -> S global frame rows
        s = frame_stack
        wins, acts = [], []
        for off, ln in zip(store.offsets, store.lengths):
            t = np.arange(ln)
            w = np.clip(t[:, None] + np.arange(-(s - 1), 1)[None, :], 0, ln - 1) + off
            wins.append(w)
            acts.append(t + off)
        self.win_idx = jax.device_put(np.concatenate(wins).astype(np.int32))  # [N, S]
        self.act_idx = jax.device_put(np.concatenate(acts).astype(np.int32))  # [N]
        self.n_samples = int(self.win_idx.shape[0])

    def arrays(self) -> dict:
        return {"images": self.images, "gazes": self.gazes, "actions": self.actions,
                "win_idx": self.win_idx, "act_idx": self.act_idx}

    def gather(self, sample_idx: jnp.ndarray) -> dict:
        """[B] sample rows -> training batch (on device, inside jit)."""
        return gather_from(self.arrays(), sample_idx)


def gather_from(arrays: dict, sample_idx: jnp.ndarray) -> dict:
    win = arrays["win_idx"][sample_idx]  # [B, S]
    return {
        "obs_seq": arrays["images"][win],  # [B, S, H, W, C]
        "gaze_seq": arrays["gazes"][win],  # [B, S, P*2]
        "actions": arrays["actions"][arrays["act_idx"][sample_idx]],  # [B, A]
    }


class ShardedDeviceData:
    """Device-resident dataset sharded over the mesh 'data' axis.

    Whole episodes are assigned to shards (greedy balance on frame count) so
    every frame-stack window stays shard-local — batch gathers inside the
    epoch scan then touch only local HBM, no collectives. This extends the
    single-device fast path to the DDP mesh (reference
    train/common/distributed.py runs one DataLoader per rank; here each shard
    samples its own episodes, the pmean in the step is the allreduce).
    """

    def __init__(self, store: EpisodeStore, frame_stack: int, mesh,
                 grayscale_store: bool = True):
        from jax.sharding import NamedSharding, PartitionSpec as P

        store.finalize()
        imgs = store.flat_images  # [T, H, W, C] uint8
        if grayscale_store and imgs.shape[-1] == 3:
            imgs = (0.299 * imgs[..., 0] + 0.587 * imgs[..., 1]
                    + 0.114 * imgs[..., 2]).astype(np.uint8)[..., None]
        n_dev = mesh.shape["data"]
        self.n_dev = n_dev
        lengths = np.asarray(store.lengths)
        offsets = np.asarray(store.offsets)
        if len(lengths) < n_dev:
            raise ValueError(f"need >= {n_dev} episodes to shard over {n_dev} devices")

        # greedy longest-first episode assignment
        bins = [[] for _ in range(n_dev)]
        loads = np.zeros(n_dev, np.int64)
        for e in np.argsort(lengths)[::-1]:
            d = int(np.argmin(loads))
            bins[d].append(int(e))
            loads[d] += lengths[e]

        s = frame_stack
        t_max = int(loads.max())
        n_max = t_max  # samples per shard == frames per shard
        sh_imgs = np.zeros((n_dev, t_max) + imgs.shape[1:], imgs.dtype)
        sh_gaze = np.zeros((n_dev, t_max) + store.flat_gazes.shape[1:], store.flat_gazes.dtype)
        sh_act = np.zeros((n_dev, t_max) + store.flat_actions.shape[1:], store.flat_actions.dtype)
        sh_win = np.zeros((n_dev, n_max, s), np.int32)
        sh_aidx = np.zeros((n_dev, n_max), np.int32)
        self.n_local = np.zeros(n_dev, np.int32)
        for d, eps in enumerate(bins):
            cur = 0
            for e in eps:
                off, ln = offsets[e], int(lengths[e])
                sh_imgs[d, cur:cur + ln] = imgs[off:off + ln]
                sh_gaze[d, cur:cur + ln] = store.flat_gazes[off:off + ln]
                sh_act[d, cur:cur + ln] = store.flat_actions[off:off + ln]
                t = np.arange(ln)
                sh_win[d, cur:cur + ln] = np.clip(
                    t[:, None] + np.arange(-(s - 1), 1)[None, :], 0, ln - 1) + cur
                sh_aidx[d, cur:cur + ln] = t + cur
                cur += ln
            self.n_local[d] = cur

        shd = NamedSharding(mesh, P("data"))
        self.images = jax.device_put(sh_imgs, shd)
        self.gazes = jax.device_put(sh_gaze, shd)
        self.actions = jax.device_put(sh_act, shd)
        self.win_idx = jax.device_put(sh_win, shd)
        self.act_idx = jax.device_put(sh_aidx, shd)
        self.n_samples = int(self.n_local.sum())

    def arrays(self) -> dict:
        return {"images": self.images, "gazes": self.gazes, "actions": self.actions,
                "win_idx": self.win_idx, "act_idx": self.act_idx}

    def epoch_perm(self, rng: np.random.Generator, steps_per_epoch: int,
                   local_bs: int) -> np.ndarray:
        """[n_dev, steps*local_bs] local sample indices, one independent
        shuffle per shard (cycled when a shard is short)."""
        need = steps_per_epoch * local_bs
        rows = []
        for d in range(self.n_dev):
            p = rng.permutation(int(self.n_local[d]))
            reps = -(-need // max(1, len(p)))
            rows.append(np.tile(p, reps)[:need])
        return np.stack(rows).astype(np.int32)


def make_sharded_epoch_fn(data: ShardedDeviceData, step_fn, steps_per_epoch: int,
                          local_bs: int, mesh):
    """Whole-epoch jitted training over the mesh: shard_map so each device
    scans its own shard, gathering local batches; ``step_fn`` must carry the
    pmean (built with axis_name='data')."""
    from jax.sharding import PartitionSpec as P

    arrays = data.arrays()

    def shard_body(state, arrays, perm, rng):
        arrays = jax.tree.map(lambda x: x[0], arrays)
        idx = perm[0].reshape(steps_per_epoch, local_bs)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def body(carry, batch_idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            batch = gather_from(arrays, batch_idx)
            state, metrics = step_fn(state, batch, sub)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), idx)
        return state, jax.tree.map(jnp.mean, metrics)

    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_impl(state, arrays, perm, rng):
        return sharded(state, arrays, perm, rng)

    def epoch(state, perm, rng):
        return epoch_impl(state, arrays, perm, rng)

    return epoch


def make_epoch_fn(data: DeviceData, loss_grad_apply, steps_per_epoch: int, batch_size: int):
    """One jitted epoch: scan over shuffled batch indices.

    loss_grad_apply(state, batch, rng) -> (state, metrics) — the usual step.
    The dataset arrays are passed as jit ARGUMENTS (already device-resident),
    not closed over — closing over them bakes GBs of constants into the
    executable.
    """

    arrays = data.arrays()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_impl(state, arrays, perm, rng):
        idx = perm[: steps_per_epoch * batch_size].reshape(steps_per_epoch, batch_size)

        def body(carry, batch_idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            batch = gather_from(arrays, batch_idx)
            state, metrics = loss_grad_apply(state, batch, sub)
            return (state, rng), metrics

        (state, rng), metrics = jax.lax.scan(body, (state, rng), idx)
        return state, jax.tree.map(lambda m: jnp.mean(m), metrics)

    def epoch(state, perm, rng):
        return epoch_impl(state, arrays, perm, rng)

    return epoch
