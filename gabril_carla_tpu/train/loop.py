"""Trainer: sharded epoch loop shared by BC and gaze-predictor training.

The reference's BaseTrainer epoch loop (train/common/base_trainer.py:116-192)
maps here to: host-side shuffled batch iterator -> device_put with 'data'
sharding -> one jitted train step (grad accumulation handled by
optax.MultiSteps, DDP allreduce by XLA's implicit psum over the mesh).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..data.dataset import BCDataset
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.logging import ExperimentLogger
from ..utils.profiling import StageTimer
from .bc import init_bc_state, make_bc_train_step
from .checkpoint import (latest_resume_state, restore_params, save_manifest,
                         save_params, save_resume_state)
from .gaze_predictor import init_gaze_state, make_gaze_train_step
from .optim import build_optimizer
from .vqvae import init_vqvae_state, make_vqvae_train_step

# Collapse-gated restore threshold for the gaze predictor (see train()):
# restore the best-epoch snapshot only when the final train loss is this
# many times worse than the best epoch's — i.e. only on a genuine mid-run
# MSE-head blowup, never as silent best-checkpoint selection.
COLLAPSE_GATE = 2.0


class Trainer:
    """mode: 'bc' (BCTrainer parity), 'gaze' (GazePredictorTrainer parity),
    or 'vqvae' (Oreo quantizer pretraining)."""

    def __init__(self, cfg, dataset: BCDataset, mode: str = "bc", mesh=None,
                 device_data=None):
        """``device_data``: an existing DeviceData for this dataset, shared
        across successive Trainers so the multi-GB HBM copy uploads once per
        process instead of once per training run."""
        self.cfg = cfg
        self.dataset = dataset
        self.mode = mode
        self.mesh = mesh if mesh is not None else make_mesh()
        bs = cfg.data["batch_size"]
        spe = dataset.steps_per_epoch(bs)
        if spe == 0:
            raise ValueError(f"batch_size {bs} exceeds dataset size {len(dataset)}")
        self.steps_per_epoch = spe
        tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, spe)
        rng = jax.random.PRNGKey(cfg.get_path("training.seed", 0))
        donate = bool(cfg.get_path("training.donate", True))
        # device-resident data: park the whole dataset in HBM and run each
        # epoch as one jitted scan (no per-step host->device traffic). Auto
        # on single-process runs when the dataset fits comfortably.
        n_data = self.mesh.shape["data"]
        # sharding assigns whole episodes to shards, so it needs >= one
        # episode per 'data' device; otherwise fall back to the replicated
        # single-device fast path
        can_shard = n_data > 1 and dataset.store.n_demos >= n_data
        dd = cfg.get_path("training.device_data", "auto")
        if dd == "auto":
            n_bytes = sum(x.nbytes for x in dataset.store.images)
            # fits when each 'data' shard holds < 9 GB of the 16 GB HBM
            # (params/optimizer are ~100 MB and the epoch workspace is one
            # batch); lazy (disk-backed) stores stream by construction.
            # Through this machine's TPU tunnel the streamed fallback costs
            # ~0.5 s per batch, so err toward device residency.
            per_shard = n_bytes / (n_data if can_shard else 1)
            dd = per_shard < 9e9 and not dataset.store.lazy
        self.device_mode = bool(dd)
        self._sharded_device = self.device_mode and can_shard and not dataset.store.lazy
        axis = "data" if self._sharded_device else None

        self.logger = ExperimentLogger(cfg)
        jit_step = not self.device_mode
        if mode == "bc":
            self.models, self.state = init_bc_state(cfg, rng, tx)
            self.step_fn = make_bc_train_step(self.models, cfg, donate=donate, jit=jit_step,
                                              axis_name=axis)
            self._maybe_load_vqvae()
        elif mode == "gaze":
            (self.model, self.heatmapper), self.state = init_gaze_state(cfg, rng, tx)
            self.step_fn = make_gaze_train_step(self.model, self.heatmapper, cfg,
                                                donate=donate, jit=jit_step, axis_name=axis)
        elif mode == "vqvae":
            from .vqvae import make_revive_dead_codes

            (self.models, self.heatmapper), self.state = init_vqvae_state(cfg, rng, tx)
            self.step_fn = make_vqvae_train_step(self.models, self.heatmapper, cfg,
                                                 donate=donate, jit=jit_step, axis_name=axis)
            self._revive_fn = make_revive_dead_codes(self.models, cfg)
        else:
            raise ValueError(f"unknown mode {mode}")

        if self._sharded_device:
            from ..parallel.mesh import replicated_sharding
            from .device_data import ShardedDeviceData, make_sharded_epoch_fn

            self._local_bs = max(1, bs // n_data)
            self.device_data = ShardedDeviceData(dataset.store, cfg.data["frame_stack"],
                                                 self.mesh,
                                                 grayscale_store=cfg.model["grayscale"])
            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
            self.epoch_fn = make_sharded_epoch_fn(self.device_data, self.step_fn,
                                                  self.steps_per_epoch, self._local_bs,
                                                  self.mesh)
        elif self.device_mode:
            from .device_data import DeviceData, make_epoch_fn

            self.device_data = device_data if device_data is not None else DeviceData(
                dataset.store, cfg.data["frame_stack"],
                grayscale_store=cfg.model["grayscale"])
            self.epoch_fn = make_epoch_fn(self.device_data, self.step_fn,
                                          self.steps_per_epoch, bs)
        self.timer = StageTimer()
        self._rng = np.random.default_rng(cfg.get_path("training.seed", 0))
        self._step_key = jax.random.PRNGKey(cfg.get_path("training.seed", 0) + 1)
        self._global_step = 0
        self._best_loss, self._best_params, self._best_epoch = float("inf"), None, -1

    def train(self, resume: bool = False) -> dict:
        """Run the epoch loop. ``resume=True``: continue from the newest
        full-state checkpoint in this run's ckpt_dir (params + optimizer +
        epoch/RNG cursors — see save_resume/restore_resume), reproducing the
        uninterrupted run bit-for-bit; starts fresh if none exists."""
        cfg = self.cfg
        epochs = cfg.get_path("training.epochs", 1)
        save_interval = cfg.get_path("training.save_interval", 50)
        # full-state autosave cadence in epochs; 0 disables (default — the
        # host round-trip of params+opt_state costs seconds over the TPU
        # tunnel, so preemption safety is opt-in per run)
        resume_interval = cfg.get_path("training.resume_interval",
                                       1 if resume else 0)
        bs = cfg.data["batch_size"]
        last = {}
        # The frozen gaze predictor uses COLLAPSE-GATED restore (round 5,
        # retiring the round-3 keep-best-on-train-loss divergence, docs/
        # PARITY.md): like the reference it keeps its LAST epoch
        # (train/common/base_trainer.py:164-180 keeps interval/last
        # checkpoints only) — UNLESS the run demonstrably collapsed. At
        # batch 128 a clipped-but-hot step can blow the MSE head into a
        # constant predictor mid-run (loss jumps to the target variance and
        # pins there — observed seed-dependent, results_r3/core2.log seed 42
        # epoch 10), and every heat-consuming method downstream
        # (AGIL/ViSaRL/Mask/GMD/IGMD) then evaluates against degenerate
        # heat. The gate: restore the best-epoch snapshot only when the
        # final loss exceeds COLLAPSE_GATE x the best epoch's loss — a
        # normally-converged run ends within ~10-20% of its best, a blown
        # MSE head pins orders of magnitude above it, so the gate separates
        # them cleanly without selecting checkpoints on train loss.
        # BC/VQ modes keep plain last-epoch semantics.
        keep_best = self.mode == "gaze"
        self._best_loss, self._best_params, self._best_epoch = float("inf"), None, -1
        start_epoch = self.restore_resume() if resume else 0
        for epoch in range(start_epoch, epochs):
            if self.device_mode:
                with self.timer.stage("epoch"):
                    if self._sharded_device:
                        perm = jnp.asarray(self.device_data.epoch_perm(
                            self._rng, self.steps_per_epoch, self._local_bs))
                    else:
                        perm = jnp.asarray(self._rng.permutation(self.device_data.n_samples))
                    self._step_key, sub = jax.random.split(self._step_key)
                    self.state, metrics = self.epoch_fn(self.state, perm, sub)
                    avg = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                self._global_step += self.steps_per_epoch
            else:
                totals, count = {}, 0
                for batch in self.dataset.iter_batches(bs, self._rng):
                    with self.timer.stage("data"):
                        batch = shard_batch(batch, self.mesh)
                    with self.timer.stage("step"):
                        self._step_key, sub = jax.random.split(self._step_key)
                        self.state, metrics = self.step_fn(self.state, batch, sub)
                    count += 1
                    for k, v in metrics.items():
                        totals[k] = totals.get(k, 0.0) + v
                    self._global_step += 1
                # one host sync per epoch
                with self.timer.stage("sync"):
                    avg = {k: float(jax.device_get(v)) / count for k, v in totals.items()}
            if self.mode == "vqvae":
                avg["dead_codes"] = self._revive_dead_codes(epoch)
            self.logger.log_scalars(self._global_step, {"epoch": epoch + 1, **avg})
            self.logger.print(
                f"epoch {epoch + 1}/{epochs}: " + ", ".join(f"{k}={v:.5f}" for k, v in avg.items())
            )
            last = avg
            if keep_best and avg.get("loss", float("inf")) < self._best_loss:
                self._best_loss, self._best_epoch = avg["loss"], epoch + 1
                # host copy: donated train steps invalidate old device buffers
                self._best_params = jax.device_get(self.state.params)
            if (epoch + 1) % save_interval == 0 or (epoch + 1) == epochs:
                self.save(epoch + 1)
            if resume_interval and ((epoch + 1) % resume_interval == 0
                                    or (epoch + 1) == epochs):
                self.save_resume(epoch + 1)
        collapsed = (keep_best and self._best_params is not None
                     and self._best_epoch != epochs
                     and last.get("loss", 0.0) > COLLAPSE_GATE * self._best_loss)
        if collapsed:
            restored = jax.tree.map(jnp.asarray, self._best_params)
            if self._sharded_device:
                # keep the replicated sharding the rest of the state carries —
                # a plain asarray would leave params uncommitted and the
                # state mixed-sharding (ADVICE r3)
                from ..parallel.mesh import replicated_sharding

                restored = jax.device_put(restored, replicated_sharding(self.mesh))
            self.state = self.state.replace(params=restored)
            self.save(epochs)  # final checkpoint holds the restored params
            self.logger.print(
                f"collapse gate tripped: restored epoch {self._best_epoch} "
                f"(loss {self._best_loss:.5f}) over final epoch "
                f"({last.get('loss', float('nan')):.5f} > "
                f"{COLLAPSE_GATE:g}x best)")
            last = {**last, "loss": self._best_loss, "kept_best_epoch": self._best_epoch}
        return last

    def _revive_dead_codes(self, epoch: int) -> int:
        """Between VQ-VAE epochs: re-seed codebook rows no batch latent maps
        to (collapse guard — see vqvae.make_revive_dead_codes).

        The probe batch is gathered ON DEVICE when the dataset is
        device-resident — a per-epoch multi-MB host->device transfer both
        wastes tunnel bandwidth and has been observed to wedge the tunneled
        TPU backend mid-run."""
        if self._sharded_device:
            return -1  # usage statistics are shard-local; skip (vqvae
            # pretraining runs single-chip in every current pipeline)
        if self.device_mode:
            n = min(512, self.device_data.n_samples)
            batch = self.device_data.gather(jnp.arange(n))
        else:
            n = min(512, len(self.dataset))
            batch = jax.tree.map(jnp.asarray, self.dataset.sample(np.arange(n)))
        key = jax.random.fold_in(jax.random.PRNGKey(77), epoch)
        new_params, dead = self._revive_fn(self.state.params, batch, key)
        self.state = self.state.replace(params=new_params)
        return int(jax.device_get(dead))

    def save(self, epoch: int):
        save_params(self.logger.ckpt_dir, epoch, self.state.params)
        if self.cfg.get_path("logging.save_params", True):
            extra = None
            if self.mode != "bc":
                extra = {"model_type": "gaze_predictor" if self.mode == "gaze" else self.mode}
            save_manifest(self.logger.ckpt_dir, self.cfg, epoch, extra=extra)

    def _resume_tree(self):
        """Device arrays of the full training state (for Orbax)."""
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": jnp.asarray(self.state.step),
            "step_key": self._step_key,
        }
        if self._best_params is not None:
            tree["best_params"] = self._best_params
        return tree

    def save_resume(self, epoch_done: int):
        """Full-state checkpoint: params + optimizer state + step counter +
        both RNG cursors + keep-best trackers. With restore_resume this makes
        a killed run continue bit-for-bit (regression: tests/test_resume.py).
        The reference saves module weights only (train/train_bc.py:301-335)."""
        save_resume_state(self.logger.ckpt_dir, epoch_done, self._resume_tree(), {
            "global_step": self._global_step,
            "rng_state": self._rng.bit_generator.state,
            "best_loss": self._best_loss,
            "best_epoch": self._best_epoch,
            "has_best": self._best_params is not None,
        })

    def restore_resume(self) -> int:
        """Restore the newest complete resume checkpoint in this run's
        ckpt_dir. Returns the epoch index to continue FROM (0 = none found)."""
        found = latest_resume_state(self.logger.ckpt_dir)
        if found is None:
            return 0
        path, meta = found
        # the template needs best_params iff the checkpoint carries it
        self._best_params = (jax.device_get(self.state.params)
                             if meta.get("has_best") else None)
        loaded = restore_params(path, self._resume_tree())
        state = self.state.replace(
            params=loaded["params"], opt_state=loaded["opt_state"],
            step=loaded["step"])
        # Orbax hands back arrays committed to device 0; replicate them over
        # the mesh so the next step's sharded batch doesn't see mixed
        # placements (and sharded-device mode keeps its invariant).
        from ..parallel.mesh import replicated_sharding

        state = jax.device_put(state, replicated_sharding(self.mesh))
        self.state = state
        self._step_key = jnp.asarray(loaded["step_key"])
        self._best_params = loaded.get("best_params")
        self._global_step = int(meta["global_step"])
        self._best_loss = float(meta["best_loss"])
        self._best_epoch = int(meta["best_epoch"])
        self._rng.bit_generator.state = meta["rng_state"]
        self.logger.print(f"resumed from epoch {meta['epoch_done']} "
                          f"(global step {self._global_step})")
        return int(meta["epoch_done"])

    def _maybe_load_vqvae(self):
        """Oreo: adopt a pretrained VQ-VAE's encoder + frozen quantizer
        (train_bc.py:87-99 parity)."""
        from pathlib import Path

        path = self.cfg.get_path("dropout.vqvae_path", "")
        if self.cfg.get_path("dropout.method") != "Oreo" or not path:
            return
        if not Path(path).exists():
            self.logger.print(f"Warning: VQ-VAE model not found at {path}")
            return
        loaded = restore_params(path)
        params = dict(self.state.params)
        params["encoder"] = loaded["encoder"]
        params["quantizer"] = loaded["quantizer"]
        self.state = self.state.replace(params=params)
        self.logger.print(f"Loaded VQ-VAE from {path}")
