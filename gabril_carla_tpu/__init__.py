"""gabril_carla_tpu: TPU-native gaze-regularized behavior cloning + in-process driving sim.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
GABRIL-CARLA reference stack (see SURVEY.md): offline BC training with 7 gaze
methods x 3 dropout methods, a gaze-predictor trainer, a vmappable in-process
Bench2Drive-style driving environment with on-chip rasterized observations,
and closed-loop evaluation emitting Leaderboard-compatible driving scores.

Layout:
    ops/       pure-jnp / Pallas compute primitives (resize, heatmaps, gaze math, raster)
    models/    Flax modules (Encoder/Decoder/VQ/heads/UNet)
    data/      HDF5 dataset (robomimic schema), converter, task registry
    train/     optimizers, train-step builders, trainer loop, checkpointing
    parallel/  mesh + sharding helpers (pjit over ICI/DCN)
    env/       scene state, dynamics, NPC traffic, scenarios, criteria/scoring
    eval/      scan/vmap rollouts, agents, stats.json emission
    utils/     config, logging, profiling
"""

__version__ = "0.1.0"
