"""Command-line entry points.

    python -m gabril_carla_tpu.cli.train_bc --config cfg.yaml gaze.method=Reg
    python -m gabril_carla_tpu.cli.train_gaze_predictor ...
    python -m gabril_carla_tpu.cli.eval_routes --checkpoint runs/.../checkpoints
    python -m gabril_carla_tpu.cli.calc_scores --stats_dir eval_out
    python -m gabril_carla_tpu.cli.convert_dataset --dataset_root ... --output x.hdf5
    python -m gabril_carla_tpu.cli.collect --route 3100 --seed 200 --out dataset/
"""
