"""Config system: YAML _base_ inheritance + dotted overrides."""

from pathlib import Path

from gabril_carla_tpu.utils.config import load_config, default_bc_config

REPO = Path(__file__).resolve().parent.parent


def test_yaml_base_inheritance():
    cfg = load_config(REPO / "configs" / "train_bc.yaml")
    assert cfg.data["batch_size"] == 2048  # child override
    assert cfg.model["embedding_dim"] == 64  # inherited
    assert cfg.gaze["method"] == "Reg"


def test_confounded_variant_swaps_gaze_key():
    cfg = load_config(REPO / "configs" / "train_bc_confounded.yaml")
    assert cfg.data["gaze_key"] == "gaze_coords_filter_dynamic"
    assert cfg.data["batch_size"] == 256  # from base, not train_bc.yaml


def test_dotted_overrides_and_types():
    cfg = load_config(REPO / "configs" / "train_bc.yaml",
                      overrides=["gaze.method=AGIL", "optimizer.lr=0.001",
                                 "scheduler.type=none", "training.donate=false"])
    assert cfg.gaze["method"] == "AGIL"
    assert cfg.optimizer["lr"] == 0.001
    assert cfg.scheduler["type"] == "none"  # stays a string
    assert cfg.training["donate"] is False


def test_default_config_paths():
    cfg = default_bc_config()
    assert cfg.get_path("dropout.oreo_prob") == 0.5
    cfg.set_path("a.b.c", 3)
    assert cfg.get_path("a.b.c") == 3
    assert cfg.get_path("missing.key", "fallback") == "fallback"


def test_tensorboard_scalars_written(tmp_path):
    from gabril_carla_tpu.utils import default_bc_config
    from gabril_carla_tpu.utils.logging import ExperimentLogger

    cfg = default_bc_config()
    cfg["logging"]["log_dir"] = str(tmp_path)
    cfg["logging"]["tensorboard"] = True
    lg = ExperimentLogger(cfg)
    lg.log_scalars(1, {"loss": 0.5})
    lg.log_scalars(2, {"loss": 0.25})
    tb_dir = lg.log_dir / "tb"
    assert tb_dir.exists() and any(tb_dir.iterdir())


def test_figures_cli(tmp_path):
    import json

    from gabril_carla_tpu.cli.figures import main as figmain

    reps = []
    for i, scale in enumerate((1.0, 1.05)):
        rep = {"methods": {
            "None": {"seen": 60 * scale, "unseen": 40},
            "Reg@0.3": {"seen": 80 * scale, "unseen": 50},
            "Reg@0.1": {"seen": 70, "unseen": 45},
            "Reg@1.0": {"seen": 55, "unseen": 30},
            "Reg@0.3%0.25": {"seen": 62, "unseen": 41},
            "Reg@0.3%0.75": {"seen": 71, "unseen": 44},
        }}
        p = tmp_path / f"rep{i}.json"
        p.write_text(json.dumps(rep))
        reps.append(str(p))
    conf = tmp_path / "conf.json"
    conf.write_text(json.dumps({"methods": {
        "None": {"seen": 33, "unseen": 20},
        "Reg@0.3": {"seen": 45, "unseen": 30},
    }}))
    ladder = {}
    for rung in ("sparse", "human"):
        lp = tmp_path / f"{rung}.json"
        lp.write_text(json.dumps({"methods": {
            "GRIL": {"seen": 59, "unseen": 33},
            "None:GMD": {"seen": 70, "unseen": 40},
            "Reg@0.3": {"seen": 72, "unseen": 31},
        }}))
        ladder[rung] = str(lp)
    # dense rung comes from --reports; add its methods there too
    dense = tmp_path / "dense_extra.json"
    dense.write_text(json.dumps({"methods": {
        "GRIL": {"seen": 61, "unseen": 35}, "None:GMD": {"seen": 60, "unseen": 41},
    }}))
    out = tmp_path / "figs"
    assert figmain(["--reports", *reps, str(dense), "--conf_reports", str(conf),
                    "--ladder_sparse", ladder["sparse"],
                    "--ladder_human", ladder["human"],
                    "--out", str(out)]) == 0
    names = {f.name for f in out.glob("*.png")}
    assert {"methods_bar.png", "lambda_curve.png", "ratio_curve.png",
            "confounded_bar.png", "ladder_bar.png"} <= names


def test_manifest_records_identity_fields(tmp_path):
    """save_manifest must pin lambda/ratio/temporal so ablation checkpoints
    are distinguishable (reeval label re-attachment)."""
    import json
    from gabril_carla_tpu.train.checkpoint import save_manifest
    from gabril_carla_tpu.utils.config import default_bc_config

    cfg = default_bc_config()
    cfg["gaze"]["method"] = "Reg"
    cfg["gaze"]["lambda_weight"] = 0.03
    cfg["gaze"]["ratio"] = 0.5
    cfg["gaze"]["temporal_flag"] = False
    save_manifest(tmp_path, cfg, epoch=3)
    man = json.loads((tmp_path / "params.json").read_text())
    assert man["gaze_lambda"] == 0.03
    assert man["gaze_ratio"] == 0.5
    assert man["temporal_flag"] is False


def test_reeval_spec_matching():
    """Label <-> manifest matching disambiguates ablation suites."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "reeval", Path(__file__).parent.parent / "examples" / "reeval.py")
    reeval = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(reeval)

    man_l003 = {"gaze_method": "Reg", "dp_method": "None",
                "gaze_lambda": 0.03, "gaze_ratio": 1.0, "temporal_flag": True}
    man_nt = {"gaze_method": "Reg", "dp_method": "None",
              "gaze_lambda": 0.3, "gaze_ratio": 1.0, "temporal_flag": False}
    labels = ["Reg@0.03", "Reg@0.1", "Reg@1.0", "Reg@0.3!notemporal"]
    assert [m for m in labels if reeval.spec_matches(m, man_l003)] == ["Reg@0.03"]
    assert [m for m in labels if reeval.spec_matches(m, man_nt)] == ["Reg@0.3!notemporal"]
    # legacy manifest (no identity fields): pair-only match, ambiguous
    legacy = {"gaze_method": "Reg", "dp_method": "None"}
    assert len([m for m in labels if reeval.spec_matches(m, legacy)]) == 4
    # dropout pairs stay exact
    assert reeval.spec_matches("None:GMD", {"gaze_method": "None", "dp_method": "GMD"})
    assert not reeval.spec_matches("None", {"gaze_method": "None", "dp_method": "GMD"})
