"""The `python -m examples.run_example <yaml>` CLI end-to-end on a file-based
config (tiny model, fixture data)."""

import sys

import yaml


NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def _write_yaml(tmp_path):
    conf = {
        "general": {
            "operation": "training",
            "train_data_paths": NOISE_DIR,
            "results_save_path": str(tmp_path / "results"),
            "num_epochs": 1,
            "batch_size": 4,
            "scale": 2,
            "train_val_split": 0.25,
            "crop_imgs": True,
            "crop_size": [16, 16, 3],
            "num_crops": 2,
            "random_seed": 3,
        },
        "model": {
            "generator": {
                "upsample_factor": 2,
                "architecture": "srresnet",
                "num_blocks": 1,
                "num_filters": 8,
                "input_dims": [16, 16],
                "dtype": "float32",
                "loss_functions": [{"loss_function": "MeanSquaredError"}],
            },
            "generator_optimizer": "Adam",
            "generator_optimizer_config": {"learning_rate": 1.0e-3},
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(conf))
    return str(path)


def test_run_example_training_from_yaml_file(tmp_path):
    from examples.run_example import main

    rc = main(["run_example", _write_yaml(tmp_path)])
    assert rc == 0
    runs = list((tmp_path / "results" / "training").iterdir())
    assert runs
    run = runs[0]
    assert list((run / "models").glob("resnet_gen_best.msgpack"))
    assert list((run / "json_dump").glob("*.json"))


def test_run_example_usage_errors(tmp_path, capsys):
    from examples.run_example import main

    assert main(["run_example"]) == 1
    bad = tmp_path / "bad.yaml"
    bad.write_text("general:\n  operation: bogus\n")
    assert main(["run_example", str(bad)]) == 1
    out = capsys.readouterr().out
    assert "not recognized" in out


def test_run_example_training_paired_from_yaml_file(tmp_path):
    """YAML surface of the production recipe: general.paired_train flows
    through training_config -> SRModel.init -> the packed-layout step."""
    import yaml as _yaml
    from examples.run_example import main

    path = _write_yaml(tmp_path)
    conf = _yaml.safe_load(open(path))
    conf["general"]["paired_train"] = 2
    conf["model"]["generator"]["batch_norm"] = False
    path2 = tmp_path / "config_paired.yaml"
    path2.write_text(_yaml.safe_dump(conf))
    rc = main(["run_example", str(path2)])
    assert rc == 0
    runs = list((tmp_path / "results" / "training").iterdir())
    assert any((run / "models" / "resnet_gen_best.msgpack").exists()
               for run in runs)
