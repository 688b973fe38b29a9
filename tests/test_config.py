"""Config serialization round-trip + tagged-union parsing
(ref: tests/test_config.py)."""

import pytest
import yaml

from neural_lam_tpu import config as nlconfig


def test_roundtrip(tmp_path):
    c = nlconfig.NeuralLAMConfig(
        datastore=nlconfig.DatastoreSelection(
            kind="mdp", config_path="data.yaml"
        ),
        training=nlconfig.TrainingConfig(
            state_feature_weighting=nlconfig.ManualStateFeatureWeighting(
                weights={"u": 1.0, "v": 2.0}
            )
        ),
    )
    p = tmp_path / "c.yaml"
    c.to_yaml_file(p)
    c2 = nlconfig.NeuralLAMConfig.from_yaml_file(p)
    assert c2.datastore == c.datastore
    assert isinstance(
        c2.training.state_feature_weighting,
        nlconfig.ManualStateFeatureWeighting,
    )
    assert c2.training.state_feature_weighting.weights == {"u": 1.0, "v": 2.0}


def test_tagged_union_yaml(tmp_path):
    raw = {
        "datastore": {"kind": "mdp", "config_path": "d.yaml"},
        "training": {
            "state_feature_weighting": {
                "__config_class__": "UniformFeatureWeighting",
            }
        },
    }
    p = tmp_path / "c.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(raw, f)
    c = nlconfig.NeuralLAMConfig.from_yaml_file(p)
    assert isinstance(
        c.training.state_feature_weighting, nlconfig.UniformFeatureWeighting
    )


def test_defaults_when_training_missing(tmp_path):
    p = tmp_path / "c.yaml"
    with open(p, "w") as f:
        yaml.safe_dump({"datastore": {"kind": "mdp", "config_path": "x"}}, f)
    c = nlconfig.NeuralLAMConfig.from_yaml_file(p)
    assert isinstance(
        c.training.state_feature_weighting, nlconfig.UniformFeatureWeighting
    )


def test_invalid_config_errors(tmp_path):
    p = tmp_path / "bad.yaml"
    with open(p, "w") as f:
        yaml.safe_dump({"no_datastore": {}}, f)
    with pytest.raises(nlconfig.InvalidConfigError):
        nlconfig.NeuralLAMConfig.from_yaml_file(p)

    p2 = tmp_path / "bad2.yaml"
    with open(p2, "w") as f:
        yaml.safe_dump(
            {"datastore": {"kind": "mdp", "config_path": "x"},
             "training": {"state_feature_weighting": {
                 "__config_class__": "NotAClass"}}},
            f,
        )
    with pytest.raises(nlconfig.InvalidConfigError):
        nlconfig.NeuralLAMConfig.from_yaml_file(p2)
