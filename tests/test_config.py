import os
import textwrap

import pytest

from concepthash_tpu.config import instantiate, load_config, register
from concepthash_tpu.config.loader import save_config, load_saved_config


@pytest.fixture
def config_dir(tmp_path):
    d = tmp_path / "configs"
    (d / "dataset").mkdir(parents=True)
    (d / "model").mkdir()
    (d / "optim").mkdir()
    (d / "backbone").mkdir()
    (d / "train.yaml").write_text(textwrap.dedent("""\
        defaults:
          - _self_
          - /dataset: cub200
          - /optim: adam
          - /backbone: null
          - /model: null
        dataset_name: ${choices.dataset}
        method_name: ${hydra:runtime.choices.model}
        batch_size: 64
        epochs: 100
        seed: 42
        tag: ""
        milestone: ${eval:"int(${epochs} * 0.5)"}
    """))
    (d / "dataset" / "cub200.yaml").write_text(textwrap.dedent("""\
        nclass: 200
        R: -1
        norm: 2
        crop: 224
    """))
    (d / "dataset" / "cars196.yaml").write_text("nclass: 196\nR: -1\nnorm: 2\ncrop: 224\n")
    (d / "optim" / "adam.yaml").write_text("name: adam\nlr: 0.0001\n")
    (d / "optim" / "sgd.yaml").write_text("name: sgd\nlr: 0.001\nmomentum: 0.9\n")
    (d / "backbone" / "clip_vision.yaml").write_text("name: clip-b32\n")
    (d / "model" / "concept.yaml").write_text(textwrap.dedent("""\
        # @package _global_
        defaults:
          - override /backbone: clip_vision
        model:
          name: concepthash
          nbit: 64
          nclass: ${dataset.nclass}
        batch_size: 32
        dataset:
          norm: 3
    """))
    return str(d)


def test_defaults_and_groups(config_dir):
    cfg = load_config(config_dir, "train", [])
    assert cfg["dataset"]["nclass"] == 200
    assert cfg["optim"]["name"] == "adam"
    assert cfg["dataset_name"] == "cub200"
    assert cfg["milestone"] == 50


def test_group_override_and_global_package(config_dir):
    cfg = load_config(config_dir, "train", ["model=concept", "dataset=cars196", "optim=sgd"])
    # @package _global_ model config merges at root and overrides root keys
    assert cfg["batch_size"] == 32
    assert cfg["model"]["nbit"] == 64
    # interpolation picks up the *selected* dataset
    assert cfg["model"]["nclass"] == 196
    # model config forced dataset.norm: 3 on top of group value
    assert cfg["dataset"]["norm"] == 3
    # model config's own defaults chose the backbone
    assert cfg["backbone"]["name"] == "clip-b32"
    assert cfg["optim"]["name"] == "sgd"
    assert cfg["method_name"] == "concept"


def test_value_overrides_and_types(config_dir):
    cfg = load_config(config_dir, "train",
                      ["model=concept", "model.nbit=16", "epochs=3", "tag=abc",
                       "+extra.flag=true"])
    assert cfg["model"]["nbit"] == 16 and isinstance(cfg["model"]["nbit"], int)
    assert cfg["epochs"] == 3
    assert cfg["tag"] == "abc"
    assert cfg["extra"]["flag"] is True
    assert cfg["milestone"] == 1  # eval resolver saw the override


def test_save_roundtrip(config_dir, tmp_path):
    cfg = load_config(config_dir, "train", ["model=concept"])
    p = str(tmp_path / "run" / "config.yaml")
    save_config(cfg, p)
    again = load_saved_config(p)
    assert again["model"]["nbit"] == cfg["model"]["nbit"]
    assert "_choices_" not in again


def test_instantiate_registry():
    register("test.make_pair", lambda a, b=2: (a, b))
    built = instantiate({"_target_": "test.make_pair", "_args_": [1], "b": 5})
    assert built == (1, 5)
    # nested instantiation
    built = instantiate({
        "_target_": "test.make_pair",
        "_args_": [{"_target_": "test.make_pair", "_args_": [7]}],
        "b": 9,
    })
    assert built == ((7, 2), 9)


def test_instantiate_rejects_arbitrary_paths():
    with pytest.raises(KeyError):
        instantiate({"_target_": "os.system", "_args_": ["echo hi"]})
