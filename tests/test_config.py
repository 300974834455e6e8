import os
import textwrap

import pytest

from vgen_tpu.core.config import (AttrDict, Config, apply_cli_overrides,
                                  assign_single_cfg, load_yaml_with_bases,
                                  merge_dicts)


def _write(tmp_path, rel, text):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_attrdict_access_and_coercion():
    d = AttrDict({"a": {"b": 1}, "lr": "1e-5", "name": "zebra"})
    assert d.a.b == 1
    assert d["a"]["b"] == 1
    assert isinstance(d.lr, float) and d.lr == 1e-5
    assert d.name == "zebra"
    d.c = {"x": 2}
    assert d.c.x == 2


def test_merge_dicts_child_wins_recursive():
    base = {"a": 1, "m": {"x": 1, "y": 2}}
    new = {"a": 3, "m": {"y": 9}, "extra": True}
    out = merge_dicts(base, new)
    assert out == {"a": 3, "m": {"x": 1, "y": 9}, "extra": True}


def test_base_keys_dropped_unless_preserved():
    out = merge_dicts({"a": 1}, {"_BASE_MODEL": "x.yaml", "b": 2})
    assert "_BASE_MODEL" not in out and out["b"] == 2
    out = merge_dicts({"a": 1}, {"_BASE_MODEL": "x.yaml"}, preserve_base=True)
    assert out["_BASE_MODEL"] == "x.yaml"


def test_yaml_base_inheritance(tmp_path):
    _write(tmp_path, "configs/parent.yaml", """
        a: 1
        nested: {x: 1, y: 2}
    """)
    child = _write(tmp_path, "configs/child.yaml", """
        _BASE: ./parent.yaml
        nested: {y: 5}
        b: 2
    """)
    cfg = load_yaml_with_bases(child)
    assert cfg["a"] == 1 and cfg["b"] == 2
    assert cfg["nested"] == {"x": 1, "y": 5}


def test_yaml_relative_parent(tmp_path):
    _write(tmp_path, "top.yaml", "a: 10\n")
    child = _write(tmp_path, "configs/child.yaml", """
        _BASE_RUN: ../top.yaml
        b: 2
    """)
    cfg = load_yaml_with_bases(child)
    assert cfg["a"] == 10 and cfg["b"] == 2


def test_cli_overrides_typed_and_depth():
    cfg = {"lr": 0.1, "UNet": {"dim": 320, "inner": {"x": {"y": 1}}}}
    apply_cli_overrides(cfg, ["lr", "0.5", "UNet.dim", "640",
                              "UNet.inner.x.y", "7", "newkey", "hello"])
    assert cfg["lr"] == 0.5 and cfg["UNet"]["dim"] == 640
    assert cfg["UNet"]["inner"]["x"]["y"] == 7
    assert cfg["newkey"] == "hello"


def test_cli_overrides_reject_unknown_dotted():
    with pytest.raises(KeyError):
        apply_cli_overrides({"a": {}}, ["a.missing", "1"])
    with pytest.raises(ValueError):
        apply_cli_overrides({"a": 1}, ["a"])


def test_config_entrypoint(tmp_path, monkeypatch):
    cfg_file = _write(tmp_path, "configs/infer.yaml", """
        TASK_TYPE: inference_text2video_entrance
        guide_scale: 9.0
        seed: 8888
    """)
    monkeypatch.chdir(tmp_path)
    cfg = Config(load=True, args=["--cfg", cfg_file, "seed", "42"])
    assert cfg.TASK_TYPE == "inference_text2video_entrance"
    assert cfg.cfg_dict["seed"] == 42
    assert cfg.guide_scale == 9.0
    assert cfg.cfg_file == cfg_file  # argparse vars folded in


def test_assign_single_cfg(tmp_path):
    train = _write(tmp_path, "train.yaml", """
        UNet: {dim: 320}
        lr: 0.001
    """)
    cfg = AttrDict({"UNet": {"dim": 64, "extra": 1}, "seed": 1})
    out = assign_single_cfg(cfg, {"vldm_cfg": train}, "vldm_cfg")
    assert out.UNet.dim == 320
    assert out.UNet.extra == 1      # dict update, not replace
    assert out.lr == 0.001
    assert out.seed == 1
    assert cfg.UNet.dim == 64       # original untouched


def test_assign_dual_module_cfgs(tmp_path):
    """assign_prior_mudule_cfg / assign_vldm_vsr_mudule_cfg (reference
    utils/assign_cfg.py:6-60): each named yaml merges onto a COPY of the
    base cfg — dict values update existing keys, scalars overwrite."""
    from vgen_tpu.core.config import (assign_prior_mudule_cfg,
                                      assign_vldm_vsr_mudule_cfg)

    prior = _write(tmp_path, "prior.yaml", """
        UNet: {dim: 128}
        role: prior
    """)
    vldm = _write(tmp_path, "vldm.yaml", """
        UNet: {dim: 320}
        role: vldm
    """)
    vsr = _write(tmp_path, "vsr.yaml", """
        UNet: {dim: 1024}
        role: vsr
    """)
    base = AttrDict({"UNet": {"dim": 64, "extra": 1}, "seed": 7,
                     "prior_cfg": prior, "vldm_cfg": vldm, "vsr_cfg": vsr})

    p, v = assign_prior_mudule_cfg(base)
    assert (p.UNet.dim, p.role) == (128, "prior")
    assert (v.UNet.dim, v.role) == (320, "vldm")
    assert p.UNet.extra == v.UNet.extra == 1   # dict update, not replace
    assert p.seed == v.seed == 7

    v2, s = assign_vldm_vsr_mudule_cfg(base)
    assert (v2.UNet.dim, v2.role) == (320, "vldm")
    assert (s.UNet.dim, s.role) == (1024, "vsr")
    assert base.UNet.dim == 64                 # original untouched
