import pytest

from vgen_tpu.core.registry import Registry


def test_register_and_build_class():
    reg = Registry("TEST")

    @reg.register_class()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = reg.build({"type": "Foo", "a": 1})
    assert isinstance(obj, Foo) and obj.a == 1 and obj.b == 2


def test_build_kwargs_override_cfg():
    reg = Registry("TEST2")

    @reg.register_class()
    class Foo:
        def __init__(self, a):
            self.a = a

    obj = reg.build({"type": "Foo", "a": 1}, a=5)
    assert obj.a == 5


def test_build_does_not_mutate_cfg():
    reg = Registry("TEST3")

    @reg.register_function()
    def make(x):
        return x * 2

    cfg = {"type": "make", "x": 3}
    assert reg.build(cfg) == 6
    assert cfg == {"type": "make", "x": 3}


def test_string_build_returns_entry():
    reg = Registry("TEST4")

    @reg.register_function("myfn")
    def myfn():
        return 42

    assert reg.build("myfn") is myfn


def test_missing_type_and_unknown_name():
    reg = Registry("TEST5")
    with pytest.raises(KeyError):
        reg.build({"a": 1})
    with pytest.raises(KeyError):
        reg.build({"type": "nope"})


def test_duplicate_registration_rejected():
    reg = Registry("TEST6")

    @reg.register_class("X")
    class A:
        pass

    with pytest.raises(KeyError):
        @reg.register_class("X")
        class B:
            pass


def test_global_registries_exist():
    from vgen_tpu.core import registry as R
    for name in ("AUTO_ENCODER", "DATASETS", "DIFFUSION", "DISTRIBUTION",
                 "EMBEDDER", "EMBEDMANAGER", "ENGINE", "INFER_ENGINE",
                 "MODEL", "PRETRAIN", "VISUAL"):
        assert isinstance(getattr(R, name), Registry)
