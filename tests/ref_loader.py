"""Load individual reference (PyTorch) modules for golden-value testing.

The reference at /root/reference is the behavioral oracle: tests compare
our JAX implementations against its outputs on CPU torch. We load single
files with importlib and stub their heavyweight deps (registries, torchsde,
xformers) so the comparisons stay hermetic. Reference code is never
imported by the framework itself — tests only.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"


def _load(name: str, path: str, package: str = None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ensure_stub_registry():
    """Provide a no-op utils.registry_class for reference modules."""
    if "utils.registry_class" in sys.modules:
        return
    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = []
    reg_mod = types.ModuleType("utils.registry_class")

    class _NoopRegistry:
        def register_class(self, *a, **k):
            def deco(cls):
                return cls
            return deco

        register_function = register_class

    for rname in ("AUTO_ENCODER", "DATASETS", "DIFFUSION", "DISTRIBUTION",
                  "EMBEDDER", "EMBEDMANAGER", "ENGINE", "INFER_ENGINE",
                  "MODEL", "PRETRAIN", "VISUAL"):
        setattr(reg_mod, rname, _NoopRegistry())
    utils_pkg.registry_class = reg_mod
    sys.modules.setdefault("utils", utils_pkg)
    sys.modules["utils.registry_class"] = reg_mod


def _ensure_stub_torchsde():
    """Zero-noise torchsde stub: lets us golden-test the deterministic
    (eta=0) path of the reference dpmpp_2m_sde solver."""
    if "torchsde" in sys.modules:
        return
    import torch

    class _ZeroTree:
        def __init__(self, t0, w0, t1, entropy=None, **kw):
            self.w0 = w0

        def __call__(self, t0, t1):
            return torch.zeros_like(self.w0)

    mod = types.ModuleType("torchsde")
    mod.BrownianTree = _ZeroTree
    sys.modules["torchsde"] = mod


def _ensure_stub_tqdm():
    if "tqdm.auto" in sys.modules:
        return
    tqdm_pkg = types.ModuleType("tqdm")
    auto = types.ModuleType("tqdm.auto")

    def trange(n, **kw):
        return range(n)

    auto.trange = trange
    tqdm_pkg.auto = auto
    sys.modules.setdefault("tqdm", tqdm_pkg)
    sys.modules["tqdm.auto"] = auto


def load_ref_schedules():
    return _load("refdiff_schedules",
                 f"{REF}/tools/modules/diffusions/schedules.py")


def load_ref_ddim():
    """Reference diffusion_ddim with package-relative imports satisfied."""
    _ensure_stub_registry()
    pkg = types.ModuleType("refdiff")
    pkg.__path__ = [f"{REF}/tools/modules/diffusions"]
    sys.modules.setdefault("refdiff", pkg)
    _load("refdiff.schedules", f"{REF}/tools/modules/diffusions/schedules.py",
          package="refdiff")
    _load("refdiff.losses", f"{REF}/tools/modules/diffusions/losses.py",
          package="refdiff")
    _ensure_stub_torchsde()
    _ensure_stub_tqdm()
    _load("refdiff.diffusion_gauss",
          f"{REF}/tools/modules/diffusions/diffusion_gauss.py",
          package="refdiff")
    return _load("refdiff.diffusion_ddim",
                 f"{REF}/tools/modules/diffusions/diffusion_ddim.py",
                 package="refdiff")


def load_ref_gauss():
    load_ref_ddim()
    return sys.modules["refdiff.diffusion_gauss"]


def _ensure_stub_unet_deps():
    """Stub xformers (torch softmax attention), open_clip, rotary, fairscale
    so the reference UNet/VAE instantiate on CPU torch."""
    import torch

    if "xformers" not in sys.modules:
        xf = types.ModuleType("xformers")
        ops = types.ModuleType("xformers.ops")

        def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
            scale = q.shape[-1] ** -0.5
            s = torch.einsum("bqd,bkd->bqk", q.float(), k.float()) * scale
            if attn_bias is not None:
                s = s + attn_bias
            p = torch.softmax(s, dim=-1)
            return torch.einsum("bqk,bkd->bqd", p, v.float()).to(q.dtype)

        ops.memory_efficient_attention = memory_efficient_attention
        xf.ops = ops
        sys.modules["xformers"] = xf
        sys.modules["xformers.ops"] = ops

    if "open_clip" not in sys.modules:
        oc = types.ModuleType("open_clip")
        sys.modules["open_clip"] = oc

    if "rotary_embedding_torch" not in sys.modules:
        rot = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding:
            def __init__(self, *a, **k):
                pass

        rot.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = rot

    if "fairscale.nn.checkpoint" not in sys.modules:
        fs = types.ModuleType("fairscale")
        fs_nn = types.ModuleType("fairscale.nn")
        fs_ck = types.ModuleType("fairscale.nn.checkpoint")
        fs_ck.checkpoint_wrapper = lambda m, *a, **k: m
        fs_nn.checkpoint = fs_ck
        fs.nn = fs_nn
        sys.modules["fairscale"] = fs
        sys.modules["fairscale.nn"] = fs_nn
        sys.modules["fairscale.nn.checkpoint"] = fs_ck


def load_ref_unet_t2v():
    """Reference UNetSD_T2VBase module (CPU torch, CUDA deps stubbed)."""
    _ensure_stub_registry()
    _ensure_stub_unet_deps()
    pkg = types.ModuleType("refunet")
    pkg.__path__ = [f"{REF}/tools/modules/unet"]
    sys.modules.setdefault("refunet", pkg)
    _load("refunet.util", f"{REF}/tools/modules/unet/util.py", package="refunet")
    return _load("refunet.unet_t2v", f"{REF}/tools/modules/unet/unet_t2v.py",
                 package="refunet")


def load_ref_autoencoder():
    _ensure_stub_registry()
    return _load("ref_autoencoder", f"{REF}/tools/modules/autoencoder.py")


def load_ref_open_clip():
    """The reference's bundled open_clip fork (utils/reward/open_clip/),
    model.py + transformer.py only — the numerical oracle for our CLIP
    towers. timm is absent in this environment but the fork guards that
    import; hf_model needs transformers (present)."""
    if "refclip.model" in sys.modules:
        return sys.modules["refclip.model"]
    if "torchvision" not in sys.modules:
        # only FrozenBatchNorm2d is referenced (ResNet path, unused here)
        import importlib.machinery

        import torch.nn

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv_ops = types.ModuleType("torchvision.ops")
        tv_misc = types.ModuleType("torchvision.ops.misc")
        tv_misc.FrozenBatchNorm2d = torch.nn.BatchNorm2d
        tv_ops.misc = tv_misc
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.misc"] = tv_misc
    pkg = types.ModuleType("refclip")
    pkg.__path__ = [f"{REF}/utils/reward/open_clip"]
    sys.modules.setdefault("refclip", pkg)
    base = f"{REF}/utils/reward/open_clip"
    # hf_model drags in transformers (slow, needs net probes) — the HF
    # text-encoder path is unused by the CLIP class under test
    hf_stub = types.ModuleType("refclip.hf_model")
    hf_stub.HFTextEncoder = type("HFTextEncoder", (), {})
    sys.modules["refclip.hf_model"] = hf_stub
    for sub in ("utils", "transformer", "modified_resnet", "hf_configs",
                "timm_model"):
        _load(f"refclip.{sub}", f"{base}/{sub}.py", package="refclip")
    return _load("refclip.model", f"{base}/model.py", package="refclip")
