"""Replicate Cog predictor shim (reference: predict.py:24-80).

One-time setup builds the I2VGen-XL pipeline; predict(image, text)
returns the generated mp4 path. ``cog`` is optional — the class also
works as a plain Python object:

    p = Predictor(); p.setup(); path = p.predict("img.png", "a caption")
"""

from __future__ import annotations

import os
import tempfile

try:  # cog is not installed in most environments; shim its interface
    from cog import BasePredictor, Input, Path  # type: ignore
except Exception:  # pragma: no cover
    class BasePredictor:  # minimal stand-in
        pass

    def Input(default=None, description=None):  # noqa: N802
        return default

    Path = str


class Predictor(BasePredictor):
    def setup(self, cfg_path: str = "configs/i2vgen_xl_infer.yaml"):
        from vgen_tpu.core import Config
        import vgen_tpu.engines  # noqa: F401

        self.cfg_path = cfg_path
        # engines are built lazily per predict() call so setup stays cheap
        self._workdir = tempfile.mkdtemp(prefix="vgen_tpu_cog_")

    def predict(self,
                image: Path = Input(description="Input image"),
                text: str = Input(description="Prompt")) -> Path:
        from vgen_tpu.core import INFER_ENGINE, Config

        list_path = os.path.join(self._workdir, "input.txt")
        with open(list_path, "w") as f:
            f.write(f"{image}|||{text}\n")
        cfg = Config(load=True, args=["--cfg", self.cfg_path]).cfg_dict
        cfg["test_list_path"] = list_path
        cfg["log_dir"] = self._workdir
        cfg["round"] = 1
        outputs = INFER_ENGINE.build(dict(type=cfg["TASK_TYPE"]),
                                     cfg_update=cfg)
        assert outputs, "generation produced no output"
        return outputs[0]
