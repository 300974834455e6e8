"""Gradio demo UI (reference: gradio_app.py:9-52).

The reference delegates to the modelscope pipeline; this app drives OUR
i2vgen engine directly. gradio is optional (not installed in the build
image) — run ``python gradio_app.py`` where gradio is available.
"""

from __future__ import annotations

import os
import tempfile


def generate(image_path: str, text: str,
             cfg_path: str = "configs/i2vgen_xl_infer.yaml") -> str:
    from vgen_tpu.core import INFER_ENGINE, Config
    import vgen_tpu.engines  # noqa: F401

    workdir = tempfile.mkdtemp(prefix="vgen_tpu_gradio_")
    list_path = os.path.join(workdir, "input.txt")
    with open(list_path, "w") as f:
        f.write(f"{image_path}|||{text}\n")
    cfg = Config(load=True, args=["--cfg", cfg_path]).cfg_dict
    cfg.update(test_list_path=list_path, log_dir=workdir, round=1)
    outputs = INFER_ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)
    return outputs[0] if outputs else ""


def main():
    import gradio as gr  # optional dependency

    with gr.Blocks(title="vgen-tpu I2VGen-XL") as demo:
        gr.Markdown("# I2VGen-XL (TPU) — image + text to HD video")
        with gr.Row():
            image = gr.Image(type="filepath", label="Input image")
            text = gr.Textbox(label="Prompt")
        video = gr.Video(label="Generated video")
        gr.Button("Generate").click(generate, [image, text], video)
    demo.launch()


if __name__ == "__main__":
    main()
