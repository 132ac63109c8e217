"""Gradio web UI (reference ``detikzify/webui/webui.py:26-341``).

Sketchpad/figure input -> streaming TikZ code pane -> score-sorted MCTS
gallery. Requires the optional ``gradio`` dependency; everything else in
the framework works without it.
"""
from __future__ import annotations

import functools
import threading
import time
from typing import Optional

from ..infer import DetikzifyPipeline
from ..utils.generation import ExplicitAbort, TextIteratorStreamer
from .helpers import GeneratorLock, MctsOutputs, to_svg
from .strings import ALGORITHMS, BANNER, CSS, MODELS


def _require_gradio():
    try:
        import gradio as gr

        return gr
    except ImportError as e:
        raise ImportError(
            "the web UI requires the optional `gradio` dependency "
            "(pip install gradio); all other detikzify_tpu functionality "
            "works without it") from e


@functools.lru_cache(maxsize=1)
def cached_load(model_name: str):
    """LRU(1) model load (reference webui.py:63-125)."""
    from ..models.load import load

    params, cfg, processor = load(model_name)
    return DetikzifyPipeline(params, cfg, processor)


def inference(pipeline: DetikzifyPipeline, image, *, algorithm: str = "mcts",
              timeout: Optional[float] = None, expansions=None,
              control: Optional[ExplicitAbort] = None):
    """Generator yielding (partial_code, outputs) for UI streaming."""
    outputs = MctsOutputs()
    streamer = TextIteratorStreamer(pipeline.processor)
    text_parts = []

    if algorithm == "sampling":
        doc = pipeline.sample(image=image, on_token=streamer.put,
                              control=control)
        outputs.add(0.0, doc)
        yield doc.code, outputs
        return

    done = threading.Event()
    results = []

    def work():
        try:
            for score, doc in pipeline.simulate(
                    image=image, timeout=timeout, expansions=expansions,
                    control=control, on_token=streamer.put):
                results.append((score, doc))
        finally:
            streamer.end()
            done.set()

    thread = threading.Thread(target=work, daemon=True)
    thread.start()
    consumed = 0
    for delta in streamer:
        text_parts.append(delta)
        while consumed < len(results):
            outputs.add(*results[consumed])
            consumed += 1
        yield "".join(text_parts), outputs
    thread.join()
    while consumed < len(results):
        outputs.add(*results[consumed])
        consumed += 1
    yield "".join(text_parts), outputs


def build_ui(model: str = "detikzify-v2.5-8b", *, lock: bool = False,
             light: bool = False, timeout: Optional[int] = 600):
    """Assemble the gradio Blocks app (reference webui.py:131-341)."""
    gr = _require_gradio()
    control = ExplicitAbort()
    run_lock = GeneratorLock(control) if lock else None

    with gr.Blocks(css=CSS, theme="default" if light else None,
                   title="DeTikZify-TPU") as demo:
        gr.Markdown(BANNER)
        with gr.Row():
            with gr.Column():
                sketchpad = gr.ImageEditor(label="Sketchpad", type="pil")
                caption = gr.Textbox(
                    label="Caption (TikZero adapters only)", value="")
                model_dd = gr.Dropdown(
                    choices=list(MODELS), value=model, label="Model")
                algorithm = gr.Radio(
                    choices=list(ALGORITHMS), value="mcts",
                    label="Algorithm", info="; ".join(
                        f"{k}: {v}" for k, v in ALGORITHMS.items()))
                with gr.Row():
                    run_btn = gr.Button("Generate", variant="primary")
                    stop_btn = gr.Button("Stop")
            with gr.Column():
                code_pane = gr.Code(label="TikZ program", language=None)
                gallery = gr.Gallery(label="MCTS outputs (best first)",
                                     columns=3)

        state_outputs = gr.State(None)

        def run(image_editor, model_name, algo):
            image = (image_editor or {}).get("composite") \
                if isinstance(image_editor, dict) else image_editor
            pipe = cached_load(MODELS.get(model_name, model_name))
            gen = inference(pipe, image, algorithm=algo, timeout=timeout,
                            control=control.reset())
            if run_lock is not None:
                gen = run_lock.wrap(lambda: gen)()
            for code, outputs in gen:
                yield code, outputs.images, outputs

        def stop():
            control.abort()

        run_event = run_btn.click(
            run, inputs=[sketchpad, model_dd, algorithm],
            outputs=[code_pane, gallery, state_outputs])
        stop_btn.click(stop, cancels=[run_event])

        def select_program(outputs, evt: "gr.SelectData"):
            if outputs is None:
                return gr.update()
            return outputs.programs[evt.index]

        gallery.select(select_program, inputs=[state_outputs],
                       outputs=[code_pane])

    return demo


def launch(model: str = "detikzify-v2.5-8b", share: bool = False, **kw):
    demo = build_ui(model, **kw)
    return demo.queue().launch(share=share)
