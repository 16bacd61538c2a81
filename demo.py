#!/usr/bin/env python
"""Interactive RaDialog demo — reference demo.py CLI (--cfg-path/--options,
demo.py:46-60) plus a terminal chat mode that works without gradio.

  python demo.py --cli --mock              # terminal chat, tiny models
  python demo.py --cfg-path cfg.yaml       # gradio UI when installed
"""
from __future__ import annotations

import argparse
import random
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="RaDialog-TPU demo")
    p.add_argument("--cfg-path", default=None, help="path to configuration file")
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--options", nargs="+", default=None,
                   help="key=value config overrides")
    p.add_argument("--cli", action="store_true", default=False,
                   help="terminal chat loop instead of gradio")
    p.add_argument("--mock", action="store_true", default=False)
    p.add_argument("--no-report", action="store_true", default=False,
                   help="don't auto-generate a report on image upload")
    p.add_argument("--spec", action="store_true", default=False,
                   help="prompt-lookup speculative decoding for replies "
                        "(token-identical, faster on correction/QA turns — "
                        "decode/speculative.py)")
    p.add_argument("--warmup", action="store_true", default=False,
                   help="precompile the chat decode path at boot so the "
                        "first user turn pays no compile wall (seconds with "
                        ".jax_cache/ populated; docs/PERF.md 'Cold start')")
    return p.parse_args()


def build_session(args):
    from radialog_tpu.apps.chat import ChatSession
    from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline
    from radialog_tpu.core.config import Config

    cfg = Config()
    if args.cfg_path:
        cfg = Config.from_yaml(args.cfg_path)
    if args.options:
        cfg = cfg.apply_overrides(args.options)
    m = cfg.get("model", Config())
    pipe = RaDialogPipeline(PipelineConfig(
        vicuna_path=m.get("vicuna_path"), lora_path=m.get("lora_path"),
        blip2_checkpoint=m.get("blip2_checkpoint"),
        classifier_checkpoint=m.get("classifier_checkpoint"),
        chexbert_checkpoint=m.get("chexbert_checkpoint"),
        emb_cache=m.get("emb_cache"),
        mock=args.mock or bool(m.get("mock", False)),
        quantize=bool(m.get("quantize", False)) or m.get("weight_bits", 8) != 8,
        kv_int8=m.get("kv_int8"),
        weight_bits=int(m.get("weight_bits", 8))))
    return ChatSession(pipe, gen_report=not args.no_report,
                       speculative=args.spec)


def cli_loop(session):
    print("RaDialog chat — type an image path (.jpg/.png) to upload a scan,\n"
          "'reset' to clear the conversation, 'quit' to exit.")
    while True:
        try:
            text = input("USER: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return
        if not text:
            continue
        if text in ("quit", "exit"):
            return
        if text == "reset":
            session.reset()
            print("(conversation cleared)")
            continue
        if text.endswith((".png", ".jpg")):
            reply, findings = session.load_image(text)
            print(f"(predicted findings: {findings})")
            if reply:
                print(f"ASSISTANT: {reply}")
            continue
        print(f"ASSISTANT: {session.ask(text)}")


def make_bot(session):
    """The gradio `bot` handler (reference demo.py:349-366), factored out so
    the flows are testable without gradio installed. Takes the chat history
    (last entry = pending user message, image uploads as 1-tuples per
    gradio's add_file convention), yields successive history states with the
    assistant reply streaming in. On the first image upload it also appends
    the report-generation prompt as a visible history row with the <IMG> run
    shown as "(img_tokens)" — exactly the reference's display behavior
    (demo.py:355-359)."""
    from radialog_tpu.apps.chat import RG_PROMPT
    from radialog_tpu.data.prompts import IMG_RUN

    def bot(history):
        last = history[-1][0]
        if isinstance(last, tuple):  # image upload (add_file)
            reply, findings = session.load_image(last[0])
            if len(history) == 1 and session.gen_report:
                shown = RG_PROMPT.replace(f"{IMG_RUN}.", "(img_tokens)")
                history.append([shown.format(findings=findings), None])
            history[-1][1] = ""
            for ch in reply or "":
                history[-1][1] += ch
                yield history
            if not reply:
                history[-1][1] = f"(predicted findings: {findings})"
                yield history
            return
        history[-1][1] = ""
        for partial in session.ask_stream(last):
            history[-1][1] = partial
            yield history

    return bot


def gradio_ui(session):
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed — falling back to --cli mode",
              file=sys.stderr)
        return cli_loop(session)

    bot = make_bot(session)

    def add_text(history, text):
        history = history + [(text, None)]
        return history, gr.update(value="", interactive=False)

    def add_file(history, file):
        history = history + [((file.name,), None)]
        return history

    def clear_history(_history):
        session.reset()
        return []

    with gr.Blocks() as ui:  # chat UI mirroring reference demo.py:369-400
        chatbot = gr.Chatbot([], elem_id="chatbot")
        with gr.Row():
            txt = gr.Textbox(show_label=False,
                             placeholder="Enter text and press enter, or "
                                         "upload an image",
                             container=False)
        with gr.Row():
            btn = gr.UploadButton("📁 Upload image", file_types=["image"],
                                  scale=1)
            clear_btn = gr.Button("Clear History", scale=1)

        clear_btn.click(clear_history, [chatbot], [chatbot])
        txt_msg = txt.submit(add_text, [chatbot, txt], [chatbot, txt],
                             queue=False).then(bot, chatbot, chatbot)
        txt_msg.then(lambda: gr.update(interactive=True), None, [txt],
                     queue=False)
        btn.upload(add_file, [chatbot, btn], [chatbot],
                   queue=False).then(bot, chatbot, chatbot)

    ui.queue()
    ui.launch()


def main():
    random.seed(16)
    np.random.seed(16)
    args = parse_args()
    session = build_session(args)
    if args.warmup:
        spent = session.warmup()
        print(f"(warmup: decode path precompiled in {spent:.1f}s)",
              file=sys.stderr)
    if args.cli:
        cli_loop(session)
    else:
        gradio_ui(session)


if __name__ == "__main__":
    main()
