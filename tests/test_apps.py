"""Apps-layer tests: mock pipeline + eval harness + chat session in pytest
(the CLIs drive these same functions; this keeps them guarded in CI)."""
import numpy as np
import pytest

from radialog_tpu.apps.chat import ChatSession
from radialog_tpu.apps.evaluate import EvalOptions, run_eval
from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline
from radialog_tpu.data.datasets import MimicPaths, ReportGenData

FIXTURES = "tests/fixtures"


@pytest.fixture(scope="module")
def pipe():
    return RaDialogPipeline(PipelineConfig(mock=True, max_new_tokens=8))


@pytest.fixture(scope="module")
def records():
    paths = MimicPaths(split_csv=f"{FIXTURES}/split.csv",
                       sectioned_csv=f"{FIXTURES}/sectioned.csv",
                       chexpert_csv=f"{FIXTURES}/chexpert.csv",
                       predicted_findings_json=f"{FIXTURES}/preds.json")
    return ReportGenData(paths, split="test", truncate=3).records()


@pytest.mark.slow
def test_run_eval_end_to_end(pipe, records, tmp_path):
    opts = EvalOptions(batch_size=3, max_new_tokens=6, exp_name="t",
                       output_dir=str(tmp_path))
    results = run_eval(pipe, records, opts)
    for key in ("Bleu_4", "ROUGE_L", "chexbert_macro_f1",
                "chexbert_sample_f1", "chexbert_mean_accuracy"):
        assert key in results and np.isfinite(results[key])
    assert (tmp_path / "predictions_t.csv").exists()
    assert (tmp_path / "labels_t.csv").exists()
    assert (tmp_path / "results_t.txt").read_text().startswith("Prompt:")
    # predictions CSV byte format: quoted single-column lines
    first = (tmp_path / "predictions_t.csv").read_text().splitlines()[0]
    assert first.startswith('"') and first.endswith('"')


@pytest.mark.slow
def test_generate_texts_beams_and_sampling(pipe):
    prompts = ["USER: a ASSISTANT:", "USER: b longer prompt ASSISTANT:"]
    greedy = pipe.generate_texts(prompts, max_new_tokens=5)
    assert len(greedy) == 2 and all(g.startswith(p) for g, p in zip(greedy, prompts))
    beam = pipe.generate_texts(prompts, max_new_tokens=5, num_beams=2)
    assert len(beam) == 2
    sampled = pipe.generate_texts(prompts, max_new_tokens=5, do_sample=True,
                                  temperature=0.8)
    assert len(sampled) == 2


def test_label_reports_shape(pipe):
    labels = pipe.label_reports(["lungs clear", "cardiomegaly present", "x"])
    assert labels.shape == (3, 14)
    vals = labels[~np.isnan(labels)]
    assert set(np.unique(vals)).issubset({-1.0, 0.0, 1.0})


def test_chat_session_multi_turn(pipe):
    session = ChatSession(pipe, gen_report=True, cache_len=512)
    # no image: free-chat turns exercise the prefix cache
    r1 = session.ask("Hello, what can you do?")
    assert isinstance(r1, str)
    r2 = session.ask("Is there any pneumonia?")
    assert isinstance(r2, str)
    assert len(session.conv.messages) == 4
    session.reset()
    assert len(session.conv.messages) == 0


def test_chat_session_stream_matches_ask(pipe):
    """ask_stream must yield progressive prefixes and land token-identical
    to the plain ask() reply (greedy chunked decode == single decode)."""
    plain = ChatSession(pipe, gen_report=True, cache_len=512)
    stream = ChatSession(pipe, gen_report=True, cache_len=512)
    q = "Hello, what can you do?"
    want = plain.ask(q)
    partials = list(stream.ask_stream(q, chunk_size=2))
    assert partials, "stream yielded nothing"
    assert partials[-1] == want
    assert len(partials) > 1  # actually chunked (max_new_tokens=8, chunk 2)
    # conversation state identical after the turn
    assert stream.conv.messages == plain.conv.messages
    # second streamed turn keeps working off the same prefix cache
    # (same chunk_size — a different one would just compile another decode
    # graph for no extra coverage)
    q2 = "Is there any pneumonia?"
    want2 = plain.ask(q2)
    assert list(stream.ask_stream(q2, chunk_size=2))[-1] == want2


@pytest.mark.slow  # ~20s (vision+classifier compiles); the session-level
# streaming contract is pinned fast by test_chat_session_stream_matches_ask
def test_gradio_bot_flows(pipe, tmp_path):
    """The gradio handlers (demo.py make_bot) without gradio installed:
    image upload appends the visible RG prompt row with (img_tokens) and
    streams the report; a follow-up text message streams into history."""
    import sys
    sys.path.insert(0, ".")
    try:
        from demo import make_bot
    finally:
        sys.path.pop(0)
    from PIL import Image

    img = (np.random.default_rng(0).integers(0, 255, (64, 64))
           .astype(np.uint8))
    p = tmp_path / "dcm000.jpg"
    Image.fromarray(img).save(p, quality=95)

    session = ChatSession(pipe, gen_report=True, cache_len=512)
    bot = make_bot(session)

    import copy

    history = [[(str(p),), None]]  # add_file convention: 1-tuple
    # bot mutates history in place and yields it (gradio renders each yield
    # immediately; the reference does the same, demo.py:360-366) — snapshot
    # every yield to observe the streaming
    states = [copy.deepcopy(s) for s in bot(history)]
    assert states, "image turn yielded nothing"
    final = states[-1]
    assert len(final) == 2  # upload row + visible RG prompt row
    assert "(img_tokens)" in final[1][0]
    assert "Predicted Findings:" in final[1][0]
    assert isinstance(final[1][1], str) and final[1][1]  # streamed report
    # streaming: earlier states carry strict prefixes of the final reply
    assert states[0][-1][1] != final[-1][1]
    assert final[-1][1].startswith(states[0][-1][1])

    history = final + [["Is there any pneumonia?", None]]
    states = [copy.deepcopy(s) for s in bot(history)]
    assert states and states[-1][-1][1]


def test_chat_session_speculative_matches_plain(pipe):
    """--spec chat replies must be token-identical to the plain session
    (speculation only changes forward-pass count, decode/speculative.py)."""
    plain = ChatSession(pipe, gen_report=True, cache_len=512)
    spec = ChatSession(pipe, gen_report=True, cache_len=512,
                       speculative=True, spec_k=4)
    q1, q2 = "Hello, what can you do?", "Is there any pneumonia?"
    assert spec.ask(q1) == plain.ask(q1)
    assert spec.ask(q2) == plain.ask(q2)


def test_pipeline_kv_int8_serving():
    """quantize + explicit kv_int8 drives the token-flat int8 cache path
    end to end through the apps layer (XLA fallback on CPU)."""
    pipe = RaDialogPipeline(PipelineConfig(mock=True, max_new_tokens=4,
                                           quantize=True, kv_int8=True))
    assert pipe.cfg.use_kv_int8()
    out = pipe.generate_texts(["USER: hi ASSISTANT:"])
    assert len(out) == 1 and out[0].startswith("USER: hi")
    # default: int8 KV ON for quantized serving (measured teacher-forced
    # logit err 0.048 sigma = the W8A8 weight default's own 0.049,
    # tools/measure_kv_logit_err.py); explicit False keeps the bf16 cache
    assert PipelineConfig(mock=True, quantize=True).use_kv_int8()
    assert not PipelineConfig(mock=True, quantize=True,
                              kv_int8=False).use_kv_int8()
    assert not PipelineConfig(mock=True).use_kv_int8()  # stacked bf16 path
    # explicit kv_int8 without quantize is a config error, not a silent
    # downgrade (int8 KV needs the unrolled quantize_llama_host params)
    import pytest
    with pytest.raises(ValueError, match="kv_int8"):
        PipelineConfig(mock=True, kv_int8=True).use_kv_int8()


def test_generate_texts_ring_matches_batch(pipe):
    """The ring-served teacher path (create_data.py --teacher ring) produces
    the same greedy continuations as the fixed-batch generate path —
    continuous batching only reorganizes WHEN lanes decode, not what."""
    prompts = ["USER: first report please ASSISTANT:",
               "USER: b ASSISTANT:",
               "USER: a much longer third prompt with more tokens ASSISTANT:"]
    batch = pipe.generate_texts(prompts, max_new_tokens=6)
    ring = pipe.generate_texts_ring(prompts, max_new_tokens=6, lanes=2,
                                    steps_per_call=2)
    assert len(ring) == 3 and all(r.startswith(p)
                                  for r, p in zip(ring, prompts))
    # bf16-exactness caveat does not apply: the mock pipeline runs fp32
    # stacked weights, where ring and batch decode are token-identical
    assert ring == batch


def test_chat_session_warmup_then_first_turn(pipe):
    """demo.py --warmup: boot precompile leaves the session pristine and the
    first real turn matches an un-warmed session's (greedy determinism)."""
    cold = ChatSession(pipe, gen_report=True, cache_len=512)
    warm = ChatSession(pipe, gen_report=True, cache_len=512)
    spent = warm.warmup(turn_lengths=(16,))
    assert spent > 0
    assert warm.session.cur_len == 0 and warm.conv.messages == []
    q = "Hello, what can you do?"
    assert warm.ask(q) == cold.ask(q)
    # no prefix-cache session: warmup is a documented no-op
    assert ChatSession(pipe, prefix_cache=False).warmup() == 0.0
