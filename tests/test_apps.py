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
