"""Tests: Q-Former caption generate, streaming chunks, model summary."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.decode.engine import DecodeParams
from radialog_tpu.decode.session import InteractiveSession
from radialog_tpu.models.blip2 import (Blip2Config, blip2_generate_caption,
                                       blip2_init)
from radialog_tpu.models.llama import TINY_LLAMA, llama_init
from radialog_tpu.models.qformer import TINY_QFORMER
from radialog_tpu.utils.streaming import Iteratorize, stream_chunks
from radialog_tpu.utils.summary import param_count, summarize


def test_blip2_caption_generate():
    cfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=16)
    params, _ = blip2_init(jax.random.PRNGKey(0), cfg, with_vision=False)
    embs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, cfg.qformer.encoder_width)), jnp.float32)
    ids = blip2_generate_caption(params, cfg, embs, max_length=8, min_length=3)
    assert ids.shape == (2, 8)
    assert (np.asarray(ids)[:, 0] == cfg.qformer.bos_token_id).all()
    # min_length: no SEP before position 3
    sep = cfg.qformer.sep_token_id
    assert not (np.asarray(ids)[:, 1:3] == sep).any()


@pytest.mark.slow
def test_stream_chunks_matches_single_shot():
    cfg = TINY_LLAMA
    params = llama_init(jax.random.PRNGKey(0), cfg)
    prompt = [int(x) for x in np.random.default_rng(0).integers(3, 200, 6)]
    dp = DecodeParams(max_new_tokens=12, eos_token_id=1)

    sess = InteractiveSession(params, cfg, cache_len=64)
    sess.append_tokens(prompt)
    single = sess.generate(dp)

    sess2 = InteractiveSession(params, cfg, cache_len=64)
    sess2.append_tokens(prompt)
    streamed = []
    for chunk in stream_chunks(sess2, dp, chunk_size=5, max_new_tokens=12):
        streamed.extend(chunk)
    assert streamed == single


def test_iteratorize():
    def producer(callback):
        for i in range(4):
            callback(i * i)
    assert list(Iteratorize(producer, timeout=5)) == [0, 1, 4, 9]


def test_summary():
    params = llama_init(jax.random.PRNGKey(0), TINY_LLAMA)
    n = param_count(params)
    assert n > 0
    text = summarize(params, depth=1)
    assert "embed" in text and "layers" in text


class TestFetchUtility:
    """utils/fetch.py: md5 verification + cache-hit logic (network-free)."""

    def test_md5_and_verify(self, tmp_path):
        from radialog_tpu.utils.fetch import file_md5, verify_md5
        f = tmp_path / "w.bin"
        f.write_bytes(b"hello weights")
        import hashlib
        expect = hashlib.md5(b"hello weights").hexdigest()
        assert file_md5(f) == expect
        assert verify_md5(f, expect)
        assert not verify_md5(f, "0" * 32)
        assert verify_md5(f, None)  # no pin -> accept

    def test_cache_hit_skips_download(self, tmp_path):
        from radialog_tpu.utils.fetch import download_url, file_md5
        f = tmp_path / "w.bin"
        f.write_bytes(b"cached")
        # url is bogus: must not be touched because the verified file exists
        out = download_url("http://invalid.invalid/w.bin", tmp_path, "w.bin",
                           md5=file_md5(f))
        assert out == f

    def test_reference_pins_present(self):
        from radialog_tpu.utils import fetch
        assert fetch.BIOVIL_T_IMAGE_WEIGHTS_MD5 == "a83080e2f23aa584a4f2b24c39b1bb64"
        assert fetch.BIOVIL_IMAGE_WEIGHTS_MD5 == "02ce6ee460f72efd599295f440dbb453"
        assert "BiomedVLP-BioViL-T" in fetch.BIOVIL_T_IMAGE_WEIGHTS_URL
        assert fetch.BIOVIL_T_IMAGE_WEIGHTS_URL.endswith(
            "v1.0/biovil_t_image_model_proj_size_128.pt")
