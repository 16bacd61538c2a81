"""Training-subsystem unit tests: schedules, steps, class weights, kappa."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.models.bert import BertConfig
from radialog_tpu.models.blip2 import Blip2Config
from radialog_tpu.models.chexbert import chexbert_init
from radialog_tpu.models.llama import TINY_LLAMA, llama_init, lora_init
from radialog_tpu.models.qformer import TINY_QFORMER, qformer_init
from radialog_tpu.train.chexbert_train import (cohens_kappa,
                                               make_chexbert_train_step,
                                               mean_kappa)
from radialog_tpu.train.classifier import class_weights, multilabel_f1
from radialog_tpu.train.optim import (linear_warmup_cosine, linear_warmup_step,
                                      make_adamw)
from radialog_tpu.train.steps import (IGNORE_INDEX, TrainState, masked_ce,
                                      make_lora_train_step)


class TestSchedules:
    def test_warmup_cosine(self):
        s = linear_warmup_cosine(1e-3, 1e-5, warmup_steps=10, total_steps=100,
                                 warmup_start_lr=1e-6)
        assert float(s(0)) == pytest.approx(1e-6)
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)
        assert float(s(100)) == pytest.approx(1e-5, rel=1e-3)
        assert float(s(55)) < float(s(20))

    def test_warmup_step(self):
        s = linear_warmup_step(1e-3, 1e-5, warmup_steps=5, decay_rate=0.1,
                               steps_per_epoch=10)
        assert float(s(20)) == pytest.approx(1e-5, rel=1e-3)  # floored at min


class TestMaskedCE:
    def test_ignores_masked(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.asarray([[IGNORE_INDEX, IGNORE_INDEX, 3, 5]])
        # uniform logits: loss = log(8) over the 2 valid (shifted) targets
        assert float(masked_ce(logits, labels)) == pytest.approx(np.log(8), rel=1e-5)

    def test_all_masked_is_finite(self):
        logits = jnp.zeros((1, 3, 8))
        labels = jnp.full((1, 3), IGNORE_INDEX)
        assert np.isfinite(float(masked_ce(logits, labels)))


class TestLoraStep:
    def test_loss_decreases_and_base_frozen(self):
        cfg = TINY_LLAMA
        base = llama_init(jax.random.PRNGKey(0), cfg)
        lora = lora_init(jax.random.PRNGKey(1), cfg)
        tx = make_adamw(1e-2, weight_decay=0.0)
        state = TrainState.create(lora, tx)
        step = jax.jit(make_lora_train_step(tx, cfg, remat=False))
        rng = np.random.default_rng(0)
        toks = rng.integers(3, 200, (2, 16)).astype(np.int32)
        batch = {"tokens": jnp.asarray(toks), "labels": jnp.asarray(toks),
                 "lengths": jnp.full((2,), 16, jnp.int32)}
        base_before = jax.tree_util.tree_map(np.asarray, base)
        losses = []
        for _ in range(8):
            state, m = step(state, base, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        # base params untouched
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            base, base_before)


class TestChexbertStep:
    @pytest.mark.slow
    def test_loss_decreases(self):
        cfg = BertConfig(vocab_size=64, hidden_size=16, num_layers=1,
                         num_heads=2, intermediate_size=32, max_position=16)
        params = chexbert_init(jax.random.PRNGKey(0), cfg)
        tx = make_adamw(5e-3, weight_decay=0.0)
        state = TrainState.create(params, tx)
        step = jax.jit(make_chexbert_train_step(tx, cfg))
        rng = np.random.default_rng(0)
        batch = {"input_ids": jnp.asarray(rng.integers(3, 60, (4, 8)), jnp.int32),
                 "attention_mask": jnp.ones((4, 8), jnp.int32),
                 "labels": jnp.asarray(np.concatenate(
                     [rng.integers(0, 4, (4, 13)), rng.integers(0, 2, (4, 1))],
                     axis=1), jnp.int32)}
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(6):
            key, sk = jax.random.split(key)
            state, m = step(state, batch, sk)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]


class TestClassifierUtils:
    def test_class_weights(self):
        labels = np.zeros((100, 14))
        labels[:50, 0] = 1   # common class
        labels[:2, 1] = 1    # rare class
        w = class_weights(labels, "log")
        assert w[1] > w[0] > 0
        assert np.allclose(class_weights(labels, "none"), 1.0)
        lin = class_weights(labels, "lin")
        assert lin[0] == pytest.approx(2.0)

    def test_multilabel_f1_perfect(self):
        y = np.asarray([[1, 0], [0, 1]], float)
        m = multilabel_f1(y, y.astype(float))
        assert m["val_f1"] == 1.0 and m["val_acc"] == 1.0


class TestKappa:
    def test_perfect_agreement(self):
        assert cohens_kappa([0, 1, 2, 3], [0, 1, 2, 3]) == pytest.approx(1.0)

    def test_chance_agreement_near_zero(self):
        rng = np.random.default_rng(0)
        a, b = rng.integers(0, 4, 2000), rng.integers(0, 4, 2000)
        assert abs(cohens_kappa(a, b)) < 0.06

    def test_mean_kappa_shape(self):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 4, (50, 14))
        k, ks = mean_kappa(labels, labels)
        assert k == pytest.approx(1.0) and len(ks) == 14


class TestStage1Step:
    @pytest.mark.slow
    def test_losses_finite_and_decrease(self):
        from radialog_tpu.train.steps import make_stage1_train_step
        bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=12)
        params, _ = __import__("radialog_tpu.models.blip2", fromlist=["blip2_init"]).blip2_init(
            jax.random.PRNGKey(0), bcfg, with_vision=False)
        tx = make_adamw(1e-3, weight_decay=0.0)
        state = TrainState.create(params, tx)
        step = jax.jit(make_stage1_train_step(tx, bcfg))
        rng = np.random.default_rng(0)
        batch = {"image_embeds": jnp.asarray(rng.normal(size=(4, 16, bcfg.qformer.encoder_width)), jnp.float32),
                 "text_ids": jnp.asarray(rng.integers(4, 120, (4, 10)), jnp.int32),
                 "text_mask": jnp.ones((4, 10), jnp.int32)}
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(5):
            key, sk = jax.random.split(key)
            state, m = step(state, batch, sk)
            for v in m.values():
                assert np.isfinite(float(v))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    @pytest.mark.slow  # two full stage-1 grad compiles, ~90s on one core
    def test_itm_chunks_is_math_identical(self):
        # the batch-64 compile-wall lever (blip2_stage1_losses itm_chunks):
        # the Q-Former has no cross-batch ops, so mapping the 3B-wide ITM
        # forward in chunks must leave losses AND grads unchanged up to
        # matmul tiling noise
        from radialog_tpu.models.blip2 import blip2_init, blip2_stage1_losses
        bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=12)
        params, _ = blip2_init(jax.random.PRNGKey(0), bcfg, with_vision=False)
        rng = np.random.default_rng(1)
        embs = jnp.asarray(rng.normal(size=(4, 16, bcfg.qformer.encoder_width)),
                           jnp.float32)
        ids = jnp.asarray(rng.integers(4, 120, (4, 10)), jnp.int32)
        mask = jnp.ones((4, 10), jnp.int32)
        key = jax.random.PRNGKey(3)

        def loss(p, chunks):
            return blip2_stage1_losses(p, bcfg, embs, ids, mask, key,
                                       itm_chunks=chunks).loss

        (l1, g1), (l3, g3) = (jax.value_and_grad(loss)(params, c)
                              for c in (1, 3))
        np.testing.assert_allclose(float(l1), float(l3), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)
